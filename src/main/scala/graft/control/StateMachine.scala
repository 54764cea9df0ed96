package graft.control

import java.time.{Clock, Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Job state transitions U1–U4 (`/root/reference/flusher/manager.py:83-144`).
  * Column positions are the sheet's hard-coded 7..11 layout (acknowledged
  * at `manager.py:19`; FIXTURES.md A.1).
  */
object StateMachine {
  val ColRefreshNow = 7
  val ColInterval = 8
  val ColLastSuccess = 9
  val ColState = 10
  val ColLastResult = 11

  val Running = "Running"
  val Success = "Success"
  val Failure = "Failure"

  private val IsoFmt = DateTimeFormatter.ISO_OFFSET_DATE_TIME

  /** ISO-8601 UTC with offset — the shape arrow's isoformat writes
    * (`manager.py:94,104`). */
  def iso(i: Instant): String = IsoFmt.format(i.atOffset(ZoneOffset.UTC))

  // Each transition commits as ONE updateCells (single atomic swap in the
  // CSV table) — four sequential cell writes would open a crash window
  // where e.g. a fresh Last Success coexists with a stale Running state,
  // permanently de-scheduling a completed job.

  /** U1 (`manager.py:83-94`): clear Refresh Now, State := Running.
    * Returns the start timestamp for the log line. */
  def markRunning(ct: ControlTable, job: JobSpec, clock: Clock = Clock.systemUTC()): Instant = {
    val now = clock.instant()
    ct.updateCells(job.row, Map(ColRefreshNow -> "", ColState -> Running))
    now
  }

  /** U2 (`manager.py:97-112`): clear Refresh Now, Last Success := now,
    * State := Success, Last Result := result. */
  def markSuccess(ct: ControlTable, job: JobSpec, result: String,
      clock: Clock = Clock.systemUTC()): Instant = {
    val now = clock.instant()
    ct.updateCells(job.row, Map(
      ColRefreshNow -> "", ColLastSuccess -> iso(now),
      ColState -> Success, ColLastResult -> result))
    now
  }

  /** U3 (`manager.py:115-130`): clear Refresh Now AND Refresh Interval —
    * a failed job is DE-SCHEDULED until a human re-enters the interval
    * (deliberate: prevents hot-looping a broken job, `manager.py:121-122`)
    * — State := Failure, Last Result := error. */
  def markFailure(ct: ControlTable, job: JobSpec, error: String): Unit =
    ct.updateCells(job.row, Map(
      ColRefreshNow -> "", ColInterval -> "",
      ColState -> Failure, ColLastResult -> error))

  /** U4 (`manager.py:133-144`): clear Refresh Interval only — Refresh Now
    * is NOT cleared, so a manual trigger still works — State := Failure,
    * Last Result := parse error. */
  def markInvalidSchedule(ct: ControlTable, job: JobSpec, error: String): Unit =
    ct.updateCells(job.row, Map(
      ColInterval -> "", ColState -> Failure, ColLastResult -> error))
}
