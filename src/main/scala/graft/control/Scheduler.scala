package graft.control

import graft.util.HumanInterval
import java.time.{Duration, Instant}

/** Scheduling predicates P2/P3/P5 (SURVEY §2.1). Pure functions of
  * (job, now) — the control table is tiny and driver-side, so these are
  * plain Scala, not Spark plans (same disposition as the reference's
  * single-threaded `should_run`, `manager.py:178-180`).
  */
object Scheduler {

  /** Missing Last Success anchors to 1900-01-01, making any scheduled job
    * immediately overdue (`refresh_interval.py:32`). */
  val Epoch1900: Instant = Instant.parse("1900-01-01T00:00:00Z")

  /** P3: `utcnow - last_success > interval` (STRICT >,
    * `refresh_interval.py:30-34`); no interval ⇒ never overdue. An
    * interval so large that `anchor + iv` overflows Instant.MAX means the
    * due point is unreachably far in the future ⇒ not overdue (the
    * DateTimeException would otherwise crash the poll loop on a row that
    * validate() accepted, unrecoverably). */
  def isOverdue(lastSuccess: Option[Instant], interval: Option[Duration], now: Instant): Boolean =
    interval.exists { iv =>
      try now.isAfter(lastSuccess.getOrElse(Epoch1900).plus(iv))
      catch { case _: java.time.DateTimeException | _: ArithmeticException => false }
    }

  /** P2: run iff not Running AND (Refresh Now OR overdue)
    * (`manager.py:178-180`). `interval` must come from a prior
    * [[validate]] pass — invalid intervals never reach here. */
  def shouldRun(job: JobSpec, interval: Option[Duration], now: Instant): Boolean =
    job.state != "Running" &&
      (job.refreshNowSet || isOverdue(job.lastSuccessInstant, interval, now))

  /** P5 verdict for one job: empty interval is fine (manual-only job),
    * parse failure carries the message for the U4 transition. */
  sealed trait Validation
  final case class Valid(interval: Option[Duration]) extends Validation
  final case class Invalid(error: String) extends Validation

  def validate(job: JobSpec): Validation =
    if (job.refreshInterval.trim.isEmpty) Valid(None)
    else HumanInterval.tryParse(job.refreshInterval) match {
      case Right(d)  => Valid(Some(d))
      case Left(msg) => Invalid(msg)
    }

  /** P5 over a job list: (runnable jobs with parsed intervals, broken jobs
    * with errors) — the generator split of
    * `filter_fixing_invalid_schedules` (`manager.py:167-175`), minus the
    * side effects (the caller applies U4 to the right-hand side).
    */
  def partitionValid(jobs: Seq[JobSpec]): (Seq[(JobSpec, Option[Duration])], Seq[(JobSpec, String)]) = {
    val results = jobs.map(j => j -> validate(j))
    val valid = results.collect { case (j, Valid(iv)) => (j, iv) }
    val invalid = results.collect { case (j, Invalid(msg)) => (j, msg) }
    (valid, invalid)
  }
}
