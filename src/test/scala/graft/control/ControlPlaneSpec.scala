package graft.control

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.time.{Duration, Instant}

/** Unit coverage for P2/P3/P5, U1–U4, E1 and the CSV codec. */
class ControlPlaneSpec extends AnyFunSuite {

  private def job(row: Long = 2, state: String = "", refreshNow: String = "",
      interval: String = "", lastSuccess: String = ""): JobSpec =
    JobSpec("Doc", "Sheet1", "A1:B", "warehouse", "t", "", refreshNow,
      interval, lastSuccess, state, "", row)

  private val now = Instant.parse("2026-08-12T06:00:00Z")

  test("P3 overdue: strict >, 1900 epoch default, no-interval never overdue") {
    val iv = Some(Duration.ofMinutes(30))
    // missing Last Success anchors at 1900 ⇒ overdue (refresh_interval.py:32)
    assert(Scheduler.isOverdue(None, iv, now))
    // exactly at the boundary is NOT overdue (strict >)
    val anchor = now.minus(Duration.ofMinutes(30))
    assert(!Scheduler.isOverdue(Some(anchor), iv, now))
    assert(Scheduler.isOverdue(Some(anchor.minusSeconds(1)), iv, now))
    // no interval ⇒ never overdue regardless of anchor
    assert(!Scheduler.isOverdue(None, None, now))
  }

  test("P2 shouldRun: Running excludes; Refresh Now overrides schedule (manager.py:178-180)") {
    val due = job(lastSuccess = "1970-01-01T00:00:00+00:00")
    assert(Scheduler.shouldRun(due, Some(Duration.ofMinutes(1)), now))
    assert(!Scheduler.shouldRun(due.copy(state = "Running"), Some(Duration.ofMinutes(1)), now))
    // refresh-now with no interval at all
    assert(Scheduler.shouldRun(job(refreshNow = "yes"), None, now))
    // Running beats refresh-now
    assert(!Scheduler.shouldRun(job(refreshNow = "yes", state = "Running"), None, now))
    // nothing set ⇒ not run
    assert(!Scheduler.shouldRun(job(), None, now))
  }

  test("P5 partition: empty interval valid, parse errors drop with message") {
    val (valid, invalid) = Scheduler.partitionValid(Seq(
      job(row = 2, interval = "2 hours"),
      job(row = 3, interval = ""),
      job(row = 4, interval = "5 weeks")))
    assert(valid.map(_._1.row) == Seq(2L, 3L))
    assert(valid.map(_._2) == Seq(Some(Duration.ofHours(2)), None))
    assert(invalid.map(_._1.row) == Seq(4L))
    assert(invalid.head._2.contains("unsupported unit"))
  }

  test("U1-U4 against a CSV control table; U3 de-schedules, U4 keeps Refresh Now") {
    val path = Files.createTempFile("ctl", ".csv")
    val ct = CsvControlTable.init(path, Seq(
      Seq("Doc", "S", "A1:B", "warehouse", "t", "", "yes", "2 hours", "", "", "")))
    val j = ct.jobs().head
    assert(j.row == 2 && j.refreshNowSet)

    StateMachine.markRunning(ct, j)
    val running = ct.jobs().head
    assert(running.state == "Running" && running.refreshNow == ""
      && running.refreshInterval == "2 hours")

    val t = StateMachine.markSuccess(ct, running, "g_sheets.t")
    val ok = ct.jobs().head
    assert(ok.state == "Success" && ok.lastResult == "g_sheets.t"
      && ok.lastSuccessInstant.contains(t))

    // U3: failure clears the INTERVAL too (de-scheduling, manager.py:121-122)
    StateMachine.markFailure(ct, ok, "boom")
    val failed = ct.jobs().head
    assert(failed.state == "Failure" && failed.refreshInterval == ""
      && failed.lastResult == "boom")

    // U4: invalid schedule clears interval but PRESERVES Refresh Now
    ct.updateCell(2, StateMachine.ColRefreshNow, "yes")
    ct.updateCell(2, StateMachine.ColInterval, "5 weeks")
    StateMachine.markInvalidSchedule(ct, ct.jobs().head, "bad interval")
    val repaired = ct.jobs().head
    assert(repaired.refreshInterval == "" && repaired.refreshNow == "yes"
      && repaired.state == "Failure" && repaired.lastResult == "bad interval")
  }

  test("E1 translation: document share-hint, worksheet candidates, passthrough") {
    val doc = Errors.translate(DocumentNotFound("Sales"), "svc@graft")
    assert(doc.contains("Sales") && doc.contains("svc@graft"))
    val wks = Errors.translate(WorksheetNotFound("Sales", "Nope", Seq("A", "B")), "svc@graft")
    assert(wks.contains("Available sheets: A, B"))
    assert(Errors.translate(new RuntimeException("plain"), "x") == "plain")
  }

  test("CSV codec round-trips quotes, commas and empties") {
    val cells = Seq("a,b", "he said \"hi\"", "", "plain")
    assert(CsvCodec.parseLine(CsvCodec.writeLine(cells)) == cells)
  }

  test("multi-line cell content cannot shear the line-oriented table") {
    // a multi-line Spark error written to Last Result must stay ONE row
    val written = CsvCodec.writeLine(Seq("doc", "error:\nline2\r\nline3"))
    assert(!written.contains("\n") && !written.contains("\r"))
    assert(CsvCodec.parseLine(written) == Seq("doc", "error: line2  line3"))
  }

  test("absurdly large interval is never due instead of crashing the poll loop") {
    val iv = HumanIntervalDays(999999999999L)
    assert(!Scheduler.isOverdue(None, Some(iv), now))
    assert(!Scheduler.shouldRun(job(interval = "999999999999 days"), Some(iv), now))
  }
  private def HumanIntervalDays(n: Long) = java.time.Duration.ofDays(n)

  test("cell truthiness hardening (documented divergence from Python truthiness)") {
    assert(JobSpec.truthy("yes") && JobSpec.truthy("TRUE") && JobSpec.truthy("1"))
    assert(!JobSpec.truthy("") && !JobSpec.truthy("0")
      && !JobSpec.truthy("FALSE") && !JobSpec.truthy("no"))
  }
}
