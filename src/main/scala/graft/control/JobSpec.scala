package graft.control

import java.time.{Instant, OffsetDateTime}
import scala.util.Try

/** One control-table row (FIXTURES.md A.1; header keys from
  * `/root/reference/flusher/manager.py:36` with the 1-based sheet row
  * carried alongside, `manager.py:37`). Every cell arrives as a string —
  * the sheet has no types (SURVEY §1.2).
  */
final case class JobSpec(
    document: String,
    sheet: String,
    range: String,
    targetSystem: String,
    destination: String,
    incremental: String,
    refreshNow: String,
    refreshInterval: String,
    lastSuccess: String,
    state: String,
    lastResult: String,
    row: Long) {

  def isIncremental: Boolean = JobSpec.truthy(incremental)
  def refreshNowSet: Boolean = JobSpec.truthy(refreshNow)
  def lastSuccessInstant: Option[Instant] = JobSpec.parseInstant(lastSuccess)
}

object JobSpec {
  /** Cell truthiness. The reference relies on Python truthiness after
    * gspread's numeric coercion (so "0" became int 0 = falsy, but the
    * STRING "FALSE" was truthy — a known footgun). Deliberate hardening:
    * "", "0", "false" and "no" are falsy here.
    */
  def truthy(cell: String): Boolean = {
    val v = cell.trim.toLowerCase
    v.nonEmpty && v != "0" && v != "false" && v != "no"
  }

  /** Parse the ISO-8601 UTC strings the engine writes back
    * (`manager.py:94,104` via arrow isoformat — offset suffix), plus bare
    * `Instant` forms. Empty/unparseable → None. */
  def parseInstant(cell: String): Option[Instant] = {
    val v = cell.trim
    if (v.isEmpty) None
    else Try(OffsetDateTime.parse(v).toInstant).orElse(Try(Instant.parse(v))).toOption
  }

  /** FIXTURES.md A.1 header, in sheet column order 1..11. */
  val Header: Seq[String] = Seq("Document", "Sheet", "Range", "Target System",
    "Destination", "Incremental", "Refresh Now", "Refresh Interval",
    "Last Success", "State", "Last Result")

  /** Build from an 11-cell sheet row (padded if short) + 1-based row no. */
  def fromCells(cells: Seq[String], row: Long): JobSpec = {
    val c = cells.padTo(11, "")
    JobSpec(c(0), c(1), c(2), c(3), c(4), c(5), c(6), c(7), c(8), c(9), c(10), row)
  }

  def toCells(j: JobSpec): Seq[String] = Seq(j.document, j.sheet, j.range,
    j.targetSystem, j.destination, j.incremental, j.refreshNow,
    j.refreshInterval, j.lastSuccess, j.state, j.lastResult)
}
