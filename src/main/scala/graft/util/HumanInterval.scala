package graft.util

import java.time.Duration
import scala.util.{Failure, Success, Try}

/** Human-readable refresh-interval parser.
  *
  * Re-expresses `/root/reference/flusher/refresh_interval.py:6-27` in pure
  * Scala: `"2 days 3 hours 4 minutes"` -> `Duration`. Preserved semantics:
  *   - plurals normalized (`days` -> `day`, etc.; `refresh_interval.py:8-10`)
  *   - non-alphanumeric tokens stripped (`refresh_interval.py:11`)
  *   - units other than day/hour/minute REJECTED (seconds, weeks, months;
  *     `refresh_interval.py:16-17`)
  *   - at least one of day/hour/minute required (`refresh_interval.py:18-19`)
  *   - the quantity of a unit is the token immediately before it
  *     (`refresh_interval.py:23-25`)
  *
  * DELIBERATE divergences from the reference's edge cases (hardenings,
  * documented like A1Notation's base-25 bug note):
  *   - a repeated unit ("1 day 2 days") SUMS here; the reference's
  *     `parts.index(unit)` finds only the first occurrence.
  *   - a leading unit ("days 2") is REJECTED here; the reference's
  *     `parts[index-1]` wraps to the LAST token on index 0 (so "days 2"
  *     silently parses as 2 days there).
  *   - banned units are matched as whole normalized tokens here; the
  *     reference raises on substring hits (e.g. rejects "weekly").
  *   - non-integer quantities are REJECTED here ("1.5 hours", "-2 days");
  *     the reference's alnum normalization silently turns "1.5" into 15.
  *   - common abbreviations resolve ("min"/"hr"/"h"/"d") or reject
  *     ("sec"/"wk"/"mo"); the reference silently drops them, shortening
  *     the interval.
  */
object HumanInterval {

  final case class InvalidInterval(message: String) extends IllegalArgumentException(message)

  /** canonical units plus common abbreviations (abbreviations are a
    * hardening: the reference silently IGNORES tokens like "min"/"sec",
    * shortening the interval — here they resolve or reject). */
  private val Allowed = Map(
    "day" -> "day", "d" -> "day",
    "hour" -> "hour", "hr" -> "hour", "h" -> "hour",
    "minute" -> "minute", "min" -> "minute")
  private val Rejected = Set("second", "sec", "microsecond", "week", "wk",
    "month", "mo", "year", "yr", "millisecond", "ms")

  private def normalize(token: String): String = {
    val alnum = token.filter(_.isLetterOrDigit).toLowerCase
    if (alnum.endsWith("s")) alnum.dropRight(1) else alnum
  }

  /** Parse or throw [[InvalidInterval]]. */
  def parse(text: String): Duration = {
    val raw = text.trim.split("\\s+").filter(_.nonEmpty).toIndexedSeq
    val tokens = raw.map(normalize)
    val unitIdx = tokens.zipWithIndex.filter { case (t, _) =>
      Allowed.contains(t) || Rejected(t)
    }
    if (unitIdx.exists { case (t, _) => Rejected(t) })
      throw InvalidInterval(
        s"unsupported unit in '$text': only days, hours and minutes are allowed")
    if (!unitIdx.exists { case (t, _) => Allowed.contains(t) })
      throw InvalidInterval(s"no day/hour/minute unit found in '$text'")
    var d = Duration.ZERO
    unitIdx.foreach { case (unit, i) =>
      if (i == 0) throw InvalidInterval(s"missing quantity before '$unit' in '$text'")
      // the quantity is validated on the RAW token: normalization strips
      // '.'/'-' so "1.5" would otherwise silently read as 15 (the
      // reference has this bug; documented divergence in the scaladoc)
      if (!raw(i - 1).forall(_.isDigit))
        throw InvalidInterval(s"invalid quantity '${raw(i - 1)}' before '$unit' in '$text'")
      val qty = Try(raw(i - 1).toLong) match {
        case Success(n) => n
        case Failure(_) =>
          throw InvalidInterval(s"invalid quantity '${raw(i - 1)}' before '$unit' in '$text'")
      }
      d = Allowed(unit) match {
        case "day"    => d.plusDays(qty)
        case "hour"   => d.plusHours(qty)
        case "minute" => d.plusMinutes(qty)
      }
    }
    d
  }

  def tryParse(text: String): Either[String, Duration] =
    Try(parse(text)) match {
      case Success(d)                  => Right(d)
      case Failure(InvalidInterval(m)) => Left(m)
      case Failure(e)                  => Left(e.getMessage)
    }
}
