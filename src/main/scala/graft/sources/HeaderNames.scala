package graft.sources

import scala.collection.mutable

/** Shared header-sanitization rule for both sheet read paths (the
  * DataFrame `SheetSource` and the DSv2 connector) — one implementation
  * so the same physical sheet yields the same column names either way.
  *
  * Non-alphanumerics → `_`; empty or digit-leading names fall back to
  * `col<i>` (slice-relative, 0-based); case-insensitive collisions get
  * `_2`, `_3`… suffixes — duplicate names would otherwise make
  * `fieldIndex` silently serve one column's data for both.
  */
object HeaderNames {
  def sanitize(raw: Seq[String]): Seq[String] = {
    val base = raw.zipWithIndex.map { case (v, i) =>
      val clean = Option(v).map(_.trim).getOrElse("").replaceAll("[^A-Za-z0-9_]", "_")
      if (clean.isEmpty || clean.head.isDigit) s"col$i" else clean
    }
    val seen = mutable.Map.empty[String, Int]
    base.map { n =>
      val k = n.toLowerCase
      val c = seen.getOrElse(k, 0)
      seen(k) = c + 1
      if (c == 0) n else s"${n}_${c + 1}"
    }
  }
}
