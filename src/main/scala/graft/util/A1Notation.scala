package graft.util

/** A1-notation arithmetic for rectangular sheet ranges.
  *
  * Re-expresses the reference's column math (`/root/reference/flusher/export.py:18-28`)
  * with TRUE base-26 semantics. The reference's `colnumber` is a known bug
  * (base-25 with reversed digit order, `export.py:23`): correct for A..Z
  * only, wrong beyond (`AB` -> 51 there, truly 28). We implement the
  * correct bijective base-26 system and document the divergence
  * (SURVEY.md §2.1 S4).
  *
  * A range is `"A2:F100"`; an open-ended range `"A2:F"` means "to the last
  * row of the sheet" (`export.py:47-48`).
  */
object A1Notation {

  /** One corner of a range: 1-based column ordinal + optional 1-based row. */
  final case class Corner(col: Int, row: Option[Int])

  /** Parsed rectangular range. `endRow=None` means open-ended (to sheet end). */
  final case class CellRange(startCol: Int, startRow: Int, endCol: Int, endRow: Option[Int]) {
    require(startCol >= 1 && startRow >= 1 && endCol >= startCol, s"invalid range: $this")
    // an inverted row range ("A5:F2") would silently slice zero rows
    require(endRow.forall(_ >= startRow), s"end row before start row: $this")
    /** Number of columns in the rectangle (reference: `numcolumns_from_range`). */
    def numColumns: Int = endCol - startCol + 1
    /** Complete an open-ended range given the sheet's last row (`export.py:47-48`). */
    def completed(sheetRows: Int): CellRange = copy(endRow = Some(endRow.getOrElse(sheetRows)))
  }

  /** `"A"`->1, `"Z"`->26, `"AA"`->27, `"AB"`->28 (bijective base-26). */
  def colNumber(letters: String): Int = {
    require(letters.nonEmpty && letters.forall(c => c >= 'A' && c <= 'Z'),
      s"invalid column letters: '$letters'")
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1))
  }

  /** Inverse of [[colNumber]]: 1->"A", 26->"Z", 27->"AA". */
  def colLetters(n: Int): String = {
    require(n >= 1, s"invalid column ordinal: $n")
    @annotation.tailrec
    def go(m: Int, acc: List[Char]): String =
      if (m == 0) acc.mkString
      else { val r = (m - 1) % 26; go((m - 1) / 26, (('A' + r).toChar) :: acc) }
    go(n, Nil)
  }

  private val CornerRe = "([A-Z]+)([0-9]*)".r

  def parseCorner(s: String): Corner = s.trim.toUpperCase match {
    case CornerRe(letters, digits) =>
      Corner(colNumber(letters), if (digits.isEmpty) None else Some(digits.toInt))
    case other => throw new IllegalArgumentException(s"invalid A1 corner: '$other'")
  }

  /** Parse `"A2:F100"` / `"A2:F"` / `"A:F"` (whole columns, all rows). */
  def parseRange(s: String): CellRange = s.split(":", -1) match {
    case Array(a, b) =>
      val (c1, c2) = (parseCorner(a), parseCorner(b))
      CellRange(c1.col, c1.row.getOrElse(1), c2.col, c2.row)
    case _ => throw new IllegalArgumentException(s"invalid A1 range: '$s'")
  }

  /** The reference's buggy base-25 ordinal (`export.py:18-23`), kept ONLY so
    * tests can pin the documented divergence; never used by the engine. */
  def referenceColNumberBug(letters: String): Int =
    letters.zipWithIndex.map { case (c, i) => (c - 'A' + 1) * math.pow(25, i).toInt }.sum
}
