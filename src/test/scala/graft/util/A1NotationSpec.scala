package graft.util

import org.scalatest.funsuite.AnyFunSuite

class A1NotationSpec extends AnyFunSuite {
  import A1Notation._

  test("colNumber: true bijective base-26") {
    assert(colNumber("A") == 1)
    assert(colNumber("Z") == 26)
    assert(colNumber("AA") == 27)
    assert(colNumber("AB") == 28)
    assert(colNumber("AZ") == 52)
    assert(colNumber("BA") == 53)
    assert(colNumber("ZZ") == 702)
    assert(colNumber("AAA") == 703)
  }

  test("documented divergence from the reference's base-25 bug (export.py:18-23)") {
    // identical for single letters...
    ('A' to 'Z').foreach(c => assert(referenceColNumberBug(c.toString) == colNumber(c.toString)))
    // ...wrong beyond: reference says AB -> 51; truth is 28
    assert(referenceColNumberBug("AB") == 51)
    assert(colNumber("AB") == 28)
  }

  test("colLetters round-trips colNumber") {
    (1 to 20000).foreach(n => assert(colNumber(colLetters(n)) == n))
  }

  test("parseRange basic / open-ended / whole-column") {
    assert(parseRange("A2:F100") == CellRange(1, 2, 6, Some(100)))
    assert(parseRange("A2:F") == CellRange(1, 2, 6, None))
    assert(parseRange("A:F") == CellRange(1, 1, 6, None))
    assert(parseRange("b3:ab10") == CellRange(2, 3, 28, Some(10)))
  }

  test("numColumns and open-range completion (export.py:47-48)") {
    assert(parseRange("A2:F100").numColumns == 6)
    assert(parseRange("AA1:AB2").numColumns == 2) // reference bug would say 26
    assert(parseRange("A2:F").completed(50) == CellRange(1, 2, 6, Some(50)))
    assert(parseRange("A2:F99").completed(50).endRow.contains(99))
  }

  test("inverted row ranges rejected (would silently slice zero rows)") {
    intercept[IllegalArgumentException](A1Notation.parseRange("A5:F2"))
    intercept[IllegalArgumentException](A1Notation.parseRange("A1:F0"))
  }

  test("invalid input rejected") {
    intercept[IllegalArgumentException](parseRange("12:AB"))
    intercept[IllegalArgumentException](parseRange("A1"))
    intercept[IllegalArgumentException](colNumber("a1"))
    intercept[IllegalArgumentException](colNumber(""))
  }
}
