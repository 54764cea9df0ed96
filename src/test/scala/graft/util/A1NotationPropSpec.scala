package graft.util

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style coverage (seeded sampling) for bijective base-26. */
class A1NotationPropSpec extends AnyFunSuite {
  import A1Notation._

  private val rnd = new Random(42)

  test("colLetters/colNumber are inverse bijections on sampled [1, 1e6]") {
    ((1 to 60) ++ Seq.fill(1000)(1 + rnd.nextInt(1000000))).foreach { n =>
      assert(colNumber(colLetters(n)) == n, s"n=$n letters=${colLetters(n)}")
    }
  }

  test("colNumber is strictly monotone across letter-length boundaries") {
    Seq(25, 26, 27, 675, 676, 677, 17575, 17576, 17577).foreach { n =>
      assert(colNumber(colLetters(n + 1)) == colNumber(colLetters(n)) + 1)
    }
  }

  test("range width matches the ordinal difference on sampled ranges") {
    (1 to 500).foreach { _ =>
      val c = 1 + rnd.nextInt(10000)
      val w = rnd.nextInt(100)
      val r = parseRange(s"${colLetters(c)}1:${colLetters(c + w)}9")
      assert(r.numColumns == w + 1)
    }
  }
}
