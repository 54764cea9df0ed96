package graft.control

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style coverage (seeded sampling — scalatestplus isn't on the
  * offline classpath): the control/log CSV codec round-trips ANY cell
  * content, since job errors and document titles land in these files
  * verbatim. */
class CsvCodecPropSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private val alphabet = "abcXYZ019,\"\t ß→'\\;".toCharArray

  private def cell(): String =
    Array.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString

  test("writeLine/parseLine round-trip 1000 random rows of hostile cells") {
    (1 to 1000).foreach { _ =>
      val cells = List.fill(1 + rnd.nextInt(8))(cell())
      assert(CsvCodec.parseLine(CsvCodec.writeLine(cells)) == cells)
    }
  }
}
