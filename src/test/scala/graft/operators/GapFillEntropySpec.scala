package graft.operators

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.functions._

/** e17/t14 are oracle-gated for values; these tests pin the SEMANTIC laws
  * a hash match alone would not explain: grid completeness + fill
  * behavior for e17, and the information-theoretic bounds tying t14's
  * output back to the raw documents table.
  */
class GapFillEntropySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("e17 materializes every hour of each type's span, zeros gaps, forward-fills") {
    val rows = Catalog.byName("e17_gap_fill").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      // hour strings sort chronologically; the grid must be CONTIGUOUS:
      // span hours == row count, no duplicates
      val hours = rs.map(_.getAs[String]("hour")).sorted
      assert(hours.distinct.length == hours.length, s"$t: duplicate hours")
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      val lo = java.time.LocalDateTime.parse(hours.head, fmt)
      val hi = java.time.LocalDateTime.parse(hours.last, fmt)
      val span = java.time.Duration.between(lo, hi).toHours + 1
      assert(span == hours.length, s"$t: span $span hours but ${hours.length} rows")
      // span endpoints come from observed events — never a gap row
      val sorted = rs.sortBy(_.getAs[String]("hour"))
      assert(sorted.head.getAs[Long]("n_events") > 0, s"$t: leading gap row")
      assert(sorted.last.getAs[Long]("n_events") > 0, s"$t: trailing gap row")
      // forward fill: after the first row, rev_filled never goes null,
      // and a gap row carries EXACTLY the previous row's value
      sorted.sliding(2).foreach { case Array(prev, cur) =>
        assert(!cur.isNullAt(cur.fieldIndex("rev_filled")), s"$t: null after start")
        if (cur.getAs[Long]("n_events") == 0)
          assert(cur.getAs[Double]("rev_filled") == prev.getAs[Double]("rev_filled"),
            s"$t ${cur.getAs[String]("hour")}: gap row did not carry previous value")
      }
    }
    // the fixture actually exercises gap filling
    assert(rows.exists(_.getAs[Long]("n_events") == 0), "fixture has no gaps")
  }

  test("t14 entropy obeys its bounds and bigram counts tie to raw text lengths") {
    import spark.implicits._
    val got = Catalog.byName("t14_bigram_entropy").run(spark, sf).collect()
    assert(got.nonEmpty)
    // n_bigrams must equal length(text)-1 for every doc ≥ 2 chars
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length($"text") >= 2)
      .select($"doc_id", (length($"text") - 1).cast("long").as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.length == want.size)
    got.foreach { r =>
      val (id, nb, db, h) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("distinct_bigrams"), r.getAs[Long]("entropy_e9"))
      assert(nb == want(id), s"doc $id: n_bigrams $nb != length-1 ${want(id)}")
      // 0 ≤ H ≤ ln(distinct); grid rounding adds < 1 ulp-of-grid per
      // distinct bigram, hence the +db slack
      assert(h >= 0, s"doc $id: negative entropy")
      assert(h <= (math.log(db.toDouble) * 1e9).toLong + db,
        s"doc $id: H exceeds ln(distinct_bigrams)")
      // a uniform-ish natural-language doc is far from degenerate
      assert(db > 1, s"doc $id: single repeated bigram in fixture?")
    }
  }
}
