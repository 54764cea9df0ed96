package graft.operators

import graft.{Catalog, SparkSpec}

/** e13's transition matrix is oracle-gated for values; this spec pins the
  * SEMANTIC invariants of a first-order Markov matrix that a hash match
  * alone would not explain to a reader: conservation of transitions and
  * row-stochastic probabilities.
  */
class EventsSequenceSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("e13 transitions conserve events and rows are ~stochastic in fixed point") {
    import spark.implicits._
    val rows = Catalog.byName("e13_type_transitions").run(spark, sf).collect()
    assert(rows.nonEmpty)
    // each user with n events contributes exactly n-1 transitions
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val want = ev.count() - ev.select($"user_id").distinct().count()
    val got = rows.map(_.getAs[Long]("transitions")).sum
    assert(got == want, s"transition total $got != events - users $want")
    // per prev_type, floor-division probabilities sum to 1e12 minus at
    // most one truncation unit per outgoing type
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (p, rs) =>
      val s = rs.map(_.getAs[Long]("prob_fp")).sum
      assert(s <= 1000000000000L && s > 1000000000000L - rs.length,
        s"prev_type $p prob mass $s outside truncation window")
    }
  }

  test("e13 staged fixed-point division is exact beyond the old i64 overflow bound (ADVICE r5)") {
    // the single-multiply form t*1e12 overflows i64 once t > ~9.2e6;
    // the staged form must stay exact up to s ≈ 9.2e12. Verify against
    // BigInt on cells far past the old bound.
    val cases = Seq(
      (50000000L, 90000000L),              // t = 5e7: old form overflows
      (9000000000000L, 9100000000000L),    // near the new bound
      (1L, 9100000000000L),                // tiny numerator, huge total
      (7L, 7L))                            // exact 1.0
    val values = cases.map { case (t, s) =>
      s"(CAST($t AS BIGINT), CAST($s AS BIGINT))"
    }.mkString(", ")
    val got = spark.sql(
      s"""SELECT (t * 1000000 div s) * 1000000 + (t * 1000000 % s) * 1000000 div s AS fp
          FROM VALUES $values AS v(t, s)""").collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((t, s), g) =>
      val want = (BigInt(t) * BigInt(10).pow(12) / BigInt(s)).toLong
      assert(g == want, s"t=$t s=$s: staged $g != BigInt $want")
    }
  }
}
