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
}
