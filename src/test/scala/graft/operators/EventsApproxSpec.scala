package graft.operators

import graft.{Catalog, SparkSpec}

/** e07_approx_dau has no SQL oracle (HLL sketches are engine-specific);
  * this spec is its correctness gate: relative error vs the exact
  * count-distinct (e03) must stay under 5% on every day.
  */
class EventsApproxSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("e10 approx percentiles honor the sketch's RANK guarantee (±2% rank)") {
    import org.apache.spark.sql.functions._
    val approx = Catalog.byName("e10_approx_value_percentiles").run(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // percentile_approx guarantees rank accuracy, not value accuracy —
    // assert each approx value sits between the exact quantiles ±2% rank
    val exact = graft.QueryHelpers.eventsTbl(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.48)").as("p48"), expr("percentile(value, 0.52)").as("p52"),
        expr("percentile(value, 0.93)").as("p93"), expr("percentile(value, 0.97)").as("p97"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p48, p52, p93, p97)) =>
      val (a50, a95) = approx(k)
      assert(a50 >= p48 && a50 <= p52, s"$k p50 $a50 outside [$p48, $p52]")
      assert(a95 >= p93 && a95 <= p97, s"$k p95 $a95 outside [$p93, $p97]")
    }
  }

  test("e07 approx DAU within 5% of exact DAU per day") {
    val approx = Catalog.byName("e07_approx_dau").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Catalog.byName("e03_user_daily_active").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "same set of days")
    exact.foreach { case (day, n) =>
      val a = approx(day)
      val relErr = math.abs(a - n).toDouble / n
      assert(relErr < 0.05, s"day $day: approx=$a exact=$n relErr=$relErr")
    }
  }
}
