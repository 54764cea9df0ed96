package graft.operators

import graft.{Catalog, SparkSpec}

/** e07_approx_dau has no SQL oracle (HLL sketches are engine-specific);
  * this spec is its correctness gate: relative error vs the exact
  * count-distinct (e03) must stay under 5% on every day.
  */
class EventsApproxSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

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
