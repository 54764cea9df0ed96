package graft.operators

import graft.{Catalog, SparkSpec}

/** e07_approx_dau has no SQL oracle (HLL sketches are engine-specific);
  * this spec is its correctness gate: relative error vs the exact
  * count-distinct (e03) must stay under 5% on every day.
  */
class EventsApproxSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("e16 conversion lag: driver-side first-view→first-purchase replay") {
    val rows = graft.QueryHelpers.eventsTbl(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type").isin("view", "purchase"))
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lags = rows.groupBy(_._1).values.flatMap { evs =>
      // micro-precision eligibility, whole-second floors — the query's
      // stated convention
      val v = evs.filter(_._2 == "view").map(_._3).minOption
      val p = evs.filter(_._2 == "purchase").map(_._3).minOption
      for (vv <- v; pp <- p if pp > vv) yield pp / 1000000L - vv / 1000000L
    }.toSeq.sorted
    val n = lags.length.toLong
    assert(n >= 5, s"fixture must exercise the rank arithmetic (n=$n)")
    def disc(num: Long): Long = lags(((num - 1).max(0)).toInt)
    val got = Catalog.byName("e16_conversion_lag").run(spark, sf).collect()(0)
    assert(got.getLong(0) == n, s"n_converted ${got.getLong(0)} != $n")
    assert(got.getLong(1) == disc((n + 1) / 2), "p50 mismatch")
    assert(got.getLong(2) == disc((9 * n + 9) / 10), "p90 mismatch")
    assert(got.getLong(3) == disc((99 * n + 99) / 100), "p99 mismatch")
  }

  test("e15 rolling WAU: per-day bounds vs e03 and a driver-side window replay") {
    val dau = Catalog.byName("e03_user_daily_active").run(spark, sf)
      .select("day", "dau").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wau = Catalog.byName("e15_rolling_wau").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wau.keySet == dau.keySet, "one WAU row per active day")
    // DAU ≤ WAU ≤ Σ window DAU; and the exact value matches a driver
    // replay of the 7-day distinct union
    val userDays = graft.QueryHelpers.eventsTbl(spark, sf)
      .selectExpr("date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day", "user_id")
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    wau.foreach { case (day, w) =>
      val d = java.time.LocalDate.parse(day, fmt)
      val want = userDays.filter { case (ud, _) =>
        val u = java.time.LocalDate.parse(ud, fmt)
        !u.isAfter(d) && u.isAfter(d.minusDays(7))
      }.map(_._2).distinct.length.toLong
      assert(w == want, s"$day: wau $w != replay $want")
      assert(w >= dau(day), s"$day: wau $w < dau ${dau(day)}")
    }
  }

  test("e10b exact disc percentiles replay driver-side; e10 sketch rank error vs e10b within ±2%") {
    // independent driver-side replay of the ceil(p*n) disc selection —
    // catches a rank-arithmetic slip in BOTH the catalog query and its
    // DuckDB oracle (which share the integer-rank formula)
    val vals = graft.QueryHelpers.eventsTbl(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    val exact = Catalog.byName("e10b_value_percentiles").run(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(exact.keySet == vals.keySet)
    vals.foreach { case (k, sorted) =>
      val n = sorted.length
      val (en, p50, p95, p99) = exact(k)
      assert(en == n, s"$k n")
      assert(p50 == sorted((n + 1) / 2 - 1), s"$k p50")
      assert(p95 == sorted((19 * n + 19) / 20 - 1), s"$k p95")
      assert(p99 == sorted((99 * n + 99) / 100 - 1), s"$k p99")
    }
    // percentile_approx guarantees RANK accuracy, not value accuracy:
    // the rank interval the sketch's value occupies in the exact sorted
    // data must overlap [p*n - 2%n, p*n + 2%n] (the r5 verdict asked for
    // the sketch's error to be measured against the exact dual per round)
    val approx = Catalog.byName("e10_approx_value_percentiles").run(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(0.50 -> r.getDouble(2), 0.95 -> r.getDouble(3), 0.99 -> r.getDouble(4))).toMap
    assert(approx.keySet == vals.keySet)
    for ((k, sorted) <- vals; (p, av) <- approx(k)) {
      val n = sorted.length
      val lo = sorted.count(_ < av) + 1  // 1-based rank interval of av
      val hi = sorted.count(_ <= av)
      val target = p * n
      val tol = 0.02 * n
      assert(hi >= target - tol && lo <= target + tol,
        s"$k p=$p approx=$av occupies ranks [$lo,$hi], target $target +- $tol of n=$n")
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
