package graft.operators

import graft.QueryDef
import graft.QueryHelpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the `events` table (JSON props, time
  * windows, sessionization). `graft.streaming.EventStreams` carries the
  * Structured Streaming forms (watermarked tumbling/sliding/session
  * windows); the queries here are their batch duals, so the DuckDB oracle
  * checks the shared windowing logic too.
  *
  * Timestamps: the parquet stores nanosecond precision; all outputs are
  * truncated to whole seconds and formatted as strings so Spark (micros)
  * and DuckDB (nanos) agree bit-for-bit.
  */
object Events {

  val entries: Seq[QueryDef] = Seq(

    QueryDef("e01_json_extract_agg",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        eventsTbl(s, dir)
          .withColumn("k", get_json_object($"props", "$.k").cast("long"))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum($"k").as("sum_k"),
            sumExact($"value").as("sum_value"))
          .orderBy($"event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        ${sumExactSql("value")} AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    QueryDef("e06_props_map_buckets",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        import org.apache.spark.sql.types.{MapType, StringType}
        // full JSON parse to MapType (FIXTURES.md B) — then group by a
        // decile bucket of the map's "k" value. NOTE: this query exists
        // to exercise the MapType column shape; when only known keys are
        // consulted, e01's `get_json_object` single-key extraction is the
        // PRODUCTION form — it skips materializing the whole map per row
        // (measured 0.9 s vs 4.2 s here at sf0.1; EventsJsonSpec pins the
        // equivalence of the two extraction paths).
        eventsTbl(s, dir)
          .withColumn("props_map", from_json($"props", MapType(StringType, StringType)))
          .withColumn("k", element_at($"props_map", "k").cast("long"))
          .groupBy(($"k" / 10).cast("long").as("k_bucket"))
          .agg(
            count(lit(1)).as("n"),
            sum($"k").as("sum_k"),
            sumExact($"value").as("sum_value"))
          .orderBy($"k_bucket")
      },
      // Spark ($"k"/10).cast("long") is double-divide then truncate-toward
      // -zero; k>=0 so integer floor-divide matches. DuckDB // floors.
      Some(s"""SELECT CAST(k // 10 AS BIGINT) AS k_bucket, COUNT(*) AS n,
        CAST(SUM(k) AS BIGINT) AS sum_k,
        ${sumExactSql("value")} AS sum_value
        FROM (SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, value FROM events)
        GROUP BY 1 ORDER BY k_bucket""")),

    // t-digest-style approximate percentiles — like e07, the sketch is
    // engine-specific (no SQL oracle; rows-only + EventsApproxSpec
    // tolerance gate). At 100 TB the sketch merges map-side instead of
    // shuffling every value to a sorted percentile.
    QueryDef("e10_approx_value_percentiles",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        eventsTbl(s, dir)
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            percentile_approx($"value", array(lit(0.5), lit(0.95), lit(0.99)), lit(10000))
              .as("value_pcts"))
          .select($"event_type", $"n",
            $"value_pcts".getItem(0).as("p50"),
            $"value_pcts".getItem(1).as("p95"),
            $"value_pcts".getItem(2).as("p99"))
          .orderBy($"event_type")
      },
      None),

    // Exact percentile_disc dual of e10 — puts the percentile family
    // under the hash gate (r5 verdict #3: the sketch alone left it
    // rows-only). percentile_disc SELECTS a data value (no
    // interpolation), so the doubles hash-match bit-for-bit once both
    // engines pick the same rank. The rank k_p = ceil(p·n) is computed
    // in PURE INTEGER arithmetic — (n+1) div 2, (19n+19) div 20,
    // (99n+99) div 100 — because the naive CEIL(0.95 * n) parses 0.95
    // as IEEE double in Spark but DECIMAL(3,2) in DuckDB, and e.g.
    // n=20 gives ceil(19.000000000000004)=20 vs ceil(19.00)=19: the
    // builtins' boundary behavior is engine luck, integer ranks are
    // law. Cost shape: ONE shuffle on event_type feeding a per-key
    // sort (inherent to exact percentiles — rank selection needs a
    // total order). At 100 TB with few hot keys this skews, which is
    // exactly why e10's mergeable sketch is the scale path; this exact
    // form is the oracle-grade answer for moderate-cardinality keys
    // and the per-round measure of the sketch's true rank error
    // (EventsApproxSpec asserts e10 against THIS query's values).
    QueryDef("e10b_value_percentiles",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // Two-phase bucketed rank (r19, q19's rationale): a handful of
        // event types previously funneled n/|types| rows each through
        // one window task (9.1 s of the sf6.4 serve band). Range-bucket
        // each type on value (monotone ⇒ bucket-major order is the
        // sort order; value has no nulls in this corpus — checked, and
        // the original window relied on the same), global
        // rn = bucket exclusive-prefix count + local row_number. Equal
        // values may reorder WITHIN a tie group vs the single-window
        // form, but the extracted p50/p95/p99 are positions in the
        // sorted multiset — identical by construction (the original
        // row_number-over-ties relied on exactly this). n rides the
        // span frame instead of a second whole-partition window.
        val B = 32
        val e = eventsTbl(s, dir).select($"event_type", $"value")
        val spans = e.groupBy($"event_type").agg(
          min($"value").as("_lo"), max($"value").as("_hi"),
          count(lit(1)).as("n"))
          .withColumn("_w", (($"_hi" - $"_lo") / lit(B.toDouble)))
        val withB = e.join(broadcast(spans), Seq("event_type"))
          .withColumn("_bkt", least(lit(B - 1),
            when($"_w" > 0.0, floor(($"value" - $"_lo") / $"_w").cast("int"))
              .otherwise(lit(0))))
        val wLocal = Window.partitionBy($"event_type", $"_bkt").orderBy($"value")
        val wOff = Window.partitionBy($"event_type").orderBy($"_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = withB.groupBy($"event_type", $"_bkt")
          .agg(count(lit(1)).as("_bn"))
          .withColumn("_off", coalesce(sum($"_bn").over(wOff), lit(0L)))
          .select($"event_type", $"_bkt", $"_off")
        withB
          .withColumn("_lrn", row_number().over(wLocal).cast("long"))
          .join(broadcast(offs), Seq("event_type", "_bkt"))
          .withColumn("rn", $"_off" + $"_lrn")
          .groupBy($"event_type")
          .agg(
            max($"n").as("n"),
            max(when($"rn" === expr("(n + 1) div 2"), $"value")).as("p50"),
            max(when($"rn" === expr("(19 * n + 19) div 20"), $"value")).as("p95"),
            max(when($"rn" === expr("(99 * n + 99) div 100"), $"value")).as("p99"))
          .orderBy($"event_type")
      },
      Some("""WITH ranked AS (
          SELECT event_type, value,
            CAST(row_number() OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS rn,
            CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM events)
        SELECT event_type, MAX(n) AS n,
          MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
          MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS p95,
          MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
        FROM ranked GROUP BY event_type ORDER BY event_type""")),

    QueryDef("e16_conversion_lag",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // time-to-convert distribution: per user, first 'view' → first
        // 'purchase' lag, exact disc percentiles over converting users
        // (e10b's integer-rank discipline). Eligibility (p > v) is
        // decided at MICROSECOND precision — the exact precision the
        // engines share (Spark stores micros; the oracle floors nanos
        // with epoch_ns//1000, the e08 convention), so same-second
        // conversions are kept (lag 0) instead of censored, and nothing
        // sub-micro can diverge. The reported lag is whole seconds
        // (floor of each side). Scale shape: the heavy shuffle is the
        // user-keyed first-event reduction (map-side partial min); the
        // percentile sort then runs over CONVERTING USERS only — if
        // even that set is huge, e10's KLL sketch is the documented
        // scale path for the selection step.
        val micros = eventsTbl(s, dir)
          .filter($"event_type".isin("view", "purchase"))
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        val firsts = micros.groupBy($"user_id").agg(
          min(when($"event_type" === "view", $"us")).as("v"),
          min(when($"event_type" === "purchase", $"us")).as("p"))
        val lags = firsts
          .filter($"v".isNotNull && $"p".isNotNull && $"p" > $"v")
          .select(expr("(p div 1000000) - (v div 1000000)").as("lag_s"), lit(0).as("g"))
        val wRank = Window.partitionBy($"g").orderBy($"lag_s")
        val wAll = Window.partitionBy($"g")
        lags
          .withColumn("rn", row_number().over(wRank).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .groupBy($"g")
          .agg(
            max($"n").as("n_converted"),
            max(when($"rn" === expr("(n + 1) div 2"), $"lag_s")).as("p50_s"),
            max(when($"rn" === expr("(9 * n + 9) div 10"), $"lag_s")).as("p90_s"),
            max(when($"rn" === expr("(99 * n + 99) div 100"), $"lag_s")).as("p99_s"))
          .select($"n_converted", $"p50_s", $"p90_s", $"p99_s")
      },
      // the inner GROUP BY 1 over a constant mirrors the Spark side's
      // dummy-key groupBy: with NO converting users both engines return
      // ZERO rows (a bare global aggregate would emit one all-NULL row
      // and diverge exactly on the empty case)
      Some("""WITH base AS (
          SELECT user_id,
            MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000 END) AS v,
            MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END) AS p
          FROM events WHERE event_type IN ('view', 'purchase') GROUP BY user_id),
        lags AS (SELECT (p // 1000000) - (v // 1000000) AS lag_s FROM base
                 WHERE v IS NOT NULL AND p IS NOT NULL AND p > v),
        ranked AS (SELECT lag_s,
            CAST(row_number() OVER (ORDER BY lag_s) AS BIGINT) AS rn,
            CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM lags)
        SELECT n_converted, p50_s, p90_s, p99_s FROM (
          SELECT 0 AS g, MAX(n) AS n_converted,
            MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_s END) AS p50_s,
            MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_s END) AS p90_s,
            MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN lag_s END) AS p99_s
          FROM ranked GROUP BY 1)""")),

    // HyperLogLog++ approximate distinct — the scale path for e03's
    // count-distinct at 100 TB (no per-key shuffle of raw user_ids; HLL
    // sketches merge map-side). No SQL oracle: DuckDB's approx sketch
    // differs by construction, so the driver records a rows-only check;
    // EventsApproxSpec asserts <5% relative error vs the exact count.
    QueryDef("e07_approx_dau",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        eventsTbl(s, dir)
          .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
          .agg(
            approx_count_distinct($"user_id", 0.02).as("approx_dau"),
            count(lit(1)).as("n_events"))
          .orderBy($"day")
      },
      None),

    QueryDef("e02_hourly_tumbling",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        eventsTbl(s, dir)
          .groupBy(
            date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            $"event_type")
          .agg(count(lit(1)).as("n"), sumExact($"value").as("sum_value"))
          .orderBy($"hour", $"event_type")
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        COUNT(*) AS n, ${sumExactSql("value")} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    QueryDef("e18_rolling_anomaly",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // Rolling z-score anomaly flagging over per-type hourly volumes
        // — the ingest-monitoring query every pipeline runs over its own
        // event stream. Window = the previous 24 OBSERVED hourly buckets
        // per type (ROWS, not RANGE: observation-indexed history —
        // compose with e17's gap fill when a time-indexed window over a
        // sparse series is wanted); hours with a full window get
        // z = (c·24 − S)/√(24·Q − S²) against that history, and the
        // anomaly FLAG is the equivalent pure-integer predicate
        // (c·24 − S)² > 9·(24·Q − S²) — |z| > 3 decided with zero float
        // arithmetic, so the flag cannot drift between engines even
        // where z itself is NULL (a constant history has variance 0:
        // any deviation flags, z has no finite value). S and Q are
        // exact BIGINT window sums; 24·Q − S² ≥ 0 by Cauchy-Schwarz.
        // Scale shape: one hourly pre-aggregate (map-side partials cut
        // the event stream to type×hour rows), then a window over the
        // TINY aggregate partitioned by type — the window never sees
        // raw events. Overflow-safe to ~8.4e7 events/hour/type (the
        // binding term is 9·(24·Q − S²), not S² — 1296·c² crosses the
        // i64 edge first); ANSI mode fails loudly past it, and the
        // streaming dual's BigInt arithmetic keeps answering there.
        val w = Window.partitionBy($"event_type").orderBy($"hour")
          .rowsBetween(-24, -1)
        eventsTbl(s, dir)
          .groupBy($"event_type",
            date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"))
          .agg(count(lit(1)).as("n"))
          .withColumn("w_cnt", count($"n").over(w))
          .withColumn("s", sum($"n").over(w))
          .withColumn("q", sum($"n" * $"n").over(w))
          .filter($"w_cnt" === 24)
          .withColumn("dev", $"n" * lit(24L) - $"s")
          .withColumn("varn", lit(24L) * $"q" - $"s" * $"s")
          .withColumn("z", when($"varn" > 0L, $"dev" / sqrt($"varn".cast("double"))))
          .withColumn("is_anomaly", $"dev" * $"dev" > lit(9L) * $"varn")
          .select($"event_type", $"hour", $"n", $"z", $"is_anomaly")
          .orderBy($"event_type", $"hour")
      },
      Some("""WITH hourly AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        win AS (
          SELECT event_type, hour, n,
                 COUNT(n) OVER w AS w_cnt,
                 CAST(SUM(n) OVER w AS BIGINT) AS s,
                 CAST(SUM(n * n) OVER w AS BIGINT) AS q
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        SELECT event_type, hour, n,
               CASE WHEN 24 * q - s * s > 0
                    THEN (n * 24 - s) / sqrt(CAST(24 * q - s * s AS DOUBLE)) END AS z,
               (n * 24 - s) * (n * 24 - s) > 9 * (24 * q - s * s) AS is_anomaly
        FROM win WHERE w_cnt = 24
        ORDER BY event_type, hour""")),

    QueryDef("e03_user_daily_active",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        eventsTbl(s, dir)
          .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
          .agg(
            countDistinct($"user_id").as("dau"),
            count(lit(1)).as("n_events"))
          .orderBy($"day")
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau, COUNT(*) AS n_events
        FROM events GROUP BY 1 ORDER BY day""")),

    QueryDef("e15_rolling_wau",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // rolling 7-day active users — the WAU/MAU family. Genuinely
        // hard in windowed SQL (COUNT(DISTINCT) OVER RANGE is
        // unsupported in Spark); dedup to (day, user) FIRST — event-
        // count → active-pair-count reduction at the earliest
        // aggregate — then SWEEP-LINE instead of the r15 7×-explode +
        // countDistinct: a user counts toward WAU(d) iff d lies in the
        // union of [a, a+6] over their active days a, so merge each
        // user's active days into coverage segments (consecutive days
        // ≤ 6 apart extend one segment — one lag + running sum over
        // the user partition), emit ±1 deltas at segment boundaries,
        // and evaluate the running delta sum at each observed day.
        // PROBES_r15 flagged the explode form's sf6.4 step at 2.76×
        // for 2.13× data with LINEAR inputs (user-day fill is constant
        // 0.891 across tiers) — the growing term was the 7×-expanded
        // distinct aggregate's hash state (17.9M rows into 2.9M keys
        // at 64×), a constant-factor cache effect, not input growth.
        // The sweep-line never materializes the ×7 stream: shuffle is
        // the deduped pairs once (by user) plus a day-keyed delta agg
        // that map-side combines to ~2 rows per distinct day, and the
        // final evaluation joins two day-count-sized frames (broadcast
        // nested loop — both sides are calendar-sized, never data-
        // sized). Output restricted to days that actually occur.
        val ud = eventsTbl(s, dir)
          .select(to_date(date_trunc("day", $"ts")).as("day"), $"user_id")
          .distinct()
        val wU = Window.partitionBy($"user_id").orderBy($"day")
        val cumU = wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = ud
          .withColumn("prev", lag($"day", 1).over(wU))
          .withColumn("newseg",
            when($"prev".isNull || datediff($"day", $"prev") > 6, 1L).otherwise(0L))
          .withColumn("segid", sum($"newseg").over(cumU))
          .groupBy($"user_id", $"segid")
          .agg(min($"day").as("s"), date_add(max($"day"), 6).as("e"))
        val deltas = seg.select($"s".as("d"), lit(1L).as("delta"))
          .unionByName(seg.select(date_add($"e", 1).as("d"), lit(-1L).as("delta")))
          .groupBy($"d").agg(sum($"delta").as("delta"))
        val days = ud.select($"day").distinct()
        days.join(broadcast(deltas), deltas("d") <= days("day"))
          .groupBy($"day")
          .agg(sum($"delta").as("wau"))
          .select(date_format($"day", "yyyy-MM-dd").as("day"), $"wau")
          .orderBy($"day")
      },
      // oracle: the equivalent day-range join over the deduped pairs
      Some("""WITH ud AS MATERIALIZED (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
          FROM events),
        days AS (SELECT DISTINCT day FROM ud)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM days d JOIN ud u
          ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day ORDER BY day""")),

    QueryDef("e04_sessionize",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // gap compare on INTEGER microseconds (unix_micros) — both engines
        // floor-truncate nanos to micros identically, so a gap within 1us
        // of the 1800s boundary cannot split sessions differently.
        eventsTbl(s, dir)
          .withColumn("prev_ts", lag($"ts", 1).over(byUser))
          .withColumn("new_sess",
            when($"prev_ts".isNull ||
              (unix_micros($"ts") - unix_micros($"prev_ts")) > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum($"new_sess").over(cum))
          .groupBy($"user_id", $"session_id")
          .agg(
            date_format(date_trunc("second", min($"ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            count(lit(1)).as("n_events"),
            sumExact($"value").as("sum_value"))
          .orderBy($"user_id", $"session_id")
      },
      Some(s"""WITH flagged AS (
          SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR (epoch_ns(ts) // 1000) - (epoch_ns(lag(ts) OVER w) // 1000) > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, value,
            CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id,
          strftime(date_trunc('second', MIN(ts)), '%Y-%m-%d %H:%M:%S') AS session_start,
          COUNT(*) AS n_events,
          ${sumExactSql("value")} AS sum_value
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    QueryDef("e08_asof_last_purchase",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // AS-OF JOIN, Spark-first: for every event, the user's most
        // recent prior-or-same 'purchase' event, via the reusable
        // AsofJoin operator (tag-union-window composition — see its
        // scaladoc for the scale argument). The right side is pre-deduped
        // to one row per (user, time); times compare as integer
        // microseconds in both engines.
        val ev = eventsTbl(s, dir)
        val left = ev.select($"event_id", $"user_id", unix_micros($"ts").as("t"))
        val purch = ev.filter($"event_type" === "purchase")
          .groupBy($"user_id", unix_micros($"ts").as("t"))
          .agg(max($"event_id").as("last_purchase_id"))
          .withColumn("pt", $"t")
        AsofJoin(left, purch, key = "user_id", leftTime = "t", rightTime = "t",
            payloadCols = Seq("last_purchase_id", "pt"))
          .select(
            $"event_id", $"user_id",
            date_format(date_trunc("second", timestamp_micros($"t")), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            $"last_purchase_id",
            ($"t" - $"pt").as("gap_micros"))
          .orderBy($"event_id")
      },
      // the oracle uses DuckDB's NATIVE ASOF JOIN on the same floored-
      // micros key — two independent formulations of the semantics
      Some("""WITH e AS (SELECT event_id, user_id, ts, epoch_ns(ts) // 1000 AS tsm FROM events),
        purch AS (SELECT user_id, epoch_ns(ts) // 1000 AS tsm, MAX(event_id) AS purchase_id
                  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT e.event_id, e.user_id,
          strftime(date_trunc('second', e.ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
          p.purchase_id AS last_purchase_id,
          e.tsm - p.tsm AS gap_micros
        FROM e ASOF LEFT JOIN purch p ON e.user_id = p.user_id AND e.tsm >= p.tsm
        ORDER BY e.event_id""")),

    QueryDef("e09_click_attribution",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // batch dual of EventStreams.clickAttribution (stream-stream
        // interval join): purchases × same-user clicks within the prior
        // hour; integer-microsecond time math in both engines
        graft.streaming.EventStreams.clickAttribution(eventsTbl(s, dir))
          .orderBy($"purchase_id", $"click_id")
      },
      Some("""WITH c AS (SELECT user_id, epoch_ns(ts) // 1000 AS tsm, event_id AS click_id
                FROM events WHERE event_type = 'click'),
        p AS (SELECT user_id, epoch_ns(ts) // 1000 AS tsm, event_id AS purchase_id
              FROM events WHERE event_type = 'purchase')
        SELECT p.user_id, p.purchase_id, c.click_id,
               p.tsm - c.tsm AS gap_micros
        FROM p JOIN c ON p.user_id = c.user_id
          AND c.tsm BETWEEN p.tsm - 3600000000 AND p.tsm
        ORDER BY purchase_id, click_id""")),

    QueryDef("e11_funnel",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // ordered funnel signup → click → purchase: each stage's time is
        // the user's first qualifying event STRICTLY AFTER the previous
        // stage. Three cheap per-user aggregations, joined back — no
        // window over the full event stream. Integer-microsecond times.
        val ev = eventsTbl(s, dir)
          .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
        val s1 = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"t").as("t_signup"))
        val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
          .filter($"t" > $"t_signup")
          .groupBy($"user_id", $"t_signup").agg(min($"t").as("t_click"))
        val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
          .filter($"t" > $"t_click")
          .groupBy($"user_id", $"t_signup", $"t_click").agg(min($"t").as("t_purchase"))
        val n1 = s1.agg(count(lit(1)).as("n_signup"))
        val n2 = s2.agg(count(lit(1)).as("n_click_after"))
        val n3 = s3.agg(count(lit(1)).as("n_purchase_after"))
        n1.crossJoin(n2).crossJoin(n3)
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t FROM events),
        s1 AS (SELECT user_id, MIN(t) AS t_signup FROM ev WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, MIN(e.t) AS t_click FROM ev e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.t > s1.t_signup GROUP BY 1),
        s3 AS (SELECT e.user_id, MIN(e.t) AS t_purchase FROM ev e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.t > s2.t_click GROUP BY 1)
        SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
               (SELECT COUNT(*) FROM s2) AS n_click_after,
               (SELECT COUNT(*) FROM s3) AS n_purchase_after""")),

    QueryDef("e12_cohort_retention",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // cohort = first-seen day; retention = distinct users active at
        // each day offset from their cohort day. Day arithmetic on UTC
        // dates in both engines.
        val ev = eventsTbl(s, dir)
          .select($"user_id", date_trunc("day", $"ts").cast("date").as("day"))
        val cohorts = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
        ev.join(cohorts, "user_id")
          .groupBy(date_format($"cohort_day", "yyyy-MM-dd").as("cohort_day"),
            datediff($"day", $"cohort_day").cast("long").as("day_offset"))
          .agg(countDistinct($"user_id").as("n_active"))
          .orderBy($"cohort_day", $"day_offset")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1)
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(day - cohort_day AS BIGINT) AS day_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
        FROM ev JOIN cohorts USING (user_id)
        GROUP BY 1, 2 ORDER BY cohort_day, day_offset""")),

    QueryDef("e05_sliding_window",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        eventsTbl(s, dir)
          .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), sumExact($"value").as("sum_value"))
          .select(
            date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
            $"event_type", $"n", $"sum_value")
          .orderBy($"win_start", $"event_type")
      },
      Some(s"""WITH expanded AS (
          SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS win_start, event_type, value FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type, value FROM events
        )
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
          COUNT(*) AS n, ${sumExactSql("value")} AS sum_value
        FROM expanded GROUP BY 1, 2 ORDER BY win_start, event_type"""))
  ,

    QueryDef("e13_type_transitions",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // First-order Markov transition matrix over per-user event
        // sequences — the sequence-mining shape behind next-action
        // models and funnel discovery. ONE shuffle keyed by user_id
        // feeds the lag window (same (ts, event_id) total order as
        // e04's sessionizer), then the matrix itself is a tiny
        // (|types|² ≤ 25-row) aggregate with map-side partials — at
        // 100 TB the window shuffle is the only data-sized stage, and
        // it reuses the partitioning any per-user analysis already
        // needs. Row-conditional probabilities are emitted as 1e-12
        // fixed-point BIGINTs via integer floor-division, staged as two
        // exact 1e6 hops: floor(t·1e12/s) = h·1e6 + floor(r·1e6/s) with
        // h = (t·1e6) div s, r = (t·1e6) mod s. The single-multiply
        // form t·1e12 overflows i64 once t > ~9.2e6 (ADVICE r5);
        // staging keeps every intermediate ≤ s·1e6, moving the bound to
        // s ≤ ~9.2e12 transitions per prev_type — above any plausible
        // 100 TB per-cell count — while staying exact and identical
        // cross-engine (a DOUBLE ratio would hash-diverge).
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val rowTot = Window.partitionBy($"prev_type")
        eventsTbl(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("prev_type", lag($"event_type", 1).over(byUser))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type", $"event_type")
          .agg(count(lit(1)).as("transitions"))
          .withColumn("row_total", sum($"transitions").over(rowTot))
          .withColumn("prob_fp", expr(
            "(transitions * 1000000 div row_total) * 1000000 + " +
              "(transitions * 1000000 % row_total) * 1000000 div row_total"))
          .select($"prev_type", $"event_type", $"transitions", $"prob_fp")
          .orderBy($"prev_type", $"event_type")
      },
      Some("""WITH seq AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events),
        tr AS (SELECT prev_type, event_type, COUNT(*) AS transitions
               FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT prev_type, event_type, transitions,
                       CAST(SUM(transitions) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total
                FROM tr)
        SELECT prev_type, event_type, transitions,
               CAST(((transitions * 1000000) // row_total) * 1000000
                 + (((transitions * 1000000) % row_total) * 1000000) // row_total AS BIGINT) AS prob_fp
        FROM tot ORDER BY prev_type, event_type""")),

    QueryDef("e14_top_paths",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // Top-20 most common 3-step event PATHS — the sequence-mining
        // extension of e13's first-order matrix (funnel DISCOVERY:
        // which journeys actually happen, vs e11 which measures one
        // prescribed journey). Same single user-keyed window shuffle as
        // e13/e04 (two lags ride the same sort), then the path space is
        // a tiny |types|³-bounded aggregate with map-side partials; the
        // global top-20 ranks ≤125 candidate rows. Ties break on path
        // text so the cut is deterministic cross-engine.
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        eventsTbl(s, dir)
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .withColumn("p1", lag($"event_type", 2).over(byUser))
          .withColumn("p2", lag($"event_type", 1).over(byUser))
          .filter($"p1".isNotNull)
          .select(concat_ws(" > ", $"p1", $"p2", $"event_type").as("path"))
          .groupBy($"path")
          .agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(
            Window.orderBy($"n".desc, $"path")).cast("long"))
          .filter($"rnk" <= 20)
          .select($"rnk", $"path", $"n")
          .orderBy($"rnk")
      },
      Some("""WITH seq AS (
          SELECT event_type,
                 lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
                 lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
          FROM events),
        paths AS (SELECT p1 || ' > ' || p2 || ' > ' || event_type AS path, COUNT(*) AS n
                  FROM seq WHERE p1 IS NOT NULL GROUP BY 1)
        SELECT rnk, path, n FROM (
          SELECT path, n,
                 CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rnk
          FROM paths)
        WHERE rnk <= 20 ORDER BY rnk""")),

    QueryDef("e17_gap_fill",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // Time-series gap filling + forward fill: materialize EVERY hour
        // in each event_type's observed span (dashboards and training
        // pipelines need explicit zeros, not absent rows) and carry the
        // last known hourly revenue across empty hours. The grid is
        // derived per key with sequence()+explode — an aggregate-sized
        // shuffle followed by a distributed explode, never a driver-side
        // loop — so at 100 TB the grid costs |types| x span-hours rows
        // regardless of event volume. The heavy lifting stays in the
        // (type, hour) pre-aggregation, which is map-side partial; the
        // forward-fill window runs per type over POST-AGGREGATION rows
        // (8.8k rows/type/year), so the single-partition-per-key sort is
        // structurally tiny no matter the input scale.
        val counts = eventsTbl(s, dir)
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
          .agg(count(lit(1)).as("n"), sumExact($"value").as("rev"))
        val spans = counts.groupBy($"event_type")
          .agg(min($"hr").as("lo"), max($"hr").as("hi"))
          .select($"event_type",
            explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("hr"))
        val w = Window.partitionBy($"event_type").orderBy($"hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spans.join(counts, Seq("event_type", "hr"), "left")
          .select($"event_type",
            date_format($"hr", "yyyy-MM-dd HH:mm:ss").as("hour"),
            coalesce($"n", lit(0L)).as("n_events"),
            last($"rev", ignoreNulls = true).over(w).as("rev_filled"))
          .orderBy($"event_type", $"hour")
      },
      Some(s"""WITH counts AS MATERIALIZED (
          SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                 COUNT(*) AS n, ${sumExactSql("value")} AS rev
          FROM events GROUP BY 1, 2),
        spans AS MATERIALIZED (
          SELECT event_type,
                 unnest(generate_series(min(hr), max(hr), INTERVAL 1 HOUR)) AS hr
          FROM counts GROUP BY event_type)
        SELECT s.event_type, strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hour,
          COALESCE(c.n, 0) AS n_events,
          last_value(c.rev IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_filled
        FROM spans s LEFT JOIN counts c ON s.event_type = c.event_type AND s.hr = c.hr
        ORDER BY s.event_type, hour"""))
  )
}
