package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hll_sketch_estimate, hll_union_agg, sum}

/** Streaming forms of the engine's mergeable sketches — Misra-Gries
  * heavy hitters ([[graft.operators.Documents.heavyHitters]] is the
  * batch dual), HLL distinct counts (e07's family), and KLL value
  * percentiles (e10's family).
  *
  * Design, consistent with the engine's other streaming state choices
  * (the dedup stream's "the warehouse table IS the state"): the stream
  * emits bounded per-partition MG SUMMARIES each micro-batch — a
  * stateless `mapPartitions`, append-mode, no state store — and the
  * summaries land in a `_batch_id`-ledgered warehouse table via the
  * existing idempotent delivery ([[graft.sinks.StreamingDelivery]]).
  * The estimate is read back by summing the ledger per token.
  *
  * The guarantee COMPOSES across batches: each (batch, partition)
  * summary undercounts any token by at most n_bp/(counters+1), and the
  * bounds add — Σ n_bp = n, so the merged estimate keeps the batch
  * operator's exact contract: never overcounts, undercount ≤
  * n/(counters+1), every token with true count above that bound
  * survives (Agarwal et al., "Mergeable Summaries"). Re-delivered
  * micro-batches are no-ops through the ledger, so crash-replay cannot
  * double-count a summary.
  *
  * Scale: state per task is the fixed `counters`-entry map; ledger
  * growth is ≤ counters × partitions rows per batch (summary-sized, not
  * stream-sized); the merge is a summary-table aggregation, never a
  * re-scan of the stream.
  */
object SketchStreams {

  /** Per-micro-batch MG summaries of a streaming frame's `tok` column:
    * (tok, est) rows, ≤ `counters` per partition. Stateless — safe in
    * append mode under any trigger. */
  def heavyHitterSummaries(tokens: DataFrame, counters: Int): DataFrame = {
    require(counters >= 1, s"counters must be >= 1, got $counters")
    val session = tokens.sparkSession
    import session.implicits._
    tokens.select(col("tok").cast("string")).as[String]
      .mapPartitions(graft.operators.Documents.mgSummarize(_, counters))
      .toDF("tok", "est")
  }

  /** Merged estimate over the delivered summary ledger: the streaming
    * counterpart of the batch operator's final aggregate. */
  def mergedHeavyHitters(spark: SparkSession, database: String, table: String): DataFrame =
    spark.table(s"`$database`.`$table`")
      .groupBy(col("tok")).agg(sum(col("est")).as("est_count"))

  // ---- HLL distinct-count summaries (e07's streaming form) ----
  //
  // Same ledger design as the MG stream (r6 verdict #5): each
  // micro-batch emits one compact Apache DataSketches HLL per
  // (partition, day) via a STATELESS mapPartitions — append mode, no
  // state store — and the `_batch_id`-ledgered delivery absorbs
  // replays. HLL sketches are mergeable with no error growth (Agarwal
  // et al., the same argument the MG stream cites): union-of-partials
  // equals the sketch of the union, so the merged estimate carries the
  // single-sketch ±~1.04/√2^lgK standard error regardless of how the
  // stream was chunked. The read-side merge is DECLARATIVE — Spark's
  // hll_union_agg/hll_sketch_estimate consume the DataSketches binary
  // directly — so it stays a summary-table aggregation.

  /** Per-micro-batch HLL partials of a streaming frame's (day, user_id)
    * columns: (day, hll binary) rows, one sketch per partition×day.
    * lgK = 12 matches Spark's own hll_sketch_agg default. */
  def dauSummaries(events: DataFrame, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of datasketches range: $lgK")
    val session = events.sparkSession
    import session.implicits._
    events.select(col("day").cast("string"), col("user_id").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[String, org.apache.datasketches.hll.HllSketch]
        it.foreach { case (d, u) =>
          m.getOrElseUpdate(d, new org.apache.datasketches.hll.HllSketch(lgK)).update(u)
        }
        m.iterator.map { case (d, sk) => (d, sk.toCompactByteArray) }
      }.toDF("day", "hll")
  }

  /** Merged per-day distinct-count estimate over the delivered summary
    * ledger — spec-gated against e03's exact DAU like batch e07. */
  def mergedDau(spark: SparkSession, database: String, table: String): DataFrame =
    spark.table(s"`$database`.`$table`")
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("approx_dau"))

  // ---- KLL percentile summaries (e10's streaming form) ----
  //
  // KllDoublesSketch partials per (partition, event_type), merged at
  // read with the library's own merge (KLL is a mergeable summary with
  // the same normalized rank error after any merge tree — Karnin,
  // Lang & Liberty 2016). k = 400 gives ~0.9% rank error; the spec
  // gates the merged estimates against e10b's exact disc percentiles
  // at ±2% rank, the same bar batch e10 is held to.

  private val KllK = 400

  /** Per-micro-batch KLL partials of a streaming frame's
    * (event_type, value) columns: (event_type, kll binary) rows. */
  def valuePercentileSummaries(events: DataFrame): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    val k = KllK
    events.select(col("event_type").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap
          .empty[String, org.apache.datasketches.kll.KllDoublesSketch]
        it.foreach { case (t, v) =>
          m.getOrElseUpdate(t,
            org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        m.iterator.map { case (t, sk) => (t, sk.toByteArray) }
      }.toDF("event_type", "kll")
  }

  /** Merged per-type percentile estimates over the delivered summary
    * ledger: (event_type, n, p50, p95, p99). The group merge is
    * summary-sized — ≤ partitions × batches sketches per type, each a
    * few KB — never a re-scan of the stream. */
  def mergedValuePercentiles(spark: SparkSession, database: String,
      table: String): DataFrame = {
    import spark.implicits._
    val k = KllK
    spark.table(s"`$database`.`$table`")
      .select(col("event_type").cast("string"), col("kll"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (t, it) =>
        val merged = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k)
        it.foreach { case (_, b) =>
          merged.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
            org.apache.datasketches.memory.Memory.wrap(b)))
        }
        (t, merged.getN, merged.getQuantile(0.5), merged.getQuantile(0.95),
          merged.getQuantile(0.99))
      }.toDF("event_type", "n", "p50", "p95", "p99")
  }
}
