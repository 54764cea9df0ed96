package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum}

/** Streaming form of the Misra-Gries heavy-hitters sketch
  * ([[graft.operators.Documents.heavyHitters]] is the batch dual).
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
}
