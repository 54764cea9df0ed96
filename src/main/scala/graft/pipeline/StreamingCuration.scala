package graft.pipeline

import graft.sinks.{StreamingDelivery, WarehouseSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion form of the curation pipeline: documents arrive as
  * a stream, each micro-batch is quality-gated ([[Curation.curate]]'s
  * predicates), exact-deduped within the batch, deduped AGAINST the
  * already-ingested corpus, and appended idempotently under
  * [[StreamingDelivery]]'s `_batch_id` ledger.
  *
  * Scale design: the warehouse table itself is the dedup state. A
  * streaming `dropDuplicates` on the content fingerprint would grow an
  * unbounded state store (content dedup has no event time to watermark
  * on); instead each batch left-anti-joins the table's `fingerprint`
  * column — at 100 TB that is a shuffle of the (trigger-bounded) incoming
  * batch against a columnar scan of one pruned column, and the history
  * lives where it is cheapest, in the warehouse. Cross-batch duplicates
  * are eliminated because batch N's fingerprints are already in the table
  * when batch N+1 probes it (micro-batches execute serially under one
  * query).
  *
  * Replay: a replayed batch (same `batchId` after a crash) short-circuits
  * on the ledger BEFORE the anti-join — after delivery the table contains
  * the batch's own fingerprints, so re-running the anti-join would yield
  * zero rows and [[StreamingDelivery.warehouseBatch]]'s count check would
  * misread the replay as a ledger mismatch. The short-circuit restores
  * the idempotent no-op; the row-count verification is necessarily
  * forfeited for curated delivery (what a batch contributes depends on
  * the table state it first saw, which a replay cannot reconstruct).
  */
object StreamingCuration {

  /** The curation transform applied to every micro-batch: quality gate,
    * fingerprint, keep min-doc_id per fingerprint. Pure function of the
    * batch — shared by the batch path and tests. */
  private[pipeline] def curateBatch(batch: DataFrame, minTokens: Int,
      minUniqRatio: Double): DataFrame = {
    val toked = batch.withColumn("_toks", split(col("text"), " "))
    toked
      .filter(size(col("_toks")) >= minTokens)
      .filter(size(array_distinct(col("_toks"))) / size(col("_toks")) >= minUniqRatio)
      .drop("_toks")
      .withColumn("fingerprint", md5(col("text")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** `foreachBatch` function: curate → anti-join corpus → ledgered append. */
  def curatingBatch(table: String,
      database: String = WarehouseSink.DefaultDatabase,
      minTokens: Int = 5, minUniqRatio: Double = 0.1): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      WarehouseSink.requireIdent(database, "database")
      WarehouseSink.requireIdent(table, "destination table")
      val spark = batch.sparkSession
      // execute the micro-batch plan exactly once up front (see
      // StreamingDelivery.warehouseBatch on why a skipped or re-planned
      // batch breaks stateful upstreams)
      val snap = batch.localCheckpoint()
      try {
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
        val delivered =
          StreamingDelivery.deliveredRowCount(spark, database, table, batchId)
        if (delivered <= 0L) {
          val curated = curateBatch(snap, minTokens, minUniqRatio)
          val fresh =
            if (delivered < 0L) curated
            else curated.join(
              spark.table(s"`$database`.`$table`").select(col("fingerprint")),
              Seq("fingerprint"), "left_anti")
          StreamingDelivery.appendLedgered(
            fresh, database, table, batchId, tableIsNew = delivered < 0L)
        }
        // delivered > 0: replayed batch — the ledger already holds it
      } finally snap.unpersist(blocking = false)
  }

  /** Wire a streaming documents frame (doc_id, text, …) into a curated
    * warehouse table. */
  def start(docs: DataFrame, table: String, checkpointDir: String,
      database: String = WarehouseSink.DefaultDatabase,
      minTokens: Int = 5, minUniqRatio: Double = 0.1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(curatingBatch(table, database, minTokens, minUniqRatio))
      .start()
}
