package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming → warehouse delivery: the streaming analog of the
  * reference's whole job — get rows INTO the warehouse
  * (`/root/reference/flusher/load/bigquery.py:42-47` is the batch
  * append; this is its `writeStream` dual).
  *
  * Structured Streaming guarantees exactly-once END-TO-END only when the
  * sink is idempotent per micro-batch: after a crash between "write" and
  * "commit offsets", the SAME batch is replayed with the SAME `batchId`,
  * and a blind `foreachBatch` append would duplicate its rows. Delivery
  * therefore stamps every row with `_batch_id` and skips any batch whose
  * id already exists in the table — the table itself is the commit
  * ledger, so the guard needs no side store. A full from-scratch replay
  * of an UNCHANGED source is likewise a no-op (batch ids restart at 0
  * and reproduce); if the source grew or re-batched since the ledger was
  * written, same-id batches no longer carry the same rows, and the guard
  * fails loudly on the row-count mismatch instead of silently dropping
  * the difference. The delivered table is partitioned by `_batch_id`, so
  * the ledger probe prunes to a directory listing rather than a table
  * scan at any size.
  */
object StreamingDelivery {

  /** Column stamped onto every delivered row; doubles as the commit ledger. */
  val BatchIdCol = "_batch_id"

  /** Rows already delivered for `batchId`, or -1 if the table does not
    * exist yet. Fails fast on a foreign table without the ledger column
    * (idempotent delivery into it is impossible). */
  private[graft] def deliveredRowCount(spark: org.apache.spark.sql.SparkSession,
      database: String, table: String, batchId: Long): Long =
    if (!spark.catalog.tableExists(s"$database.$table")) -1L
    else {
      val existing = spark.table(s"`$database`.`$table`")
      if (!existing.columns.contains(BatchIdCol))
        throw new IllegalStateException(
          s"`$database`.`$table` exists but has no $BatchIdCol ledger column — " +
            "streaming delivery cannot be idempotent into it; " +
            "deliver to a fresh table or add the column")
      existing.filter(col(BatchIdCol) === batchId).count()
    }

  /** Append `rows` stamped with `batchId` into the ledger table. A fresh
    * table is partitioned by the ledger column (the probe above then
    * prunes to a directory listing); an EXISTING table keeps whatever
    * layout it has — appending with a partition spec that differs from
    * the table's is an AnalysisException, which would wedge delivery into
    * tables created before partitioning (or by other writers). */
  private[graft] def appendLedgered(rows: DataFrame, database: String,
      table: String, batchId: Long, tableIsNew: Boolean): Unit = {
    val spark = rows.sparkSession
    val usePartitioning =
      tableIsNew || spark.catalog.listColumns(s"$database.$table")
        .collect().exists(c => c.isPartition && c.name == BatchIdCol)
    val w = rows.withColumn(BatchIdCol, lit(batchId))
      .write.mode(SaveMode.Append).format("parquet")
    (if (usePartitioning) w.partitionBy(BatchIdCol) else w)
      .saveAsTable(s"`$database`.`$table`")
  }

  /** The `foreachBatch` function: batchId-idempotent append into
    * `database`.`table` (auto-created, like the reference's dataset
    * bootstrap — `bigquery.py:13-16`). */
  def warehouseBatch(table: String,
      database: String = WarehouseSink.DefaultDatabase): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      WarehouseSink.requireIdent(database, "database")
      WarehouseSink.requireIdent(table, "destination table")
      val spark = batch.sparkSession
      // Execute the micro-batch plan EXACTLY ONCE, up front: a stateful
      // upstream (dedup, windowed agg) must commit its state stores under
      // the streaming harness every batch — a skipped batch that never
      // touches `batch`, or a `.write` that re-plans it batch-side, both
      // trip Spark's state-commit validation. The snapshot is micro-batch
      // sized (bounded by the trigger), spills if needed, and the append
      // below reads it instead of re-executing the plan.
      val snap = batch.localCheckpoint()
      try {
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
        val qualified = s"`$database`.`$table`"
        val deliveredRows = deliveredRowCount(spark, database, table, batchId)
        if (deliveredRows < 0L || deliveredRows == 0L)
          appendLedgered(snap, database, table, batchId, tableIsNew = deliveredRows < 0L)
        else {
          // batchId matching is only sound while batch boundaries
          // reproduce — true for crash-replay under ONE checkpoint
          // lineage (the WAL pins each batch's offsets). After a
          // checkpoint reset over a source that grew or re-batched,
          // "same id" no longer means "same rows": skipping silently
          // would LOSE the difference, so verify the one cheap
          // invariant we hold (row count) and fail loudly on mismatch.
          val incoming = snap.count()
          if (incoming != deliveredRows)
            throw new IllegalStateException(
              s"$qualified already holds $deliveredRows rows for batch $batchId " +
                s"but the replayed batch carries $incoming — the checkpoint and the " +
                "delivery ledger disagree (checkpoint reset over a changed source?). " +
                "Deliver to a fresh table or restore the original checkpoint.")
        }
      } finally snap.unpersist(blocking = false)
  }

  /** Wire a (transformed) streaming frame into the warehouse. Callers
    * compose: `startToWarehouse(EventStreams.dedupEvents(src), ...)`. */
  def startToWarehouse(df: DataFrame, table: String, checkpointDir: String,
      database: String = WarehouseSink.DefaultDatabase,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(warehouseBatch(table, database))
      .start()
}
