package graft.pipeline

import graft.sinks.{StreamingDelivery, WarehouseSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion form of the curation pipeline: documents arrive as
  * a stream, each micro-batch is quality-gated and exact-deduped with the
  * SAME shared predicates as [[Curation.curate]] ([[Curation.qualityGate]]
  * / [[Curation.exactDedup]] — one definition, two ingestion paths), then
  * deduped AGAINST the already-ingested corpus and appended idempotently
  * under [[StreamingDelivery]]'s `_batch_id` ledger.
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
  * misread the replay as a ledger mismatch. What a curated batch
  * CONTRIBUTED cannot be reconstructed on replay (it depends on the table
  * state it first saw), so the delivered-row count proves nothing — the
  * replay guard instead compares the batch's pre-curation INPUT row count,
  * stamped on every delivered row as `_input_rows` at delivery time,
  * against the replayed batch: a checkpoint reset over a grown or
  * re-batched source fails loudly instead of silently dropping the new
  * rows. Batches that contributed zero rows leave no stamp, but they also
  * leave no ledger entry — a replay re-executes them, and the anti-join
  * makes that re-execution self-healing.
  */
object StreamingCuration {

  /** Pre-curation batch size, stamped per delivered row (constant within
    * a batch); the replay-verification counterpart of the `_batch_id`
    * ledger. */
  val InputRowsCol = "_input_rows"

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
        val qualified = s"`$database`.`$table`"
        val delivered =
          StreamingDelivery.deliveredRowCount(spark, database, table, batchId)
        // a pre-existing table must carry the fingerprint column (the
        // dedup state itself) — fail with a clear message, not an
        // unresolved-column error every batch. A curated table WITHOUT
        // the _input_rows stamp (written by an earlier version, or by a
        // writer that dropped it) stays usable: parquet appends cannot
        // add a column to an existing table, so delivery matches the
        // legacy schema and replay verification degrades to the ledger
        // probe alone rather than wedging the stream.
        val existingCols =
          if (delivered >= 0L) spark.table(qualified).columns.toSet
          else Set.empty[String]
        if (delivered >= 0L && !existingCols("fingerprint"))
          throw new IllegalStateException(
            s"$qualified exists but has no fingerprint column — " +
              "it was not created by curated delivery; deliver to a fresh table")
        val stamped = delivered < 0L || existingCols(InputRowsCol)
        if (delivered <= 0L) {
          val curated = Curation.exactDedup(
            Curation.qualityGate(snap, minTokens, minUniqRatio))
          val fresh =
            if (delivered < 0L) curated
            else curated.join(
              spark.table(qualified).select(col("fingerprint")),
              Seq("fingerprint"), "left_anti")
          StreamingDelivery.appendLedgered(
            // the count job runs only when the stamp can be written —
            // legacy tables skip it (the value would be dead anyway)
            if (stamped) fresh.withColumn(InputRowsCol, lit(snap.count())) else fresh,
            database, table, batchId, tableIsNew = delivered < 0L)
        } else if (stamped) {
          // replayed batch: verify the one invariant that survives
          // curation — the pre-curation input size recorded at delivery
          val recorded = spark.table(qualified)
            .filter(col(StreamingDelivery.BatchIdCol) === batchId)
            .agg(max(col(InputRowsCol))).collect()(0).getLong(0)
          val incoming = snap.count()
          if (incoming != recorded)
            throw new IllegalStateException(
              s"$qualified batch $batchId was delivered from $recorded input rows " +
                s"but the replayed batch carries $incoming — the checkpoint and the " +
                "delivery ledger disagree (checkpoint reset over a changed source?). " +
                "Deliver to a fresh table or restore the original checkpoint.")
        } else {
          // legacy unstamped table: the replay skip CANNOT be verified —
          // a checkpoint reset over a grown source would be silently
          // swallowed here. Refusing outright would wedge every legacy
          // stream on its first honest replay, so degrade — but LOUDLY,
          // so the operator knows this table never regains the guarantee.
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"$qualified batch $batchId replayed against a table without " +
              s"$InputRowsCol — skip is UNVERIFIED (a checkpoint reset over a " +
              "changed source would be lost silently); migrate to a stamped table")
        }
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
