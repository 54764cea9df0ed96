package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC → warehouse delivery with MERGE semantics: each
  * micro-batch is upserted (last-writer-wins per key, optional
  * tombstone deletes) into a plain-parquet warehouse table via
  * [[graft.operators.MergeUpsert]] — the third delivery mode after
  * full-replace (K2) and ledgered append (K3/[[StreamingDelivery]]),
  * and the one a change-data stream actually needs: the table tracks
  * CURRENT STATE per key, not event history.
  *
  * Scale design — bucket-pruned rewrites. Plain parquet has no row-level
  * update, so a naive merge rewrites the whole table every batch. The
  * delivered table is therefore partitioned by a key-hash bucket column
  * (`_kb` = xxhash64(keys) mod numBuckets): each batch only READS the
  * buckets its keys hash into and only REWRITES those same buckets
  * (dynamic partition overwrite). Per-batch cost is proportional to the
  * touched buckets' size, not the table's; a small batch over a huge
  * table touches a handful of partition directories. Size `numBuckets`
  * so one bucket ≈ a comfortable rewrite unit (table size / buckets);
  * the batch's own merge work is broadcast-anti-join map-side
  * (MergeUpsert's contract).
  *
  * Exactly-once without a ledger: MERGE is idempotent — re-applying the
  * SAME batch re-overwrites the same keys to the same values. Under one
  * checkpoint lineage only the latest uncommitted batch ever replays
  * (offsets commit after foreachBatch returns), so crash-replay
  * converges; a crash mid-write leaves each affected bucket either old
  * or fully merged (partition-dir replacement is the atom), and the
  * replay re-merges both kinds to the same final state. The ORDER
  * guarantee is the stream's: upserts across batches apply in batch
  * order; within a batch, `orderBy` picks the surviving version per key.
  *
  * `numBuckets` is pinned in a `{table}_upsert_meta` parquet table on
  * first delivery (the PQ-index meta discipline): a later writer with a
  * different bucket count would scatter the same key across two buckets
  * and silently duplicate it — the guard fails loudly instead.
  */
object StreamingUpsert {

  /** Key-hash bucket partition column stamped on the delivered table. */
  val BucketCol = "_kb"

  private def qualified(database: String, table: String) = s"`$database`.`$table`"

  private def bucketOf(keys: Seq[String], numBuckets: Int) =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong))

  /** Reduce a batch to ONE row per key. With `orderBy` columns the
    * greatest (orderBy, then keys — callers should make orderBy total
    * per key) version survives; without, duplicate keys are a contract
    * violation and fail loudly (silently picking one would apply an
    * ARBITRARY version of the row).
    *
    * orderBy ties resolve DETERMINISTICALLY: a hash of every non-orderBy
    * column is appended to the window ordering, so two rows with equal
    * orderBy values have the same winner on every (re-)execution — a
    * crash-replay of the batch converges to the identical final state
    * (the idempotent-replay claim needs a total order, and a partial one
    * plus row_number is nondeterministic). Fully identical rows still
    * tie, but then either winner IS the same row. */
  private[sinks] def latestPerKey(batch: DataFrame, keys: Seq[String],
      orderBy: Seq[String]): DataFrame =
    if (orderBy.nonEmpty) {
      val tiebreak = batch.columns.filterNot(orderBy.contains).sorted.map(col)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(orderBy.map(col(_).desc) :+ xxhash64(tiebreak: _*).desc: _*)
      batch.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    } else {
      val dups = batch.groupBy(keys.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      if (dups.nonEmpty)
        throw new IllegalStateException(
          s"batch carries multiple rows for key ${dups(0).toSeq.init.mkString(",")} " +
            "and no orderBy was given — which version wins is undefined; " +
            "pass orderBy (a per-key total order) to resolve")
      batch
    }

  private def readMetaBuckets(spark: SparkSession, database: String,
      table: String): Option[Int] =
    if (!spark.catalog.tableExists(s"$database.${table}_upsert_meta")) None
    else Some(spark.table(qualified(database, s"${table}_upsert_meta"))
      .select("num_buckets").head().getInt(0))

  /** The `foreachBatch` function. `keys` identify a row; `orderBy`
    * orders versions WITHIN a batch (latest wins); rows whose
    * `tombstoneCol` is true delete their key.
    *
    * NULL tombstone values default to "keep" (`<=> true` below) — the
    * lenient reading for feeds where the delete flag is simply absent on
    * upserts. `strictTombstones = true` instead fails the batch loudly
    * on ANY NULL tombstone value (checked on the RAW batch, before
    * per-key reduction, so a malformed row cannot hide behind a newer
    * version of its key): in a CDC feed that always stamps the flag, a
    * NULL usually means a malformed row, and silently upserting it
    * corrupts current state. */
  def upsertBatch(table: String, keys: Seq[String],
      orderBy: Seq[String] = Nil, numBuckets: Int = 64,
      tombstoneCol: Option[String] = None,
      database: String = WarehouseSink.DefaultDatabase,
      strictTombstones: Boolean = false): (DataFrame, Long) => Unit = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(!strictTombstones || tombstoneCol.nonEmpty,
      "strictTombstones requires a tombstoneCol")
    (batch, _) =>
      WarehouseSink.requireIdent(database, "database")
      WarehouseSink.requireIdent(table, "destination table")
      val missing = (keys ++ orderBy ++ tombstoneCol).filterNot(batch.columns.contains)
      require(missing.isEmpty, s"batch lacks columns: ${missing.mkString(",")}")
      require(!batch.columns.contains(BucketCol),
        s"batch already carries reserved column $BucketCol")
      val spark = batch.sparkSession
      // one-shot batch execution, warehouseBatch's stateful-upstream
      // discipline: the plan must run exactly once under the harness
      val snap = batch.localCheckpoint()
      try {
        for (tc <- tombstoneCol if strictTombstones) {
          val bad = snap.filter(col(tc).isNull)
            .select(keys.map(col): _*).limit(1).collect()
          if (bad.nonEmpty)
            throw new IllegalStateException(
              s"batch carries a NULL $tc tombstone value (key " +
                s"${bad(0).toSeq.mkString(",")}) — strict tombstone mode treats " +
                "a NULL delete flag as a malformed CDC row; clean the feed or " +
                "disable strictTombstones to default NULL to keep")
        }
        val reduced = latestPerKey(snap, keys, orderBy)
        // NULL-safe: a NULL tombstone means "not a delete". A plain
        // `=== true` predicate is NULL for such rows, so BOTH filters
        // below would drop them — the row would neither upsert nor
        // delete (silent loss).
        val tomb = tombstoneCol.map(col(_) <=> true).getOrElse(lit(false))
        val upserts = reduced.filter(!tomb).drop(tombstoneCol.toSeq: _*)
          .withColumn(BucketCol, bucketOf(keys, numBuckets))
        val deletes = reduced.filter(tomb)
          .select(keys.map(col): _*)
        if (reduced.isEmpty) ()
        else {
          spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
          val q = qualified(database, table)
          readMetaBuckets(spark, database, table) match {
            case None =>
              // first delivery: create the bucketed table, then pin the
              // layout. Meta is written AFTER the table — a crash between
              // the two replays this batch against case Some below only
              // if meta landed; against None (a clean re-create) if not.
              // A PRE-EXISTING table without meta is only overwritable if
              // it carries our _kb partition layout (i.e. it IS the
              // crash-window half-delivery); anything else is a foreign
              // table and silently destroying it would lose user data —
              // fail loudly instead (StreamingDelivery's foreign-ledger
              // discipline).
              if (spark.catalog.tableExists(s"$database.$table") &&
                  !spark.catalog.listColumns(s"$database.$table").collect()
                    .exists(c => c.isPartition && c.name == BucketCol))
                throw new IllegalStateException(
                  s"$q exists but is not an upsert-delivered table (no " +
                    s"$BucketCol partition layout, no {table}_upsert_meta) — " +
                    "refusing to overwrite it; deliver to a fresh table")
              upserts.write.mode(SaveMode.Overwrite).format("parquet")
                .partitionBy(BucketCol).saveAsTable(q)
              import spark.implicits._
              Seq(numBuckets).toDF("num_buckets")
                .write.mode(SaveMode.Overwrite).format("parquet")
                .saveAsTable(qualified(database, s"${table}_upsert_meta"))
            case Some(stored) =>
              if (stored != numBuckets)
                throw new IllegalStateException(
                  s"$q was delivered with numBuckets=$stored but this writer " +
                    s"uses $numBuckets — the same key would hash to two buckets; " +
                    "use the stored bucket count")
              // touched buckets: from the FULL reduced batch (upserts +
              // deletes), a ≤numBuckets-sized driver list
              val touched = reduced.select(bucketOf(keys, numBuckets).as(BucketCol))
                .distinct().collect().map(_.getLong(0))
              val existing = spark.table(q)
                .filter(col(BucketCol).isin(touched: _*))
              val merged = graft.operators.MergeUpsert(existing, upserts, keys)
                .join(broadcast(deletes), keys, "left_anti")
              // materialize BEFORE overwriting what we read; dynamic
              // overwrite then replaces ONLY the touched bucket dirs
              val out = merged.localCheckpoint()
              try {
                val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
                try out.select(spark.table(q).columns.map(col): _*)
                  .write.mode(SaveMode.Overwrite).insertInto(q)
                finally prev match {
                  case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
                  case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
                }
                // dynamic overwrite only replaces partitions PRESENT in
                // `out`: a touched bucket whose every row was deleted has
                // no output rows, so its stale dir would survive — drop
                // those explicitly. Runs AFTER the insert (which cannot
                // touch them); a crash in between replays the batch and
                // re-derives the same empty set, so this converges.
                val outBuckets = out.select(col(BucketCol)).distinct()
                  .collect().map(_.getLong(0)).toSet
                touched.filterNot(outBuckets.contains).foreach { b =>
                  spark.sql(s"ALTER TABLE $q DROP IF EXISTS PARTITION ($BucketCol=$b)")
                }
                // a session holding a cached file listing for the
                // relation whose partitions were just replaced would
                // chase deleted part files on its next read. Refresh BOTH
                // sessions in play: under foreachBatch `spark` is the
                // stream's CLONED session, while the user reads the table
                // through the original (default) one — refreshing only
                // the clone leaves the user's cache stale (caught by the
                // e2e spec).
                spark.catalog.refreshTable(s"$database.$table")
                SparkSession.getDefaultSession.filter(_ ne spark)
                  .foreach(_.catalog.refreshTable(s"$database.$table"))
              } finally out.unpersist(blocking = false)
          }
        }
      } finally snap.unpersist(blocking = false)
  }

  /** Wire a streaming CDC frame into the warehouse with MERGE delivery. */
  def startUpsert(df: DataFrame, table: String, keys: Seq[String],
      checkpointDir: String, orderBy: Seq[String] = Nil, numBuckets: Int = 64,
      tombstoneCol: Option[String] = None,
      database: String = WarehouseSink.DefaultDatabase,
      trigger: Trigger = Trigger.AvailableNow(),
      outputMode: String = "append",
      strictTombstones: Boolean = false): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(upsertBatch(table, keys, orderBy, numBuckets, tombstoneCol,
        database, strictTombstones))
      .start()

  /** Compact an upsert-delivered table's buckets: every micro-batch
    * rewrite leaves one file set per touched bucket, so after N batches
    * a hot bucket holds O(N) small files and scans degrade (the classic
    * small-files problem). Compaction rewrites each bucket into a single
    * file: `repartition(numBuckets, _kb)` routes every bucket's rows to
    * exactly one task (a hash collision just means one task writes two
    * partition dirs — still one file each), and dynamic partition
    * overwrite swaps whole bucket dirs, so a crash mid-compaction leaves
    * each bucket either compacted or untouched — both complete, rerun to
    * finish. Run it out-of-band between deliveries (it takes no lock; a
    * CONCURRENT upsert batch could lose its rewrite to the compactor's
    * overwrite, the usual single-writer-per-table rule).
    */
  def compact(spark: SparkSession, table: String,
      database: String = WarehouseSink.DefaultDatabase): Unit = {
    WarehouseSink.requireIdent(database, "database")
    WarehouseSink.requireIdent(table, "destination table")
    val buckets = readMetaBuckets(spark, database, table).getOrElse(
      throw new IllegalStateException(
        s"${qualified(database, table)} has no {table}_upsert_meta — " +
          "only upsert-delivered tables can be compacted"))
    val q = qualified(database, table)
    val snap = spark.table(q)
      .repartition(buckets, col(BucketCol)).localCheckpoint()
    try {
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try snap.select(spark.table(q).columns.map(col): _*)
        .write.mode(SaveMode.Overwrite).insertInto(q)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      spark.catalog.refreshTable(s"$database.$table")
      SparkSession.getDefaultSession.filter(_ ne spark)
        .foreach(_.catalog.refreshTable(s"$database.$table"))
    } finally snap.unpersist(blocking = false)
  }

  /** Incrementally-maintained MATERIALIZED VIEW: an UNWINDOWED streaming
    * aggregation (running totals per key — the view no tumbling window
    * can express) delivered through the MERGE sink. Update-mode
    * aggregation re-emits each key's FULL current aggregate row whenever
    * a batch changes it — exactly an upsert stream — so the warehouse
    * table always equals the batch aggregate over everything ingested:
    * per batch, only CHANGED keys are written, and only their buckets
    * rewrite. `aggregated` must be the result of `groupBy(keys).agg(...)`
    * on a watermark-free stream (a watermarked agg would drop late rows
    * that a from-scratch batch query counts; state is O(keys), the
    * inherent floor for a keyed running total). Replay safety is the
    * merge sink's: re-delivering a batch re-writes the same values.
    */
  def startMaterializedAgg(aggregated: DataFrame, table: String,
      keys: Seq[String], checkpointDir: String, numBuckets: Int = 64,
      database: String = WarehouseSink.DefaultDatabase,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startUpsert(aggregated, table, keys, checkpointDir,
      numBuckets = numBuckets, database = database, trigger = trigger,
      outputMode = "update")
}
