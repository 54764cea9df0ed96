package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

/** The build-once / fingerprint-skip protocol shared by the persisted
  * family indexes (simhash pairs, media pHash pairs — and the shape
  * [[graft.operators.Embeddings.buildPqIndex]] pioneered for its
  * multi-table PQ artifacts): one `_pairs` artifact table plus a
  * `_meta` freshness tuple in the `graft_index` database — and, since
  * r13, optional AUX tables (the per-doc signature history `_sigs`)
  * written in the same build so the index can be APPENDED to without a
  * full rebuild — with the crash-ordering invariant held in ONE place:
  * meta is physically invalidated FIRST and rewritten LAST, so an
  * interrupted build or append can only leave a stale-fingerprint
  * state that the next ensure repairs by rebuilding.
  *
  * Freshness is decided from the warehouse LOCATION, not the session
  * catalog, so the skip works across JVMs (the in-memory catalog dies
  * with the process while the files survive).
  *
  * Concurrency contract: SINGLE WRITER per (warehouse, table). A
  * rebuild physically deletes and rewrites the artifact directory, so
  * a concurrent reader in another JVM can observe a mid-rewrite
  * listing, and two concurrent ensures can interleave their
  * clear/write sequences. This matches the reference's operating model
  * (one scheduler owns the warehouse) and buildPqIndex's existing
  * contract; serialize external writers (e.g. parallel sweep
  * processes) at the orchestration layer.
  */
object PersistedIndex {

  val Database = "graft_index"

  /** Managed location of `graft_index.<table><suffix>` as a string path
    * — the cross-JVM address of an index artifact. */
  def location(s: SparkSession, table: String, suffix: String): String =
    CoLocated.tableLocation(s, Database, table + suffix).toString

  /** Ensure `graft_index.<table>_pairs` is fresh for the freshness
    * tuple `meta` (name → value; compared column-for-column against
    * the stored `_meta` row), computing and persisting `compute` when
    * stale or `force`d. Returns the artifact's location path. */
  def ensure(s: SparkSession, table: String, meta: Seq[(String, Long)],
      force: Boolean)(compute: => DataFrame): String =
    ensureWith(s, table, meta, force, Nil)(compute)

  /** [[ensure]] plus aux tables (`suffix` → frame thunk, e.g. `"_sigs"`
    * → per-doc signatures) written between the pairs table and the meta
    * stamp. A fresh index requires EVERY aux table present, so an
    * artifact persisted by a pre-aux version fails the probe and
    * rebuilds under the new layout — the automatic migration path
    * (appenders, by contrast, refuse old layouts loudly; see
    * [[graft.operators.Embeddings.appendToPqIndex]]'s rationale). */
  def ensureWith(s: SparkSession, table: String, meta: Seq[(String, Long)],
      force: Boolean, aux: Seq[(String, () => DataFrame)],
      auxPartition: Map[String, String] = Map.empty)(
      compute: => DataFrame): String = {
    import org.apache.spark.sql.functions.col
    // The catch below is the "artifact absent or unreadable-as-ours"
    // decision, and a stale verdict is DESTRUCTIVE (the rebuild clears
    // and rewrites the directory) — so only the expected miss shapes may
    // map to stale: a missing/empty _meta (AnalysisException covers both
    // the absent path and a column-set mismatch from an older protocol
    // version; head() on a zero-row _meta raises NoSuchElementException)
    // or a vanished file between listing and read. A transient
    // filesystem fault (IOException from fs.exists or the read) must
    // PROPAGATE: rebuilding on a hiccup would be indistinguishable from
    // a real invalidation in logs and re-pays the full build for nothing.
    val fresh = !force && (try {
      val stored: Row = s.read.parquet(location(s, table, "_meta"))
        .select(meta.map(m => col(m._1)): _*).head()
      val fs = new org.apache.hadoop.fs.Path(location(s, table, "_meta"))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      meta.indices.forall(i => stored.getLong(i) == meta(i)._2) &&
        ("_pairs" +: aux.map(_._1)).forall(sfx =>
          fs.exists(new org.apache.hadoop.fs.Path(location(s, table, sfx))))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => false
      case _: java.util.NoSuchElementException => false
      case _: java.io.FileNotFoundException => false
      // the vanished-between-listing-and-read race surfaces driver-side
      // as FileNotFoundException but EXECUTOR-side wrapped in a
      // SparkException — walk the cause chain so that shape also maps
      // to stale, while other wrapped faults still propagate
      case e: org.apache.spark.SparkException
          if Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null)
            .take(8).exists(_.isInstanceOf[java.io.FileNotFoundException]) => false
    })
    if (!fresh) {
      CoLocated.clearTable(s, Database, s"${table}_meta")
      CoLocated.replaceTable(compute, Database, s"${table}_pairs")
      aux.foreach { case (sfx, f) =>
        auxPartition.get(sfx) match {
          // partitioned aux tables are PATH-addressed (no catalog
          // entry): saveAsTable's dynamic-partition commit pays ~2 s of
          // per-partition catalog sync per write, pure overhead for an
          // artifact every reader addresses by location anyway. The
          // dropAndClear still runs (via clearTable) so a pre-partition
          // layout's catalog entry and files cannot shadow the new one.
          case Some(pc) =>
            CoLocated.clearTable(s, Database, table + sfx)
            f().write.mode(SaveMode.Overwrite).partitionBy(pc)
              .parquet(location(s, table, sfx))
          case None => CoLocated.replaceTable(f(), Database, table + sfx)
        } }
      stamp(s, table, meta)
    }
    location(s, table, "_pairs")
  }

  /** Physically invalidate `_meta` BEFORE an append mutates the
    * artifact tables — the buildPqIndex crash discipline: if the append
    * dies mid-write, the fingerprint is already invalid and the next
    * ensure rebuilds instead of fingerprint-matching a half-appended
    * table (append-then-poison would leave exactly that window). The
    * sentinel row keeps the stored schema (same columns, value -1) so a
    * later freshness probe reads it and mismatches rather than erroring. */
  def poison(s: SparkSession, table: String, metaCols: Seq[String]): Unit =
    stamp(s, table, metaCols.map(_ -> -1L))

  /** Write the `_meta` freshness tuple — the LAST step of any build or
    * append. */
  def stamp(s: SparkSession, table: String, meta: Seq[(String, Long)]): Unit = {
    val schema = org.apache.spark.sql.types.StructType(meta.map { case (n, _) =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType,
        nullable = false) })
    CoLocated.replaceTable(
      s.createDataFrame(java.util.Arrays.asList(Row(meta.map(_._2): _*)), schema),
      Database, s"${table}_meta")
  }

  /** Append rows to an existing plain artifact table WITHOUT touching
    * its resident files (each append adds new files only — the
    * incremental-maintenance invariant the append specs pin
    * byte-for-byte). Catalog-append caveat shared with
    * [[graft.plans.CoLocated.appendBucketed]]: the table must exist in
    * THIS session's catalog (builds and appends share a session, or a
    * persistent metastore). */
  def appendTable(df: DataFrame, table: String, suffix: String): Unit =
    df.write.mode(SaveMode.Append).format("parquet")
      .saveAsTable(s"`$Database`.`$table$suffix`")

  /** [[appendTable]] for a hive-partitioned PATH-addressed aux table
    * (the band-keyed `_sigs` layout) — new files land inside the
    * delta's key directories; resident files stay byte-identical. Path
    * append, not catalog append: see the ensureWith aux writer. */
  def appendTablePartitioned(df: DataFrame, table: String, suffix: String,
      partCol: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy(partCol)
      .parquet(location(df.sparkSession, table, suffix))
}
