package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The build-once / fingerprint-skip protocol shared by the persisted
  * family indexes (simhash pairs, media pHash pairs — and the shape
  * [[graft.operators.Embeddings.buildPqIndex]] pioneered for its
  * multi-table PQ artifacts): one `_pairs` artifact table plus a
  * `_meta` freshness tuple in the `graft_index` database, with the
  * crash-ordering invariant held in ONE place — meta is physically
  * invalidated FIRST and rewritten LAST, so an interrupted build can
  * only leave a stale-fingerprint state that the next ensure repairs
  * by rebuilding.
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

  /** Ensure `graft_index.<table>_pairs` is fresh for the freshness
    * tuple `meta` (name → value; compared column-for-column against
    * the stored `_meta` row), computing and persisting `compute` when
    * stale or `force`d. Returns the artifact's location path. */
  def ensure(s: SparkSession, table: String, meta: Seq[(String, Long)],
      force: Boolean)(compute: => DataFrame): String = {
    import org.apache.spark.sql.functions.col
    def loc(suffix: String): String =
      CoLocated.tableLocation(s, "graft_index", table + suffix).toString
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
      val stored: Row = s.read.parquet(loc("_meta"))
        .select(meta.map(m => col(m._1)): _*).head()
      val fs = new org.apache.hadoop.fs.Path(loc("_meta"))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      meta.indices.forall(i => stored.getLong(i) == meta(i)._2) &&
        fs.exists(new org.apache.hadoop.fs.Path(loc("_pairs")))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => false
      case _: java.util.NoSuchElementException => false
      case _: java.io.FileNotFoundException => false
    })
    if (!fresh) {
      CoLocated.clearTable(s, "graft_index", s"${table}_meta")
      CoLocated.replaceTable(compute, "graft_index", s"${table}_pairs")
      val schema = org.apache.spark.sql.types.StructType(meta.map { case (n, _) =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType,
          nullable = false) })
      CoLocated.replaceTable(
        s.createDataFrame(java.util.Arrays.asList(Row(meta.map(_._2): _*)), schema),
        "graft_index", s"${table}_meta")
    }
    loc("_pairs")
  }
}
