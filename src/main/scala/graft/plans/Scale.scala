package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB regime: bucketing to pre-pay a
  * join shuffle once at write time, and salting to split hot keys that
  * AQE's skew handling can't reach (e.g. a skewed aggregation key).
  */
object CoLocated {

  /** Write a table bucketed+sorted on its join key. Two tables bucketed
    * on the same key with the same bucket count join WITHOUT a shuffle
    * (and without a sort, since buckets are pre-sorted): the exchange is
    * paid once at load time instead of on every join.
    *
    * Idempotent ACROSS JVMs, not just within one session: a managed-table
    * directory left by an earlier process survives in the warehouse while
    * a fresh session's in-memory catalog has no entry for it, so
    * `SaveMode.Overwrite` alone cannot drop it and the CTAS throws
    * `LOCATION_ALREADY_EXISTS`. Drop the catalog entry (if known) AND
    * remove any stale location before writing — rebuilding an index into
    * the same name must always succeed (pinned in EmbeddingsSpec). */
  def writeBucketed(df: DataFrame, database: String, table: String,
      key: String, buckets: Int): String = {
    dropAndClear(df.sparkSession, database, table)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(s"`$database`.`$table`")
    s"$database.$table"
  }

  /** Full-replace a plain (unbucketed) managed table with the same
    * cross-JVM idempotence discipline as [[writeBucketed]] — for
    * model-sized artifacts (codebooks, metadata rows) that accompany a
    * bucketed index and need no layout guarantee of their own. */
  def replaceTable(df: DataFrame, database: String, table: String): String = {
    dropAndClear(df.sparkSession, database, table)
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"`$database`.`$table`")
    s"$database.$table"
  }

  /** Resolve the managed location of `database.table` (creating the
    * database entry if this JVM has not seen it yet). Warehouse data
    * OUTLIVES the in-memory catalog — a fresh JVM finds the files but no
    * table entries — so cross-JVM consumers (e.g. the PQ index freshness
    * probe) address artifacts by location, not by catalog name. */
  def tableLocation(spark: SparkSession, database: String,
      table: String): org.apache.hadoop.fs.Path = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    new org.apache.hadoop.fs.Path(
      spark.catalog.getDatabase(database).locationUri, table.toLowerCase)
  }

  /** Drop the catalog entry AND delete the managed location — the public
    * face of the replace prologue, for callers that must invalidate an
    * artifact before starting a multi-table rewrite. */
  def clearTable(spark: SparkSession, database: String, table: String): Unit =
    dropAndClear(spark, database, table)

  /** The shared prologue: drop the catalog entry AND any stale managed
    * location a previous JVM left behind (SaveMode.Overwrite alone throws
    * LOCATION_ALREADY_EXISTS on the orphaned directory — the r4 failure
    * mode, pinned in EmbeddingsSpec). */
  private def dropAndClear(spark: SparkSession, database: String, table: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    spark.sql(s"DROP TABLE IF EXISTS `$database`.`$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.catalog.getDatabase(database).locationUri, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Append rows into an existing bucketed table with the SAME bucket
    * spec: new rows hash into their buckets independently of the resident
    * data (each append adds one sorted file per non-empty bucket), so the
    * table keeps satisfying ClusteredDistribution on `key` — readers stay
    * Exchange-free — without rewriting the resident files. This is the
    * incremental-maintenance path for [[graft.operators.Embeddings
    * .buildIndex]]-style layouts: the alternative, rebuild-on-ingest,
    * rewrites the full corpus for every delta. */
  def appendBucketed(df: DataFrame, database: String, table: String,
      key: String, buckets: Int): String = {
    df.write.mode(SaveMode.Append)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(s"`$database`.`$table`")
    s"$database.$table"
  }
}

object Salting {

  /** Skew-safe aggregation: count/sum-like partial aggregation over
    * (key, salt) first — hot keys spread across `buckets` reducers — then
    * the final (cheap, one row per (key, salt)) re-aggregation by key.
    * `uniqueCol` supplies deterministic row identity for the salt. */
  def saltedCounts(df: DataFrame, key: String, uniqueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    df.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("n"))
  }

  /** Skew-safe inner equi-join: every `big` row gets a deterministic salt
    * from `uniqueCol`; `small` is replicated once per salt bucket, so a
    * hot key's rows land on `buckets` different reducers instead of one.
    * Results are identical to `big.join(small, key)` — only the
    * partitioning changes. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      uniqueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val salted = big.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(buckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
