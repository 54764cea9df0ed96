package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the harness mains — Bench and
  * Verify MUST run under identical session semantics (a conf applied to
  * one but not the other is exactly the benchmark/correctness skew the
  * oracle discipline exists to prevent). */
object Sessions {
  def build(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // size the generated-class cache to the catalog: the default 100
      // entries thrash once ~70 queries x ~8 codegen stages have run in
      // one session, so late queries (and d05's per-round CC loop)
      // recompile identical code — measured as the residual isolated-
      // pass inflation after the r6 heap fix. A resident analytics
      // session should hold its whole catalog's generated classes.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
