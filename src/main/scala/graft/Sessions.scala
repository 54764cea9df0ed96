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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
