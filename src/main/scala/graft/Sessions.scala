package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the harness mains — Bench and
  * Verify MUST run under identical session semantics (a conf applied to
  * one but not the other is exactly the benchmark/correctness skew the
  * oracle discipline exists to prevent). */
object Sessions {
  def build(cpus: String): SparkSession =
    finish(shared(SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus))

  /** Daemon-side session for [[Main]]'s no-active-session fallback.
    * Unlike [[build]] this NEVER forces a master: a `spark-submit
    * --master yarn|k8s://…` launch sets `spark.master` before `main`
    * runs, and forcing `local[…]` here would silently demote the
    * cluster launch to driver-local execution. Only a bare
    * `java -cp … graft.Main` (no master anywhere) gets a local master
    * sized from the actual machine — `SPARK_GRAFT_CPUS` must be a
    * positive int when set because it also sizes
    * `spark.sql.shuffle.partitions`, which rejects non-int values. */
  def adopt(cpusEnv: Option[String]): SparkSession = {
    val submitted = sys.props.get("spark.master").exists(_.nonEmpty)
    val cpus = cpusEnv.map { c =>
      require(c.forall(_.isDigit) && c.nonEmpty && c.toInt >= 1,
        s"SPARK_GRAFT_CPUS must be a positive integer (got '$c'); " +
          "it sizes spark.sql.shuffle.partitions")
      c
    }.getOrElse(Runtime.getRuntime.availableProcessors().toString)
    val base = SparkSession.builder()
    finish(shared(if (submitted) base else base.master(s"local[$cpus]"),
      shufflePartitions = cpus))
  }

  private def shared(b: SparkSession.Builder,
      shufflePartitions: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions)
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

  private def finish(b: SparkSession.Builder): SparkSession = {
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
