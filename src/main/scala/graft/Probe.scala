package graft

/** One-query timing probe: `runMain graft.Probe <query> <sfDir> [reps]`.
  * Runs the named catalog query `reps` times in a fresh session (same
  * noop-write discipline as [[Bench]] so the measured plan is the full
  * plan) and prints per-rep seconds plus cumulative GC ms. This is the
  * same-JVM A/B instrument the round verdicts use to separate real
  * regressions from bench-harness artifacts — first rep is cold
  * (includes parquet first-touch and codegen), later reps are warm.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probe <queryName> <sfDir> [reps]")
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = SparkEntry.queries(name)
    def gcMs() = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    (1 to reps).foreach { i =>
      CacheRegistry.unpersistAll(blocking = true)
      val g0 = gcMs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name rep$i%d ${sec}%.3f s (gc ${gcMs() - g0} ms)")
    }
    spark.stop()
  }
}
