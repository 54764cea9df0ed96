package graft

/** Warm per-query timer for optimization A/B probes:
  * `runMain graft.TimeQueries <sfDir> <name,name,...> [reps] [warmups]`.
  *
  * Times each named catalog query through the noop sink (the Bench
  * methodology) after `warmups` untimed runs, printing every rep and the
  * median. Unlike Bench this neither writes artifacts nor sweeps the
  * catalog, so a hypothesis ("this join should broadcast") gets a
  * number in seconds, warm, in under a minute — combine with
  * `SPARK_GRAFT_CONF` to A/B a session conf on the same build. Probe
  * instrument only: committed numbers always come from Bench.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <names> [reps] [warmups]")
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val warmups = if (args.length > 3) args(3).toInt else 1
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"timequeries: $name")
      (0 until warmups).foreach(_ => once(name))
      val ts = (0 until reps).map(_ => once(name))
      val med = ts.sorted.apply(ts.length / 2)
      println(f"TIME $name%-34s median=$med%8.3f s  reps=${ts.map(t => f"$t%.3f").mkString(",")}")
      // SPARK_GRAFT_EXECUTED_PLAN=1: print the POST-execution adaptive
      // plan (final AQE shape — ReusedQueryStage/AQEShuffleRead visible,
      // unlike explain() on an unexecuted frame)
      if (sys.env.get("SPARK_GRAFT_EXECUTED_PLAN").contains("1")) {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(s"==== EXECUTED PLAN $name ====")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
