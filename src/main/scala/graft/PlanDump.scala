package graft

/** Formatted-plan dump for one catalog query:
  * `runMain graft.PlanDump <query> <sfDir>`.
  * Prints `explain("formatted")` of the exact DataFrame the catalog
  * serves — the instrument behind the probe discipline's "warm reps +
  * executedPlan" adjudications (PROBES_r11.md and successors). Read the
  * output for: Exchange count, partial-aggregation shape
  * (HashAggregate keys/functions), PushedFilters/ReadSchema on scans,
  * and WholeStageCodegen span boundaries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <queryName> <sfDir>")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    SparkEntry.queries(args(0))(spark, args(1)).explain("formatted")
    spark.stop()
  }
}

/** Bulk form of [[PlanDump]] for the optimization-round evidence files:
  * `runMain graft.PlanDumpAll <sfDir> <outDir> [suffix]` writes
  * `outDir/<query><suffix>.txt` (default suffix `_before`) with the
  * formatted plan of every catalog query — one session, so builder
  * side effects and trainer runs are paid once instead of per-query
  * JVM. A query whose CONSTRUCTION throws still gets a file (the
  * exception text), so the sweep is total. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpAll <sfDir> <outDir> [suffix]")
    val (sfDir, outDir) = (args(0), args(1))
    val suffix = if (args.length > 2) args(2) else "_before"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').map(_.trim).toSet) else None
    new java.io.File(outDir).mkdirs()
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
        val text =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          catch { case e: Throwable =>
            s"CONSTRUCTION FAILED: ${e.getClass.getName}: ${e.getMessage}" }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), text)
      }
    spark.stop()
  }
}
