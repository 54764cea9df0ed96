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
