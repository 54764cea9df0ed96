package graft

/** The full query catalog: every implemented operator surfaces here as a
  * named query (SURVEY.md §2 inventory). Assembled from per-domain modules.
  */
object Catalog {
  def all: Seq[QueryDef] =
    operators.Relational.entries ++
      operators.Events.entries ++
      operators.Documents.entries ++
      operators.Embeddings.entries ++
      operators.Multimodal.entries

  lazy val byName: Map[String, QueryDef] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in catalog")
    m
  }

  /** Register every test table as a temp view so users can hit the same
    * data through plain `spark.sql(...)` (plus the engine's SQL functions
    * via [[graft.functions.ParseHumanInterval.install]]). The events view
    * is pre-converted to microsecond timestamps like `eventsTbl`. */
  def registerViews(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      val p = s"$dir/$t.parquet"
      if (new java.io.File(p).exists())
        spark.read.parquet(p).createOrReplaceTempView(t)
    }
    if (new java.io.File(s"$dir/events.parquet").exists())
      QueryHelpers.eventsTbl(spark, dir).createOrReplaceTempView("events")
  }
}
