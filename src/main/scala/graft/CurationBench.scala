package graft

import org.apache.spark.sql.functions._

/** End-to-end timing for the one-call pretraining recipe:
  * `runMain graft.CurationBench <sfDir> [reps]`.
  *
  * Every stage of [[graft.pipeline.Curation.pretrainingCorpus]] is
  * individually oracled and benched in the catalog (t12/d08/d10 → d01/
  * d03/d05/d07 → p06), but the COMPOSED artifact — the thing a real
  * user runs — needs its own number: cross-stage recomputation hides
  * between stages, not inside them (the r6 curateSemantic class). Two
  * measurements per rep:
  *
  *  - `e2e`: one action over the full lexical+semantic recipe
  *    (scrub → cutSpans → quality/exact/near-dup → SemDeDup →
  *    leakage-safe splits), counted by split so the whole DAG executes;
  *  - a stage ladder (each stage materialized via count on a fresh
  *    registry) whose SUM bounds what the composition would cost if it
  *    re-ran every prefix — `e2e ≲ Σ stages` is the no-recomputation
  *    check, printed per rep for eyeball diffing.
  *
  * Prints one compact JSON line last (the Bench stdout-framing
  * contract). */
object CurationBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CurationBench <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.pipeline.Curation
    val docs = QueryHelpers.tbl(spark, dir, "documents")
    val vecs = QueryHelpers.tbl(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    var lastE2e = 0.0
    var lastStages = Map.empty[String, Double]
    (1 to reps).foreach { rep =>
      CacheRegistry.unpersistAll(blocking = true)
      val (tE2e, nOut) = timed {
        Curation.pretrainingCorpus(docs, Some(vecs))
          .groupBy(col("split")).count().collect().map(_.getLong(1)).sum
      }
      println(f"[curation] rep$rep e2e ${tE2e}%.2f s ($nOut docs out)")
      // stage ladder: each step runs on a FRESH registry so it measures
      // the true cold cost of its whole prefix — without the per-stage
      // reset, later stages hit plan-matched caches retained by earlier
      // ones and Σ stages understates the all-prefixes bound the e2e
      // number is checked against
      val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def stage(name: String)(f: => Long): Unit = {
        CacheRegistry.unpersistAll(blocking = true)
        val (t, _) = timed(f)
        stages += (name -> t)
      }
      val cleaned = Curation.cutSpans(Curation.scrub(docs), 8)
        .drop("n_span_tokens_removed")
      stage("scrub")(Curation.scrub(docs).count())
      stage("cutSpans")(cleaned.count())
      stage("curate(lexical)")(Curation.curate(cleaned).count())
      stage("curateSemantic")(Curation.curateSemantic(cleaned, vecs).count())
      stage("splitsLeakageSafe")(
        graft.pipeline.Splits.assignLeakageSafe(
          Curation.curateSemantic(cleaned, vecs).drop("split"), 0.3, 100L).count())
      println(stages.map { case (k, v) => f"$k=${v}%.2f" }
        .mkString(f"[curation] rep$rep stages (cumulative-prefix costs): ", " ", ""))
      lastE2e = tE2e
      lastStages = stages.toMap
    }
    val stagesJson = lastStages
      .map { case (k, v) => s"${util.Json.quote(k)}:${math.rint(v * 100) / 100}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"curation_e2e","unit":"sec","value":${math.rint(lastE2e * 100) / 100},"stages":$stagesJson,"sf":${util.Json.quote(dir)},"reps":$reps}""")
    spark.stop()
  }
}
