package graft

/** Measurement probe for the derived-cells kernels — the instrument
  * behind PROBES_r17's recall/attribution tables, kept so future
  * rounds re-measure instead of re-deriving. Modes:
  *
  *   stages <sfDir> [reps]   — m10 stage attribution (prolog / trainer /
  *                             map side / shuffle+kernel / the r16
  *                             form's distinct, timed in isolation)
  *   m10recall <sfDir>       — |m10 ∩ m05| / |m05| computed
  *                             distributively (anti-join count — works
  *                             at tiers where collect() can't hold the
  *                             exact pair set)
  *   d07recall <sfDir> <k>   — flat-k vs two-level ceil-sqrt pair
  *                             recall against the exact cosine near-dup
  *                             relation, plus the v23 top-2 probe
  *                             variant
  */
object ProbeCells {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "stages"
    val sfDir = if (args.length > 1) args(1) else "/root/repo/target/sfdata/sf3"
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try mode match {
      case "stages" => stages(spark, sfDir, if (args.length > 2) args(2).toInt else 2)
      case "m10recall" => m10Recall(spark, sfDir)
      case "d07recall" => d07Recall(spark, sfDir, if (args.length > 2) args(2).toInt else 16)
    } finally spark.stop()
  }

  private def m10Recall(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = CacheRegistry.retain("media.phash", Multimodal.phashSigsOf(docs))
    val flat = CacheRegistry.retain("probe.flatpairs",
      Multimodal.phashKernel(Multimodal.phashBandRows(sigs)))
    val cell = CacheRegistry.retain("probe.cellpairs", Multimodal.phashPairsViaCells(docs))
    val nFlat = flat.count()
    val nCell = cell.count()
    val invented = cell.join(flat, Seq("doc_a", "doc_b"), "left_anti").count()
    println(f"[m10recall] $sfDir flat=$nFlat cell=$nCell invented=$invented " +
      f"recall=${(nCell - invented).toDouble / nFlat}%.4f")
    CacheRegistry.unpersistAll(blocking = true)
  }

  private def d07Recall(spark: org.apache.spark.sql.SparkSession, sfDir: String, k: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Embeddings
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
    val n = vecs.count()
    val truth = CacheRegistry.retain("probe.truth",
      Embeddings.cosineNearDupPairs(vecs, 0.45, maxRows = 1000000L)
        .select(col("doc_a"), col("doc_b")))
    val nTrue = truth.count()
    val kc = math.ceil(math.sqrt(k.toDouble)).toInt
    val kf = (k + kc - 1) / kc
    def recallOf(m: Embeddings.CellModel): Double = {
      val asg = Embeddings.assignCells(vecs, m)
      val kept = truth
        .join(asg.withColumnRenamed("vec_id", "doc_a").withColumnRenamed("cell", "ca"), "doc_a")
        .join(asg.withColumnRenamed("vec_id", "doc_b").withColumnRenamed("cell", "cb"), "doc_b")
        .filter(col("ca") === col("cb")).count()
      kept.toDouble / nTrue
    }
    val rFlat = recallOf(Embeddings.cellModel(vecs, k, iters = 3, knownN = n))
    val two = Embeddings.twoLevelModel(vecs, kc, kf, iters = 3, knownN = n)
    val rTwo = recallOf(two)
    // v23's knob: pair kept iff the top-2 probe sets intersect
    val bc = spark.sparkContext.broadcast(two)
    import spark.implicits._
    val probed = vecs.as[(Long, Array[Double])].flatMap { case (id, v) =>
      bc.value.probe(v, Embeddings.fpNorm(v), 2).iterator.map(c => (id, c))
    }.toDF("vid", "cell")
    val keptP2 = truth
      .join(probed.withColumnRenamed("vid", "doc_a").withColumnRenamed("cell", "ca"), "doc_a")
      .join(probed.withColumnRenamed("vid", "doc_b").withColumnRenamed("cell", "cb"), "doc_b")
      .filter(col("ca") === col("cb"))
      .select(col("doc_a"), col("doc_b")).distinct().count()
    println(f"[d07recall] $sfDir n=$n truePairs=$nTrue k=$k (two-level ${kc}x$kf) " +
      f"flat=$rFlat%.4f two=$rTwo%.4f ratio=${rTwo / rFlat}%.3f " +
      f"two-probe2=${keptP2.toDouble / nTrue}%.4f")
    CacheRegistry.unpersistAll(blocking = true)
  }

  private def stages(spark: org.apache.spark.sql.SparkSession, sfDir: String, reps: Int): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Multimodal, Embeddings}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m10probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep")
      CacheRegistry.unpersistAll(blocking = true)
      val sf = CacheRegistry.retain("media.cellsigs", Multimodal.phashSigFeats(docs))
      val nReps = time("sigfeats cache+count")(sf.count())
      val hottest = time("hottest-band agg")(
        Option(Multimodal.phashBandRows(sf.select($"doc_id", $"h0", $"h1"))
          .toDF("bi", "bv", "doc_id", "h0", "h1")
          .groupBy($"bi", $"bv").count().agg(max($"count")).head().get(0))
          .fold(0L)(_.asInstanceOf[Long]))
      val k = Multimodal.mediaCells(hottest, Multimodal.MaxBandBucket)
      println(s"[m10probe] nReps=$nReps hottest=$hottest cells=$k")
      time("cellModel train")(Embeddings.cellModel(
        sf.select($"doc_id".as("vec_id"), $"v"), k, 3, Embeddings.TrainSampleTarget, nReps))
      time("full phashPairsViaCells (catalog form, noop write)")(
        Multimodal.phashPairsViaCells(docs).write.format("noop").mode("overwrite").save())
    }
  }
}
