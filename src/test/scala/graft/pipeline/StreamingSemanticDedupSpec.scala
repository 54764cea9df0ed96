package graft.pipeline

import graft.SparkSpec
import graft.operators.Embeddings
import java.nio.file.Files

/** Streaming semantic dedup: the delivered set must equal the batch
  * [[Embeddings.semanticGreedy]] kept set on ANY chunking of an
  * ascending-id corpus — the kernel is shared, this spec pins the
  * wiring (history probe, own-batch exclusion, ledgers, replay).
  *
  * Fixture geometry (16 dims = 4 bands × 4 sign planes), built from an
  * orthonormal triple u1 ⊥ z1 ⊥ z2 inside the all-signs structure:
  *  - v2 = v1 exactly            → in-batch drop (by 1, cos 1.0)
  *  - v5 = 0.6·u1 + 0.8·z1      → cross-batch drop (by 1, cos 0.6;
  *                                 shares band 0's all-positive code)
  *  - v8 = 0.6·v5 + 0.8·z2      → the TRANSITIVE witness: cos(8,5)=0.6
  *                                 ≥ 0.45 but cos(8,1)=0.36 < 0.45, so
  *                                 it is dropped by 5 — a vector that
  *                                 was itself dropped; leaking history
  *                                 to survivors only would keep it
  *  - v4 (alternating signs), v6 = −u1, v9 (half/half) → kept (band
  *    collisions exist for 9 but every verify fails)
  */
class StreamingSemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val db = "stream_sem_test"

  private def scale(a: Array[Double], s: Double) = a.map(_ * s)
  private def add(a: Array[Double], b: Array[Double]) =
    a.zip(b).map { case (x, y) => x + y }
  private val u1 = Array.fill(16)(0.25)
  private val z1 = Array.tabulate(16)(i => if ((i / 4) % 2 == 0) 0.25 else -0.25)
  private val z2 = Array.tabulate(16)(i => (i / 4: @unchecked) match {
    case 0 => 0.25; case 1 => -0.25; case 2 => -0.25; case 3 => 0.25
  })
  private val v5 = add(scale(u1, 0.6), scale(z1, 0.8))
  private val corpus: Seq[(Long, Array[Double])] = Seq(
    1L -> u1,
    2L -> u1,
    4L -> Array.tabulate(16)(i => if (i % 2 == 0) 0.25 else -0.25),
    5L -> v5,
    6L -> scale(u1, -1.0),
    8L -> add(scale(v5, 0.6), scale(z2, 0.8)),
    9L -> Array.tabulate(16)(i => if (i < 8) 0.25 else -0.25))

  private lazy val batchVerdict: Map[Long, (Boolean, Option[Long])] = {
    val df = corpus.toDF("vec_id", "v")
    Embeddings.semanticGreedy(df, threshold = 0.45).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
  }

  test("batch kernel: planted geometry drops 2/5/8, keeps 1/4/6/9, chains through dropped 5") {
    assert(batchVerdict(1L) == ((true, None)))
    assert(batchVerdict(4L) == ((true, None)))
    assert(batchVerdict(6L) == ((true, None)))
    assert(batchVerdict(9L) == ((true, None)))
    assert(batchVerdict(2L) == ((false, Some(1L))))
    assert(batchVerdict(5L) == ((false, Some(1L))))
    // the chain: 8 is near 5 (cos 0.6) but NOT near 1 (cos 0.36) — its
    // dropper is a vector that was itself dropped
    assert(batchVerdict(8L) == ((false, Some(5L))))
  }

  private def mkSource: String = {
    val dir = Files.createTempDirectory("ssdsrc").toString
    def w(ids: Long*): Unit = corpus.filter(c => ids.contains(c._1))
      .toDF("vec_id", "v").coalesce(1).write.mode("append").parquet(dir)
    w(1L, 2L, 4L)   // batch 0: in-batch exact dup
    w(5L, 6L)       // batch 1: cross-batch near-dup vs history
    w(8L, 9L)       // batch 2: transitive chain through dropped 5
    dir
  }

  private def run(srcDir: String, table: String): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = StreamingSemanticDedup.start(
      src, table, Files.createTempDirectory("ssdcp").toString, database = db)
    q.awaitTermination()
  }

  test("3-chunk streaming replay delivers exactly the batch kernel's kept set") {
    val srcDir = mkSource
    run(srcDir, "vecs_deduped")
    val ids = spark.table(s"`$db`.`vecs_deduped`")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val expect = batchVerdict.collect { case (id, (true, _)) => id }.toSeq.sorted
    assert(ids == expect, s"streaming $ids != batch $expect")
    // the codes history holds EVERY seen vector — survivors and dropped —
    // one row per band
    assert(spark.table(s"`$db`.`vecs_deduped_codes`").count() ==
      corpus.size * 4L)
  }

  test("replay with a fresh checkpoint is a no-op (both ledgers short-circuit)") {
    val srcDir = mkSource
    run(srcDir, "vecs_replayed")
    val before = spark.table(s"`$db`.`vecs_replayed`").count()
    val codesBefore = spark.table(s"`$db`.`vecs_replayed_codes`").count()
    run(srcDir, "vecs_replayed")
    assert(spark.table(s"`$db`.`vecs_replayed`").count() == before)
    assert(spark.table(s"`$db`.`vecs_replayed_codes`").count() == codesBefore)
  }

  test("checkpoint reset over a grown source fails loudly via the input-rows stamp") {
    val srcDir = mkSource
    run(srcDir, "vecs_grown")
    // grow the FIRST file's batch: a fresh checkpoint re-batches with one
    // more file in batch 0 than the ledger recorded
    Seq(90L -> Array.fill(16)(0.1)).toDF("vec_id", "v")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir) // no maxFilesPerTrigger: everything lands in batch 0
    val q = StreamingSemanticDedup.start(
      src, "vecs_grown", Files.createTempDirectory("ssdcp2").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("checkpoint and ledger")),
      s"wrong failure: ${causeMessages(e)}")
  }

  test("duplicate vec_ids in a batch fail loudly (equal ids evade the drop rule)") {
    val dir = Files.createTempDirectory("ssddup").toString
    Seq(1L -> u1, 1L -> u1).toDF("vec_id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = StreamingSemanticDedup.start(
      src, "vecs_dup", Files.createTempDirectory("ssdcp4").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("duplicate vec_ids")),
      s"wrong failure: ${causeMessages(e)}")
  }

  test("a non-monotone batch (id at or below the history) fails loudly") {
    val dir = Files.createTempDirectory("ssdmono").toString
    Seq(5L -> u1, 6L -> v5).toDF("vec_id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val cp = Files.createTempDirectory("ssdcp5").toString
    val run1 = StreamingSemanticDedup.start(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir),
      "vecs_mono", cp, database = db)
    run1.awaitTermination()
    // second file re-sends id 5 (and adds a genuinely new 7)
    Seq(5L -> u1, 7L -> z2).toDF("vec_id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val run2 = StreamingSemanticDedup.start(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir),
      "vecs_mono", cp, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run2.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("must be monotone")),
      s"wrong failure: ${causeMessages(e)}")
  }

  test("a zero-survivor batch stamps completion: replay short-circuits and the grown-source guard covers it") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    val fn = StreamingSemanticDedup.dedupBatch("vecs_zero", database = db)
    fn(Seq(1L -> u1).toDF("vec_id", "v"), 0L)
    fn(Seq(2L -> u1).toDF("vec_id", "v"), 1L) // exact dup of 1 → 0 survivors
    assert(spark.table(s"`$db`.`vecs_zero`")
      .select("vec_id").as[Long].collect().toSeq == Seq(1L))
    assert(spark.table(s"`$db`.`vecs_zero_done`").count() == 2,
      "every batch — zero-survivor included — must carry a completion stamp")
    // fresh-checkpoint replay: both batches short-circuit on the stamp;
    // a re-run would append a SECOND stamp row per batch
    fn(Seq(1L -> u1).toDF("vec_id", "v"), 0L)
    fn(Seq(2L -> u1).toDF("vec_id", "v"), 1L)
    assert(spark.table(s"`$db`.`vecs_zero`").count() == 1)
    assert(spark.table(s"`$db`.`vecs_zero_done`").count() == 2)
    assert(spark.table(s"`$db`.`vecs_zero_codes`").count() == 2 * 4)
    // a checkpoint reset that re-batches the ZERO-survivor batch now
    // fails loudly — before the stamp, this batch silently re-ran
    val e = intercept[IllegalStateException] {
      fn(Seq(2L -> u1, 3L -> z2).toDF("vec_id", "v"), 1L)
    }
    assert(e.getMessage.contains("checkpoint and ledger"))
  }

  test("a foreign codes table fails with a clear error") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    // carries a ledger column (so the generic foreign-ledger guard in
    // deliveredRowCount passes) but not the codes schema — the
    // codes-specific guard must catch it
    Seq((1L, "x", 0L)).toDF("vec_id", "junk", "_batch_id").write.mode("overwrite")
      .saveAsTable(s"`$db`.`vecs_foreign_codes`")
    val srcDir = mkSource
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = StreamingSemanticDedup.start(
      src, "vecs_foreign", Files.createTempDirectory("ssdcp3").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("not a semantic-dedup codes table")),
      s"wrong failure: ${causeMessages(e)}")
  }
}
