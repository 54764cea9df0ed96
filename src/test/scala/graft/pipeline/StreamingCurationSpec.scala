package graft.pipeline

import graft.SparkSpec
import graft.sinks.StreamingDelivery
import java.nio.file.Files

/** Streaming curation: arriving documents are quality-gated, deduped
  * within each micro-batch AND against the already-ingested corpus (the
  * warehouse table is the dedup state — no streaming state store), and
  * delivered idempotently under the `_batch_id` ledger. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val db = "stream_cur_test"

  private val goodA = "the quick brown fox jumps over the lazy dog"
  private val goodB = "alpha beta gamma delta epsilon zeta"
  private val goodC = "one two three four five six"

  private def mkSource: String = {
    val dir = Files.createTempDirectory("scsrc").toString
    // file 1 → batch 0: a good doc, its exact duplicate, a too-short doc
    Seq((1L, goodA), (2L, goodA), (3L, "short"), (4L, goodB))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    // file 2 → batch 1: a cross-batch duplicate of doc 1, and a fresh doc
    Seq((5L, goodA), (6L, goodC))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dir)
    dir
  }

  private def run(srcDir: String, table: String): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = StreamingCuration.start(
      src, table, Files.createTempDirectory("sccp").toString, database = db)
    q.awaitTermination()
  }

  test("streamed corpus lands curated: quality-gated, dedup within and across batches") {
    val srcDir = mkSource
    run(srcDir, "docs_curated")
    val tbl = spark.table(s"`$db`.`docs_curated`")
    val ids = tbl.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 4L, 6L),
      s"expected min-id survivors of the three distinct quality texts, got $ids")
    assert(tbl.select("fingerprint").distinct().count() == 3L,
      "fingerprints are unique across the delivered corpus")
    // the within-batch duplicate (doc 2) and the cross-batch duplicate
    // (doc 5) are both absent; the quality-gate victim (doc 3) too
    assert(!ids.contains(2L) && !ids.contains(5L) && !ids.contains(3L))
  }

  // --- near-dup parity fixture: 20-token docs where each interior
  // single-token edit kills exactly 3 shingles, so Jaccard is dialable:
  // 1 edit apart = 15/21 ≈ 0.71, 2 = 12/24 = 0.5, 3 = 9/27 = 0.33 < 0.5.
  private def tokens(prefix: String): Vector[String] =
    (1 to 20).map(i => s"$prefix$i").toVector
  private def edited(base: Vector[String], edits: (Int, String)*): String =
    edits.foldLeft(base) { case (t, (i, w)) => t.updated(i, w) }.mkString(" ")

  test("streaming near-dup curation equals Curation.curate on a corpus replayed in batches") {
    val t = tokens("a")
    val corpus = Seq(
      // batch 0
      1L -> t.mkString(" "),            // component root — kept
      2L -> t.mkString(" "),            // exact dup of 1 — exact-dedup drop
      3L -> edited(t, 5 -> "x3"),       // ~1 (j .71) — in-batch CC drop
      4L -> tokens("b").mkString(" "),  // distinct — kept
      // batch 1
      5L -> edited(t, 2 -> "x5"),       // ~1 (j .71) — cross-batch sig probe drop
      6L -> tokens("c").mkString(" "),  // distinct — kept
      7L -> edited(tokens("c"), 10 -> "x7"), // ~6 — in-batch CC drop
      // batch 2
      8L -> edited(t, 5 -> "x3", 10 -> "x8", 15 -> "x9"),
      // ^ ~3 only (j(8,3) = .5; j(8,1) = .33): 3 was itself DROPPED, so
      //   this doc pins the signature-history-of-dropped-docs path — the
      //   transitive chain 1–3–8 that plain survivor-probing would leak
      9L -> tokens("d").mkString(" "))  // distinct — kept
    val srcDir = Files.createTempDirectory("scnd").toString
    Seq(corpus.take(4), corpus.slice(4, 7), corpus.drop(7)).foreach { batch =>
      batch.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    }
    run(srcDir, "docs_neardup")
    val streamed = spark.table(s"`$db`.`docs_neardup`")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val batch = Curation.curate(corpus.toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(batch == Seq(1L, 4L, 6L, 9L), s"batch pipeline sanity: $batch")
    assert(streamed == batch,
      s"streaming must deliver the batch pipeline's survivors: $streamed vs $batch")
    // the signature history records every candidate (not just survivors)
    // under the batch ledger — that is what made the 1–3–8 chain work
    val sigs = spark.table(s"`$db`.`docs_neardup${StreamingCuration.SigSuffix}`")
    val sigIds = sigs.select("doc_id").as[Long].collect().sorted.toSeq
    assert(sigIds == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
      s"sigs hold every exact-deduped candidate incl. near-dup drops: $sigIds")
    assert(sigs.columns.contains(StreamingDelivery.BatchIdCol),
      "signature table is ledgered like the curated table")
  }

  test("replay with a fresh checkpoint is a no-op (ledger short-circuits before the anti-join)") {
    val srcDir = mkSource
    run(srcDir, "docs_replayed")
    val tbl = s"`$db`.`docs_replayed`"
    val before = spark.table(tbl).collect().toSet
    run(srcDir, "docs_replayed")
    assert(spark.table(tbl).collect().toSet == before,
      "replaying the same files must not change the table")
    val ids = spark.table(tbl).select(StreamingDelivery.BatchIdCol)
      .distinct().as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L), s"unexpected batch ids: $ids")
  }


  test("checkpoint reset over a grown source fails loudly via the input-rows stamp") {
    val srcDir = mkSource
    run(srcDir, "docs_grown")
    // the source grows, the checkpoint is lost: the fresh run batches all
    // files into batch 0, whose ledger entry records 4 input rows — the
    // replayed batch now carries 7
    Seq((7L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = StreamingCuration.start(
      src, "docs_grown", Files.createTempDirectory("sccp").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("delivery ledger disagree")),
      s"expected input-rows mismatch error, got: ${causeMessages(e)}")
  }

  test("a foreign table without the curation columns fails with a clear error") {
    val srcDir = mkSource
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    // has the batch ledger but no fingerprint/_input_rows — e.g. created
    // by plain (uncurated) streaming delivery
    Seq((1L, "x", 0L))
      .toDF("doc_id", "text", StreamingDelivery.BatchIdCol)
      .write.mode("overwrite").format("parquet").saveAsTable(s"`$db`.`docs_foreign`")
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = StreamingCuration.start(
      src, "docs_foreign", Files.createTempDirectory("sccp").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("not created by curated delivery")),
      s"expected missing-curation-columns error, got: ${causeMessages(e)}")
  }

  test("a curated table without the input-rows stamp stays usable (replay check degrades)") {
    val srcDir = mkSource
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    // shape written by an earlier curated-delivery version: fingerprint +
    // ledger, no _input_rows. Its batch-0 ledger entry makes the stream's
    // batch 0 replay-skip (unverifiable without the stamp); batch 1 must
    // still deliver, matching the legacy schema.
    Seq((100L, "legacy text kept verbatim",
        "00000000000000000000000000000000", 0L))
      .toDF("doc_id", "text", "fingerprint", StreamingDelivery.BatchIdCol)
      .write.mode("overwrite").format("parquet").saveAsTable(s"`$db`.`docs_legacy`")
    run(srcDir, "docs_legacy")
    val tbl = spark.table(s"`$db`.`docs_legacy`")
    assert(!tbl.columns.contains(StreamingCuration.InputRowsCol),
      "legacy schema is preserved — parquet appends cannot add a column")
    val ids = tbl.select("doc_id").as[Long].collect().sorted.toSeq
    // batch 0 (docs 1-4) skipped via its ledger entry; batch 1 delivered
    // doc 5 (goodA is fresh here) and doc 6
    assert(ids == Seq(5L, 6L, 100L), s"got $ids")
  }
}
