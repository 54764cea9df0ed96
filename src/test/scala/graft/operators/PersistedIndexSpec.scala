package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the build-once/fingerprint-skip contract of the r12 persisted
  * near-dup pair indexes (`ensureSimhashIndex` / `ensureMediaIndex`):
  * a second ensure over an unchanged corpus must NOT rewrite the
  * artifact (cross-JVM serve is a freshness scan + read), `force`
  * must always rebuild (the d00/m00 named-builder contract), and a
  * corpus edit must invalidate the fingerprint and rebuild. Observed
  * through the artifact files' mtimes — the same signal a cluster
  * operator would audit. */
class PersistedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(dir: String, extra: Seq[(Long, String)] = Nil): Unit = {
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota"),
      (2L, "one two three four five six seven eight"),
      (3L, "totally different words nine ten eleven twelve"))
    (base ++ extra).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def maxMtime(loc: String): Long = {
    val p = new java.io.File(new java.net.URI(loc).getPath)
    def walk(f: java.io.File): Seq[Long] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f.lastModified())
    walk(p).max
  }

  test("ensureSimhashIndex: build once, skip when fresh, force & corpus-change rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("simidx").toString
    corpus(dir)
    graft.CacheRegistry.unpersistAll()
    val loc = Documents.ensureSimhashIndex(spark, dir)
    val built = maxMtime(loc)
    // unchanged corpus: the second ensure is a freshness probe, not a build
    Thread.sleep(1100) // mtime granularity
    assert(Documents.ensureSimhashIndex(spark, dir) == loc)
    assert(maxMtime(loc) == built, "fresh index must not be rewritten")
    // force: the named-builder path always rebuilds
    Documents.ensureSimhashIndex(spark, dir, force = true)
    val forced = maxMtime(loc)
    assert(forced > built, "force=true must rewrite the artifact")
    // corpus change: fingerprint mismatch triggers a rebuild
    Thread.sleep(1100)
    corpus(dir, extra = Seq((9L, "a brand new document arrives here now")))
    Documents.ensureSimhashIndex(spark, dir)
    assert(maxMtime(loc) > forced, "changed corpus must rebuild")
    graft.CacheRegistry.unpersistAll()
  }

  test("ensureMediaIndex: fingerprint-skip honors the band-bucket gate parameter") {
    val dir = java.nio.file.Files.createTempDirectory("mediaidx").toString
    corpus(dir)
    graft.CacheRegistry.unpersistAll()
    val loc = Multimodal.ensureMediaIndex(spark, dir)
    val built = maxMtime(loc)
    Thread.sleep(1100)
    assert(Multimodal.ensureMediaIndex(spark, dir) == loc)
    assert(maxMtime(loc) == built, "fresh index must not be rewritten")
    // a DIFFERENT gate bound is a different build contract — the meta
    // fingerprint includes it, so the ensure rebuilds rather than
    // serving an artifact whose build was gated differently
    Multimodal.ensureMediaIndex(spark, dir, maxBandBucket = 1L << 20)
    assert(maxMtime(loc) > built, "gate change must rebuild")
    graft.CacheRegistry.unpersistAll()
  }

  test("phashPairs serves fresh pairs after an in-session corpus change") {
    // payloads agreeing on the FIRST 64 bytes hash identically (the 8×8
    // resize truncates there) while differing tails defeat the exact-
    // payload collapse — a deterministic hamming-0 pair; prefix B's
    // second half inverts A's alternation, so A-vs-B hamming is 32 ≫ 6
    val pA = "ab" * 32
    val pB = "ab" * 16 + "ba" * 16
    val dir = java.nio.file.Files.createTempDirectory("phashfresh").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.CacheRegistry.unpersistAll()
    write(Seq((0L, pA + "t0"), (1L, pA + "t1"), (2L, pB + "x")))
    def pairs(): Set[(Long, Long)] =
      graft.SparkEntry.queries("m05_phash_neardup")(spark, dir)
        .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs() == Set((0L, 1L)))
    // rewrite the corpus IN PLACE in the same session: doc 1 now shares
    // prefix B — the serve must re-fingerprint, rebuild, and release the
    // registry entry rather than returning the memoized/cached old rows
    write(Seq((0L, pA + "t0"), (1L, pB + "t1"), (2L, pB + "x")))
    assert(pairs() == Set((1L, 2L)), "in-session corpus change must invalidate the serve")
    graft.CacheRegistry.unpersistAll()
  }

  test("simhash rebuild reads fresh shingles past a warm plan-matched cache") {
    // The build input (NearDup.shingled over the documents parquet) is a
    // pure-Catalyst plan that d02/d03/d05/Curation retain as
    // "neardup.shingles" — CacheManager substitutes the warm entry into
    // ANY later plan containing that subtree (InMemoryFileIndex equality
    // is by rootPaths, so an in-place corpus rewrite still plan-matches).
    // Without simhashPairsCompute's unconditional release, the rebuild
    // after a corpus change would read the PRE-rewrite shingle rows and
    // stamp the NEW fingerprint into _meta: durably-persisted wrong
    // pairs. The rewrite must happen OUTSIDE this Spark session (at
    // 100 TB the ingest pipeline is another process): an in-session
    // `.mode("overwrite")` write self-heals via CacheManager
    // .recacheByPath, which is why the hole never showed in the other
    // corpus-change tests — so the v2 corpus is staged to a sibling dir
    // and moved over the rootPath with filesystem ops.
    val dir = java.nio.file.Files.createTempDirectory("simstale").toString
    graft.CacheRegistry.unpersistAll()
    // doc 9 is an exact dup of doc 0 → guaranteed simhash pair (0, 9, 0)
    corpus(dir, extra = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta")))
    Documents.ensureSimhashIndex(spark, dir)
    // warm "neardup.shingles" through the d02 path (retains + materializes)
    graft.SparkEntry.queries("d02_neardup_jaccard")(spark, dir).collect()
    assert(graft.CacheRegistry.entries.contains("neardup.shingles"))
    // external rewrite: doc 9 is now an exact dup of doc 2 instead
    val staging = java.nio.file.Files.createTempDirectory("simstale2").toString
    corpus(staging, extra = Seq((9L, "one two three four five six seven eight")))
    locally {
      import scala.jdk.CollectionConverters._
      val dst = java.nio.file.Paths.get(dir, "documents.parquet")
      val src = java.nio.file.Paths.get(staging, "documents.parquet")
      java.nio.file.Files.list(dst).iterator().asScala
        .foreach(java.nio.file.Files.delete)
      java.nio.file.Files.list(src).iterator().asScala.foreach { f =>
        java.nio.file.Files.move(f, dst.resolve(f.getFileName.toString))
      }
    }
    val loc = Documents.ensureSimhashIndex(spark, dir)
    val persisted = spark.read.parquet(loc)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(persisted.contains((2L, 9L)),
      "rebuild must see the POST-rewrite corpus (fresh shingles)")
    assert(!persisted.contains((0L, 9L)),
      "rebuild must not persist pairs computed from stale cached shingles")
    graft.CacheRegistry.unpersistAll()
  }

  test("d04 serve equals the in-query compute it replaced (index round-trip)") {
    val dir = java.nio.file.Files.createTempDirectory("simrt").toString
    corpus(dir)
    graft.CacheRegistry.unpersistAll()
    // doc 9 duplicates doc 0's text exactly: identical shingle sets give
    // identical simhashes, so (0, 9, hamming 0) is a GUARANTEED pair
    // (near-identical texts are only probabilistically close under
    // SimHash — an exact dup is the deterministic fixture)
    corpus(dir, extra = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta")))
    graft.CacheRegistry.unpersistAll()
    val served = graft.SparkEntry.queries("d04_simhash_neardup")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(served.forall { case (a, b, h) => a < b && h <= 6 })
    assert(served.contains((0L, 9L, 0L)))
    // docs 2 and 3 share no vocabulary with anything: NO pair may touch
    // them at all (an any-sided guard, not just the (2,3) pairing)
    assert(served.forall { case (a, b, _) =>
      Set(a, b).subsetOf(Set(0L, 1L, 9L)) },
      "disjoint-vocabulary docs must not pair")
    graft.CacheRegistry.unpersistAll()
  }
}
