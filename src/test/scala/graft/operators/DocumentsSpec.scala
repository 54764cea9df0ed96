package graft.operators

import graft.{Catalog, SparkSpec}

/** Gates for the dedup operators whose scale paths are probabilistic or
  * Spark-hash-specific (no cross-engine oracle for d04; d03 shares d02's
  * oracle and this spec double-checks the equivalence in-JVM).
  */
class DocumentsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    Catalog.byName(name).run(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d03 MinHash+verify equals the exact shingle-Jaccard result (d02)") {
    val exact = Catalog.byName("d02_neardup_jaccard").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Catalog.byName("d03_neardup_minhash").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "test data contains planted near-dups")
    assert(lsh == exact)
  }

  test("d04 SimHash: non-empty, precision 1.0 against exact near-dups") {
    val sim = pairs("d04_simhash_neardup")
    val exact = pairs("d02_neardup_jaccard")
    assert(sim.nonEmpty, "simhash finds the planted near-dups")
    // hamming <= 6 is a TIGHTER bar than jaccard >= 0.5, so every simhash
    // pair must also be an exact near-dup pair (precision 1.0); recall may
    // be < 1 by design.
    assert(sim.subsetOf(exact), s"non-neardup pairs leaked: ${sim.diff(exact)}")
  }

  test("d01 exact dedup: one fingerprint per distinct text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val distinctTexts = docs.select("text").distinct().count()
    val out = Catalog.byName("d01_exact_dedup").run(spark, sf)
    assert(out.count() == distinctTexts)
    import org.apache.spark.sql.functions.sum
    val total = out.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == docs.count(), "copies partition the corpus")
  }
}
