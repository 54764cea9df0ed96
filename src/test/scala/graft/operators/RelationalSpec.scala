package graft.operators

import graft.{Catalog, SparkSpec}

/** The relational q* queries are oracle-gated (hash-match vs DuckDB in
  * CORRECTNESS); this spec pins only the claims the oracle cannot see —
  * q25's locality property is about the LAYOUT the z-value induces, not
  * the returned aggregate values.
  */
class RelationalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q25 z-order buckets are narrow rectangles in (partkey, suppkey) space") {
    val rows = Catalog.byName("q25_zorder_layout").run(spark, sf).collect()
    assert(rows.nonEmpty)
    // the top-6-bit bucket fixes bits 5..7 of gx = partkey/8 and bits
    // 5..6 of gy = suppkey, so every bucket must sit inside a 256-wide
    // partkey slab AND a 32-wide suppkey slab — the 2-D file-skipping
    // property a 1-D sort cannot provide (sorting by partkey alone
    // leaves per-file suppkey spans at the full 0..99 range)
    rows.foreach { r =>
      val (pkMin, pkMax) = (r.getAs[Long]("pk_min"), r.getAs[Long]("pk_max"))
      val (skMin, skMax) = (r.getAs[Long]("sk_min"), r.getAs[Long]("sk_max"))
      assert(pkMax - pkMin < 256, s"bucket ${r.get(0)} partkey span ${pkMax - pkMin}")
      assert(skMax - skMin < 32, s"bucket ${r.get(0)} suppkey span ${skMax - skMin}")
    }
    // the buckets partition the table: no rows lost to the interleave
    val total = rows.map(_.getAs[Long]("n")).sum
    val want = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(total == want, s"bucket counts sum $total != table rows $want")
  }
}
