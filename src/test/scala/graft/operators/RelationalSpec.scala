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

  test("q33 pair generator emits exactly the sorted 2-combinations of each basket") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same generator expression as the catalog query, on planted baskets:
    // {3,1,2} (dup row included), a singleton, and a 2-set
    val li = Seq((10L, 3L), (10L, 1L), (10L, 2L), (10L, 2L),
        (11L, 7L), (12L, 5L), (12L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val pairs = li.distinct()
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("ps"))
      .select($"l_orderkey", explode(expr(
        """flatten(transform(ps, (x, i) ->
          transform(slice(ps, i + 2, size(ps) - i - 1),
            y -> struct(x AS part_a, y AS part_b))))""")).as("p"))
      .select($"l_orderkey", $"p.part_a", $"p.part_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L, 2L), (10L, 1L, 3L), (10L, 2L, 3L),
      (12L, 4L, 5L)),
      s"expected sorted 2-combinations per basket, got $pairs")
  }
}
