package graft.operators

import graft.{Catalog, SparkSpec}

/** The relational q* queries are oracle-gated (hash-match vs DuckDB in
  * CORRECTNESS); this spec pins only the claims the oracle cannot see —
  * q25's locality property is about the LAYOUT the z-value induces, not
  * the returned aggregate values.
  */
class RelationalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q19 two-phase bucketed ntile == the direct ntile window, row for row") {
    // r19 optimization gate: q19 derives each row's decile from a
    // range-bucketed two-phase rank plus ntile's integer rule instead
    // of one window task per priority. The per-(priority, decile)
    // aggregate must equal the direct window form exactly — compare on
    // the fixture at full row granularity.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n"),
        graft.QueryHelpers.sumExact(col("o_totalprice")).as("sum_price"),
        max(col("o_totalprice")).as("max_price"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val got = Catalog.byName("q19_revenue_deciles").run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got == direct, s"two-phase minus direct: ${got.diff(direct)}; direct minus two-phase: ${direct.diff(got)}")
  }

  test("q27 two-phase percent_rank/cume_dist == the direct window, row for row") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val got = Catalog.byName("q27_price_distribution_ranks").run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got == direct,
      s"two-phase minus direct: ${got.diff(direct).take(3)}; direct minus two-phase: ${direct.diff(got).take(3)}")
  }

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
