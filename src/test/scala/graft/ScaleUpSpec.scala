package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** ScaleUp derives a bigger SF from a testdata dir the way dbgen derives a
  * bigger SF: same distributions, factor x the rows. These specs pin the
  * invariants the sf1 scale evidence rests on: exact multiplication,
  * self-consistent foreign keys per replica, verbatim replica 0, disjoint
  * text token spaces across replicas, and isometric embedding rotation.
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (src, dst) = {
    val s = Files.createTempDirectory("scaleup-src").toString
    val d = Files.createTempDirectory("scaleup-dst").toString
    def w(df: DataFrame, t: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$s/$t.parquet")
    w(Seq((0, "AMERICA"), (1, "ASIA")).toDF("r_regionkey", "r_name"), "region")
    w(Seq((0, "BRAZIL", 0), (1, "CHINA", 1)).toDF("n_nationkey", "n_name", "n_regionkey"), "nation")
    w(Seq((1L, "ca", 0, 10.0, "AUTO"), (2L, "cb", 1, 20.0, "BLDG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"), "customer")
    w(Seq((1L, "sa", 0, 5.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")
    w(Seq((1L, "pa", "B1", "T1", 3, 9.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"), "part")
    w(Seq((10L, 1L, "O", 100.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
        (11L, 2L, "F", 200.0, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"), "orders")
    w(Seq((10L, 1L, 1L, 1, 2.0, 50.0, 0.1, 0.02, "N", "O",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"), "lineitem")
    w(Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:11"), 7L, "view", 1.5, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), "events")
    w(Seq((0L, "alpha beta alpha", "en", "src0", 16L), (1L, "gamma delta", "de", "src1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")
    w(Seq((0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 3),
        (1L, Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f), 4))
      .toDF("vec_id", "embedding", "label"), "embeddings")
    ScaleUp.run(spark, s, d, factor = 3)
    (s, d)
  }
  private def out(t: String): DataFrame = spark.read.parquet(s"$dst/$t.parquet")

  test("fact tables multiply by the factor; shared dimensions do not") {
    assert(out("region").count() === 2 && out("nation").count() === 2)
    for ((t, n) <- Seq("customer" -> 2, "supplier" -> 1, "part" -> 1,
        "orders" -> 2, "lineitem" -> 1, "events" -> 1, "documents" -> 2,
        "embeddings" -> 2))
      assert(out(t).count() === n * 3L, t)
  }

  test("every replica is a self-consistent shard: all foreign keys resolve") {
    val custKeys = out("customer").select("c_custkey")
    assert(out("orders").join(custKeys, $"o_custkey" === $"c_custkey", "left_anti").count() === 0)
    val orderKeys = out("orders").select("o_orderkey")
    assert(out("lineitem").join(orderKeys, $"l_orderkey" === $"o_orderkey", "left_anti").count() === 0)
    assert(out("lineitem").join(out("part"), $"l_partkey" === $"p_partkey", "left_anti").count() === 0)
    // and keys never collide across replicas
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id", "events" -> "event_id"))
      assert(out(t).select(k).distinct.count() === out(t).count(), t)
  }

  test("replica 0 is the verbatim source corpus") {
    val origDocs = spark.read.parquet(s"$src/documents.parquet")
    val rep0 = out("documents").filter($"doc_id" < ScaleUp.Stride)
    assert(rep0.exceptAll(origDocs).count() === 0 && origDocs.exceptAll(rep0).count() === 0)
    val origEmb = spark.read.parquet(s"$src/embeddings.parquet")
    val erep0 = out("embeddings").filter($"vec_id" < ScaleUp.Stride)
    assert(erep0.exceptAll(origEmb).count() === 0 && origEmb.exceptAll(erep0).count() === 0)
  }

  test("document replicas share no tokens (near-dup rate scales, not degenerates)") {
    val toks = out("documents")
      .select((col("doc_id") / ScaleUp.Stride).cast("long").as("rep"),
        explode(split(col("text"), " ")).as("tok"))
    val reps = toks.groupBy("tok").agg(countDistinct("rep").as("n"))
    assert(reps.filter($"n" > 1).count() === 0)
    // replica r's text is the source text with every token suffixed ~r
    val d0r2 = out("documents")
      .filter($"doc_id" === 2L * ScaleUp.Stride).head.getAs[String]("text")
    assert(d0r2 === "alpha~2 beta~2 alpha~2")
    // the fixture invariant the m-family oracles predict blob sizes from
    // (n_chars == character count of text) must survive the transform
    assert(out("documents")
      .filter(length($"text").cast("long") =!= $"n_chars").count() === 0)
  }

  test("embedding rotation is an isometry: norms and within-replica dots preserved") {
    val byRep = out("embeddings")
      .select((col("vec_id") / ScaleUp.Stride).cast("long").as("rep"),
        (col("vec_id") % ScaleUp.Stride).as("id"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
    for ((rep, id, v) <- byRep) {
      assert(math.abs(v.map(x => x * x).sum - 1f) < 1e-6, s"norm rep=$rep id=$id")
      assert(v.length === 8)
    }
    // rep 2 of vec 0 = [1,0,...] rotated left by 2 → the 1 lands at index 6
    val r2 = byRep.find(t => t._1 == 2 && t._2 == 0).get._3
    assert(r2(6) === 1f && r2.sum === 1f)
    // labels shift with the replica: each shard keeps its own label space
    val labelReps = out("embeddings")
      .select((col("vec_id") / ScaleUp.Stride).cast("long").as("rep"), col("label"))
      .groupBy("label").agg(countDistinct("rep").as("n"))
    assert(labelReps.filter($"n" > 1).count() === 0)
  }
}
