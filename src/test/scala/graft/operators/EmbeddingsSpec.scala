package graft.operators

import graft.{Catalog, SparkSpec}

class EmbeddingsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("v01 top-k: 10 ranked neighbors per query, cosine bounded and descending") {
    val rows = Catalog.byName("v01_similarity_topk").run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 100)
    rows.foreach { case (_, _, _, c) => assert(c >= -1.0000001 && c <= 1.0000001) }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cosine non-increasing in rank")
    }
  }

  test("v02 bucketed ANN: neighbors share the query's sign bucket") {
    val df = Catalog.byName("v02_ann_bucketed").run(spark, sf)
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        (when(col("embedding").getItem(0) >= 0f, 8).otherwise(0)
          + when(col("embedding").getItem(1) >= 0f, 4).otherwise(0)
          + when(col("embedding").getItem(2) >= 0f, 2).otherwise(0)
          + when(col("embedding").getItem(3) >= 0f, 1).otherwise(0)).cast("long").as("true_bucket"))
    val bad = df.join(emb, df("query_id") === emb("vec_id"))
      .filter(col("bucket") =!= col("true_bucket")).count()
    assert(bad == 0)
  }
}
