package graft

/** The SQL face: registered views + engine functions let a user query the
  * same data with plain spark.sql. */
class CatalogSpec extends SparkSpec {

  test("registerViews exposes all test tables to spark.sql") {
    Catalog.registerViews(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"""
    ).collect()(0).getLong(0)
    assert(n > 0)
    // events view arrives micro-converted (the raw nanos parquet would throw)
    assert(spark.sql("SELECT MAX(ts) FROM events").collect()(0).getTimestamp(0) != null)
    assert(spark.sql("SELECT COUNT(*) FROM documents").collect()(0).getLong(0) == 500)
  }

  test("catalog names are unique and every oracle key has a query") {
    assert(Catalog.byName.size == Catalog.all.size)
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("dedup and similarity operators run through spark.sql alone") {
    graft.functions.GraftQuery.install(spark)
    val sf = "/root/testdata/sf0.001"
    val dedup = spark.sql(
      s"SELECT * FROM graft_query('d01_exact_dedup', '$sf') WHERE n_copies >= 1")
    assert(dedup.columns.toSeq == Seq("fingerprint", "canonical_doc", "n_copies"))
    assert(dedup.count() > 0)
    val sim = spark.sql(
      s"SELECT query_id, neighbor_id FROM graft_query('v01_similarity_topk', '$sf') WHERE rnk = 1")
    assert(sim.count() > 0)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_query('no_such_query', '/tmp')").collect())
    assert(e.getMessage.contains("unknown graft query"))
  }
}
