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
}
