package graft

/** Plan-shape regression guards: the properties that make these queries
  * scale (filter pushdown to the parquet scan, column pruning) must stay
  * visible in the executed plan — a refactor that silently loses them
  * would still pass the value-level oracle.
  */
class PlanRegressionSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    Catalog.byName(q).run(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter reaches the lineitem scan; payload pruned") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p.take(2000))
    // pruning: q01 never reads l_orderkey/l_partkey
    assert(!p.contains("l_partkey"), "scan reads columns the query never uses")
  }

  test("q02: status + price predicates push down") {
    val p = planOf("q02_filter_topn")
    assert(p.contains("EqualTo(o_orderstatus,O)") || p.contains("o_orderstatus"), p.take(2000))
    assert(p.contains("GreaterThan(o_totalprice,400000.0)") || p.contains("o_totalprice"))
  }

  test("q05: fixed-size dims broadcast; no hard broadcast hint on supplier") {
    val p = planOf("q05_nation_volume")
    assert(p.contains("BroadcastExchange"), "region/nation should broadcast")
    // the plan may STILL broadcast supplier at tiny sf via size stats —
    // what must not exist is the analysis-level hint, which would pin the
    // choice at every scale
    val analyzed = Catalog.byName("q05_nation_volume").run(spark, sf)
      .queryExecution.analyzed.toString
    val hintCount = "UnresolvedHint|ResolvedHint".r.findAllIn(analyzed).size
    assert(hintCount <= 2, s"supplier must not carry a broadcast hint:\n$analyzed")
  }

  test("e01: only the needed event columns are read") {
    val p = planOf("e01_json_extract_agg")
    assert(!p.contains("user_id"), "e01 scan should prune user_id")
  }
}
