package graft.operators

import graft.SparkSpec

/** q30's oracle hash-gates the merge on real data; this spec pins the
  * MERGE semantics on planted rows where each case is visible by eye,
  * plus the plan shape (broadcast anti join — the base table must not
  * shuffle for a small update batch) and the argument contracts.
  */
class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "s", "v")

  test("update replaces matched key, insert adds unmatched, rest untouched") {
    val updates = Seq((2L, "B", 99.0), (9L, "new", 1.0)).toDF("k", "s", "v")
    val got = MergeUpsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "a", 10.0),   // untouched
      (2L, "B", 99.0),   // replaced, not duplicated
      (3L, "c", 30.0),   // untouched
      (9L, "new", 1.0))) // inserted
  }

  test("update columns align by NAME even when ordered differently") {
    val updates = Seq(("B", 2L, 99.0)).toDF("s", "k", "v")
    val got = MergeUpsert(base, updates, Seq("k"))
      .filter($"k" === 2L).collect().map(r => (r.getAs[String]("s"), r.getAs[Double]("v")))
    assert(got.toSeq == Seq(("B", 99.0)))
  }

  test("compound keys match on ALL key columns") {
    val b = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "v")
    val u = Seq((1L, 2L, "Y")).toDF("k1", "k2", "v")
    val got = MergeUpsert(b, u, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // only the (1,2) row is replaced — (1,1) shares k1 but not k2
    assert(got == Set((1L, 1L, "x"), (1L, 2L, "Y")))
  }

  test("default plan broadcasts the update keys (no base shuffle for the anti join)") {
    val updates = Seq((2L, "B", 99.0)).toDF("k", "s", "v")
    val plan = MergeUpsert(base, updates, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join in:\n$plan")
  }

  test("missing key column and empty key list are rejected up front") {
    val updates = Seq((2L, "B", 99.0)).toDF("k", "s", "v")
    intercept[IllegalArgumentException](MergeUpsert(base, updates, Seq.empty))
    intercept[IllegalArgumentException](MergeUpsert(base, updates, Seq("nope")))
  }
}
