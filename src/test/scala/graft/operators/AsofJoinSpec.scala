package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof semantics: latest prior-or-same match, nulls when none, per key") {
    val left = Seq(
      (1L, 5L, "l1"), (1L, 10L, "l2"), (1L, 20L, "l3"),
      (2L, 7L, "l4"),
      (3L, 9L, "l5")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 15L, "r15"),
      (2L, 8L, "r8")).toDF("k", "t", "rv")
    val got = AsofJoin(left, right, "k", "t", "t", Seq("rv"))
      .select($"lv", $"rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "l1" -> None,          // before any right row
      "l2" -> Some("r10"),   // inclusive at equal time
      "l3" -> Some("r15"),   // latest of two priors
      "l4" -> None,          // right row for key 2 is later (8 > 7)
      "l5" -> None))         // key 3 has no right rows
  }

  test("a matched right row's genuinely-null payload field is carried, not skipped") {
    val left = Seq((1L, 3L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, 1L, Some("old"), Some(7L)), (1L, 2L, None, Some(9L)))
      .toDF("k", "t", "rv", "rn")
    val row = AsofJoin(left, right, "k", "t", "t", Seq("rv", "rn")).collect()(0)
    // most recent right row (t=2) has rv=null — must NOT fall back to t=1's
    // value, and rn must come from the same (t=2) row
    assert(row.isNullAt(row.fieldIndex("rv")))
    assert(row.getAs[Long]("rn") == 9L)
  }

  test("reserved, duplicate and clashing column names are rejected up front") {
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L, "x")).toDF("k", "t", "rv")
    intercept[IllegalArgumentException](AsofJoin(l, r, "k", "t", "t", Seq("rv", "rv")))
    val lReserved = Seq((1L, 1L, 0L)).toDF("k", "t", "_T") // case-insensitive hit
    intercept[IllegalArgumentException](AsofJoin(lReserved, r, "k", "t", "t", Seq("rv")))
  }

  test("left columns survive and row count is preserved") {
    val left = Seq((1L, 1L, 9.5, "x")).toDF("k", "t", "payload", "note")
    val right = Seq((1L, 1L, 42L)).toDF("k", "t", "rid")
    val out = AsofJoin(left, right, "k", "t", "t", Seq("rid"))
    assert(out.columns.toSet == Set("k", "t", "payload", "note", "rid"))
    val row = out.collect()(0)
    assert(row.getAs[Double]("payload") == 9.5 && row.getAs[Long]("rid") == 42L)
  }
}
