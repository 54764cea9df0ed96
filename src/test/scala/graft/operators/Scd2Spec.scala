package graft.operators

import graft.SparkSpec

/** q31's oracle hash-gates SCD2 on real data; this spec pins each
  * versioning rule on planted rows, including the cases the catalog
  * fixture cannot exercise (null-safe attr comparison, multi-attr
  * change, pre-existing closed history).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: (Long, String, Option[String], String, Option[String])*) =
    rows.toDF("k", "seg", "tier", "valid_from", "valid_to")

  for (bc <- Seq(true, false))
    test(s"change closes + reopens, no-op and untouched pass through, new key inserts (broadcast=$bc)") {
      val current = hist(
        (1L, "A", Some("gold"), "2024-01-01", None),  // will change
        (2L, "B", Some("silver"), "2024-01-01", None), // no-op update
        (3L, "C", Some("bronze"), "2024-01-01", None)) // untouched
      val updates = Seq(
        (1L, "A2", Some("gold"), "2024-02-01"),
        (2L, "B", Some("silver"), "2024-02-01"),
        (9L, "N", Some("basic"), "2024-02-01"))
        .toDF("k", "seg", "tier", "eff")
      val got = Scd2(current, updates, Seq("k"), Seq("seg", "tier"), "eff",
          broadcastUpdates = bc)
        .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)),
          Option(r.getString(4)))).toSet
      assert(got == Set(
        (1L, "A", Some("2024-01-01"), Some("2024-02-01")), // closed
        (1L, "A2", Some("2024-02-01"), None),              // new version
        (2L, "B", Some("2024-01-01"), None),               // no-op: unchanged
        (3L, "C", Some("2024-01-01"), None),               // untouched
        (9L, "N", Some("2024-02-01"), None)))              // inserted
    }

  test("default path is broadcast-only: the dimension never shuffles into a SortMergeJoin") {
    val current = hist((1L, "A", Some("gold"), "2024-01-01", None))
    val updates = Seq((1L, "A2", Some("gold"), "2024-02-01")).toDF("k", "seg", "tier", "eff")
    val plan = Scd2(current, updates, Seq("k"), Seq("seg", "tier"), "eff")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"full-outer fallback leaked into the broadcast path:\n$plan")
  }

  test("brand-new keys insert as open rows; closed history is untouched") {
    val current = hist(
      (1L, "A", Some("gold"), "2023-01-01", Some("2024-01-01")), // closed history
      (1L, "A1", Some("gold"), "2024-01-01", None))
    val updates = Seq((9L, "N", Some("basic"), "2024-02-01")).toDF("k", "seg", "tier", "eff")
    val got = Scd2(current, updates, Seq("k"), Seq("seg", "tier"), "eff")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3),
        Option(r.getString(4)))).toSet
    assert(got == Set(
      (1L, "A", "2023-01-01", Some("2024-01-01")),
      (1L, "A1", "2024-01-01", None),
      (9L, "N", "2024-02-01", None)))
  }

  test("attr comparison is null-safe: null→value and value→null both open versions") {
    val current = hist(
      (1L, "A", None, "2024-01-01", None),
      (2L, "B", Some("gold"), "2024-01-01", None))
    val updates = Seq(
      (1L, "A", Some("gold"), "2024-02-01"),  // null → value
      (2L, "B", None, "2024-02-01"))          // value → null
      .toDF("k", "seg", "tier", "eff")
    val got = Scd2(current, updates, Seq("k"), Seq("seg", "tier"), "eff")
    assert(got.count() == 4, "both transitions must version")
    val open = got.filter($"valid_to".isNull).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(open == Map(1L -> Some("gold"), 2L -> None))
  }

  for (bc <- Seq(true, false))
    test(s"a NULL effective time in the update batch fails loudly (broadcast=$bc)") {
      // match logic keys "update present" on the effective time being
      // non-null, so a NULL one would silently vanish for a matched key
      // yet insert an open row with NULL valid_from for a new one —
      // raise_error turns both into a loud execution failure.
      val current = hist((1L, "A", Some("gold"), "2024-01-01", None))
      for (updRows <- Seq(
        Seq((1L, "A2", Some("gold"), null: String)),   // matched key
        Seq((9L, "N", Some("basic"), null: String)))) { // new key
        val updates = updRows.toDF("k", "seg", "tier", "eff")
        val e = intercept[Exception](
          Scd2(current, updates, Seq("k"), Seq("seg", "tier"), "eff",
            broadcastUpdates = bc).collect())
        assert(causeMessages(e).exists(_.contains("NULL eff")),
          s"expected the scd2 null-effective guard, got: ${causeMessages(e).take(3)}")
      }
    }

  test("missing columns and empty keys are rejected up front") {
    val current = hist((1L, "A", Some("g"), "2024-01-01", None))
    val updates = Seq((1L, "A2", "2024-02-01")).toDF("k", "seg", "eff")
    intercept[IllegalArgumentException](
      Scd2(current, updates, Seq.empty, Seq("seg"), "eff"))
    intercept[IllegalArgumentException]( // updates lacks tier
      Scd2(current, updates, Seq("k"), Seq("seg", "tier"), "eff"))
  }
}
