package graft.operators

import graft.SparkSpec

/** Pins the equivalence of the two JSON extraction shapes over `props`:
  * e06's full-map `from_json` parse (the MapType column demo) and e01's
  * single-key `get_json_object` (the production form when only known keys
  * are consulted — it skips materializing the map per row; 0.9 s vs
  * 4.2 s at sf0.1). If the two ever disagree on a key, e06's comment
  * recommending the single-key form becomes wrong — this gate notices.
  */
class EventsJsonSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("single-key get_json_object == from_json MapType lookup on every event") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{MapType, StringType}
    val diverging = graft.QueryHelpers.eventsTbl(spark, sf)
      .withColumn("k_single", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_map",
        element_at(from_json(col("props"), MapType(StringType, StringType)), "k")
          .cast("long"))
      .filter(!(col("k_single") <=> col("k_map")))
    assert(diverging.count() == 0,
      s"extraction paths disagree: ${diverging.take(5).mkString(", ")}")
  }
}
