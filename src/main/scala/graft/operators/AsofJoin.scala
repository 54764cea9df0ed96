package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Reusable as-of join: for every left row, attach the most recent right
  * row with `right.time <= left.time` (inclusive) sharing the join key.
  * Spark has no native asof operator; this is the scalable composition
  * (SURVEY §2.1 custom-op preference (a)): tag both sides, UNION, and
  * carry the last-seen right payload forward with an ignore-nulls window
  * — ONE shuffle on the key, no per-row range probe, no broadcast of
  * either side, skew-bounded by the key like any window.
  *
  * Contract: `right` must be unique per (key, time) — pre-aggregate ties
  * or the carried payload is undefined. Left rows with no prior right row
  * get nulls (left-join semantics). To compute gaps, alias the right time
  * into `payloadCols` (e.g. `right.withColumn("matched_t", col("t"))`).
  */
object AsofJoin {

  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asof join needs at least one payload column")
    require(payloadCols.map(_.toLowerCase).distinct.size == payloadCols.size,
      "duplicate payload columns")
    val reserved = Set("_t", "_tag", "_p")
    val lower = (left.columns ++ payloadCols).map(_.toLowerCase)
    require(!lower.exists(reserved), "column names _t/_tag/_p are reserved by the asof composition")
    val clash = payloadCols.map(_.toLowerCase).intersect(left.columns.map(_.toLowerCase))
    require(clash.isEmpty, s"payload columns clash with left columns: ${clash.mkString(",")}")

    val carryL = left.columns.toSeq.filterNot(c => c == key || c == leftTime)
    // the whole payload travels as ONE nullable struct: the left-side
    // placeholder is a null STRUCT, so genuinely-null payload FIELDS on a
    // matched right row survive (ignoreNulls must not skip them), and all
    // fields always come from the same right row — no tearing across rows
    val payloadStruct = struct(payloadCols.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadCols.map(c => right.schema(c))))
    val l = left.select(
      col(key) +: col(leftTime).as("_t") +: lit(1).as("_tag") +:
        (carryL.map(col) :+ nullStruct.as("_p")): _*)
    val r = right.select(
      col(key) +: col(rightTime).as("_t") +: lit(0).as("_tag") +:
        (carryL.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          payloadStruct.as("_p")): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col(key) +: col("_t").as(leftTime) +: (carryL.map(col) ++
        payloadCols.map(c => col(s"_p.$c").as(c))): _*)
  }
}
