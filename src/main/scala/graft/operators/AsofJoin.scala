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
    require(!(left.columns ++ payloadCols).exists(c => c == "_t" || c == "_tag"),
      "column names _t/_tag are reserved by the asof composition")
    require(payloadCols.intersect(left.columns).isEmpty,
      s"payload columns clash with left columns: ${payloadCols.intersect(left.columns).mkString(",")}")
    val carryL = left.columns.toSeq.filterNot(c => c == key || c == leftTime)
    val l = left.select(
      col(key) +: col(leftTime).as("_t") +: lit(1).as("_tag") +:
        (carryL.map(col) ++
          payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right.select(
      col(key) +: col(rightTime).as("_t") +: lit(0).as("_tag") +:
        (carryL.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payloadCols.map(col)): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(col(key) +: col("_t") +: col("_tag") +: (carryL.map(col) ++
        payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
      .filter(col("_tag") === 1)
      .withColumnRenamed("_t", leftTime)
      .drop("_tag")
  }
}
