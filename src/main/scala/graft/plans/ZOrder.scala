package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered WRITE layout — the data-layout half of
  * q25's demonstration. `repartitionByRange` on the interleaved key +
  * an intra-partition sort makes every output file cover a narrow
  * rectangle in (x, y) space, so parquet footer min/max stats prune
  * scans filtered on EITHER dimension; a plain 1-D sort clusters one
  * column and shreds the other across every file. This is the layout
  * job a 100 TB table runs at ingest/compaction time (what lakehouse
  * OPTIMIZE ZORDER does); the read side needs nothing special — Spark's
  * parquet source consumes the stats automatically.
  *
  * The interleave is integer div/mod arithmetic generated from one loop
  * for Spark and any SQL oracle (only the integer-division token
  * differs), shared with `Relational.q25_zorder_layout`.
  */
object ZOrder {

  /** 8-bit × 8-bit Morton interleave as portable integer arithmetic: bit
    * b of `x` lands at position 2b, bit b of `y` at 2b+1. `idiv` is the
    * engine's integer-division token (`div` Spark, `//` DuckDB). */
  def zvalExpr(x: String, y: String, idiv: String): String =
    (0 until 8).map { b =>
      s"((($x) $idiv ${1 << b}) % 2) * ${1L << (2 * b)} + " +
        s"((($y) $idiv ${1 << b}) % 2) * ${1L << (2 * b + 1)}"
    }.mkString("(", " + ", ")")

  /** Write `df` z-order-clustered on two integer expressions (each
    * pre-scaled by the caller into 0..255, e.g. `"l_partkey div 8"`).
    * `numFiles` is the target file count — at cluster scale pick
    * `tableBytes / targetFileBytes`. The range exchange samples the
    * z-distribution, so files are balanced even when the key space is
    * occupied unevenly (a fixed bit-prefix bucketing would not be).
    *
    * Keys outside 0..255 fail the WRITE loudly (`raise_error` inside the
    * task): the 8-bit interleave would silently drop their high bits,
    * aliasing distant keys into the same z-range and invisibly
    * destroying the min/max file-skipping property this API exists to
    * provide (ADVICE r5). The guard is a map-side scalar predicate —
    * free relative to the range exchange it precedes. */
  def writeClustered(df: DataFrame, xExpr: String, yExpr: String,
      path: String, numFiles: Int): Unit = {
    // the temp columns below would silently overwrite (and then drop)
    // same-named user columns — data loss with no error (ADVICE r6)
    val clash = df.columns.toSet.intersect(Set("_z", "_zx", "_zy"))
    require(clash.isEmpty,
      s"ZOrder.writeClustered: input already has reserved column(s) ${clash.mkString(", ")} — rename them before clustering")
    df.withColumn("_zx", expr(s"CAST(($xExpr) AS BIGINT)"))
      .withColumn("_zy", expr(s"CAST(($yExpr) AS BIGINT)"))
      .withColumn("_z", expr(
        "IF(_zx BETWEEN 0 AND 255 AND _zy BETWEEN 0 AND 255, " +
          zvalExpr("_zx", "_zy", "div") +
          ", raise_error(CONCAT('ZOrder.writeClustered: key out of 0..255 range: (', " +
          "CAST(_zx AS STRING), ', ', CAST(_zy AS STRING), " +
          "') — pre-scale both key expressions')))"))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z", "_zx", "_zy")
      .write.mode("overwrite").parquet(path)
  }
}
