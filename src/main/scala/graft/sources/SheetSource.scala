package graft.sources

import graft.util.A1Notation
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sheet-style source: reads CSV-as-sheet (every cell a string, like
  * gspread's `get_all_values`, `/root/reference/flusher/export.py:50-56`),
  * with an optional A1 rectangular slice and an optional schema-inference
  * pass for warehouse-autodetect parity
  * (`/root/reference/flusher/load/bigquery.py:21-22`).
  *
  * Covers SURVEY.md §2.1 S1 (full scan), S2 (range scan = column
  * projection + row slice), S3 (open-ended range: no upper row bound) and
  * K4 (schema autodetect). The zero-egress environment has no live sheet
  * API, so local CSV directories emulate sheet semantics (SURVEY §4.2c).
  *
  * Row order: sheet rows are numbered by `zipWithIndex` over the ordered
  * CSV read — per-partition offsets are computed once (one lightweight
  * count job), indices stay distributed, and the numbering is stable
  * across re-reads regardless of partition count — unlike
  * `monotonically_increasing_id`, which is partition-local (SURVEY §7
  * risk 2).
  */
object SheetSource {

  /** 1-based sheet row number column carried by raw reads. */
  val RowCol = "_sheet_row"

  /** Read the whole sheet untyped: all-string columns `_c0.._cN` plus
    * [[RowCol]]. S1 — `export.py:53-57`. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .csv(path)
    // CSV read may infer non-string nothing — header=false & inferSchema
    // default off gives all-string already; enforce anyway for safety.
    val allString = raw.select(raw.schema.fieldNames.map(f => col(f).cast("string")): _*)
    val schema = StructType(allString.schema.fields :+ StructField(RowCol, LongType, nullable = false))
    val withIdx = allString.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withIdx, schema)
  }

  /** Apply an A1 range: column slice + row filter. Open-ended ranges
    * (`"A2:F"`) simply omit the upper row bound — no `count()` needed
    * (S3, `export.py:47-48`). */
  def slice(sheet: DataFrame, cellRange: String): DataFrame = {
    val r = A1Notation.parseRange(cellRange)
    val dataCols = sheet.columns.filter(_ != RowCol)
    require(r.startCol <= dataCols.length,
      s"range '$cellRange' starts at column ${r.startCol} but sheet has ${dataCols.length}")
    val picked = dataCols.slice(r.startCol - 1, math.min(r.endCol, dataCols.length))
    val rowOk = r.endRow match {
      case Some(end) => col(RowCol).between(r.startRow, end.toLong)
      case None      => col(RowCol) >= r.startRow
    }
    sheet.filter(rowOk).select(col(RowCol) +: picked.map(col): _*)
  }

  /** Promote the first row of the (sliced) sheet to column names —
    * sanitized and deduplicated by the shared [[HeaderNames]] rule (same
    * names as the DSv2 connector for the same sheet). */
  def promoteHeader(sheet: DataFrame): DataFrame = {
    val ordered = sheet.orderBy(col(RowCol))
    val first = ordered.limit(1).collect()
    require(first.nonEmpty, "cannot promote header of an empty sheet")
    val dataCols = sheet.columns.filter(_ != RowCol)
    val headerVals = dataCols.map { c =>
      Option(first(0).get(sheet.columns.indexOf(c))).map(_.toString).getOrElse("")
    }
    val names = HeaderNames.sanitize(headerVals.toSeq)
    val headerRow = first(0).getAs[Long](sheet.columns.indexOf(RowCol))
    ordered.filter(col(RowCol) > headerRow)
      .select(col(RowCol) +: dataCols.zip(names).map { case (c, n) => col(c).as(n) }: _*)
  }

  /** Candidate types in warehouse-autodetect priority order (K4 parity
    * with BigQuery CSV autodetect: INT64 → FLOAT64 → BOOL → DATE →
    * TIMESTAMP → STRING). */
  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$"

  /** One-pass schema inference over all-string columns: for each column,
    * a single aggregation counts non-empty cells that FAIL each candidate
    * cast (`try_cast`); the narrowest all-pass type wins. Empty cells stay
    * null. One job regardless of column count.
    */
  def inferSchema(sheet: DataFrame): DataFrame = {
    val dataCols = sheet.columns.filter(_ != RowCol)
    if (dataCols.isEmpty) return sheet
    def nonEmpty(c: String) = col(c).isNotNull && trim(col(c)) =!= ""
    def fails(c: String, t: String) = expr(s"try_cast(`$c` AS $t)").isNull && nonEmpty(c)
    val checks = dataCols.flatMap { c =>
      Seq(
        sum(when(nonEmpty(c), 1L).otherwise(0L)).as(s"$c#n"),
        sum(when(fails(c, "BIGINT"), 1L).otherwise(0L)).as(s"$c#long"),
        sum(when(fails(c, "DOUBLE"), 1L).otherwise(0L)).as(s"$c#double"),
        sum(when(fails(c, "BOOLEAN"), 1L).otherwise(0L)).as(s"$c#boolean"),
        // cast-to-date accepts trailing time-of-day, so DATE additionally
        // requires the bare yyyy-MM-dd shape
        sum(when(fails(c, "DATE") || (nonEmpty(c) && !trim(col(c)).rlike(DateRe)), 1L)
          .otherwise(0L)).as(s"$c#date"),
        sum(when(fails(c, "TIMESTAMP"), 1L).otherwise(0L)).as(s"$c#timestamp"))
    }
    val stats = sheet.agg(checks.head, checks.tail: _*).collect()(0)
    def failed(c: String, t: String): Long = stats.getAs[Long](s"$c#$t")
    val casts = dataCols.map { c =>
      val t =
        if (stats.getAs[Long](s"$c#n") == 0L) "string" // all-empty: no evidence
        else if (failed(c, "long") == 0L) "long"
        else if (failed(c, "double") == 0L) "double"
        else if (failed(c, "boolean") == 0L) "boolean"
        else if (failed(c, "date") == 0L) "date"
        else if (failed(c, "timestamp") == 0L) "timestamp"
        else "string"
      if (t == "string") when(nonEmpty(c), col(c)).otherwise(lit(null)).cast("string").as(c)
      else expr(s"try_cast(`$c` AS $t)").as(c)
    }
    sheet.select(col(RowCol) +: casts: _*)
  }

  /** Full sheet-export read: optional A1 slice → optional header promote →
    * optional schema inference → drop the internal row column. This is the
    * engine's equivalent of `export.to_csv` + autodetect load fused into
    * one plan (SURVEY §3.4).
    */
  def read(
      spark: SparkSession,
      path: String,
      cellRange: Option[String] = None,
      header: Boolean = false,
      infer: Boolean = false): DataFrame = {
    val raw = readRaw(spark, path)
    val sliced = cellRange.map(slice(raw, _)).getOrElse(raw)
    val headed = if (header) promoteHeader(sliced) else sliced
    val typed = if (infer) inferSchema(headed) else headed
    typed.drop(RowCol)
  }
}
