package graft.sources.v2

import graft.control.CsvCodec
import graft.util.A1Notation
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._
import scala.util.Try

/** DataSource V2 "sheet" format (SURVEY §4.2c): a sheet-semantics
  * connector — all-string cells, A1 range addressing, header promotion,
  * autodetect typing — readable as
  *
  * {{{
  * spark.read.format("sheet")
  *   .option("range", "B2:AD")    // optional A1 slice
  *   .option("header", "true")    // first row of the slice names columns
  *   .option("inferSchema", "true")
  *   .load("/path/to/sheet.csv")
  * }}}
  *
  * Zero-egress environment: local CSV files stand in for the live sheet
  * API (same emulation as [[graft.sources.SheetSource]]); the connector
  * boundary is exactly where a real Sheets HTTP client would slot in.
  *
  * Scan design: `SupportsPushDownRequiredColumns` prunes at the CELL
  * level — unprojected columns are never type-converted (the reference's
  * server-side range fetch, `export.py:50`, is the same idea: move only
  * the cells you need). A sheet is ONE ordered file, so the scan is one
  * `InputPartition`: row order is part of sheet semantics and sheets are
  * small by nature — the big-data path in this engine is parquet, not
  * sheets. Columns without a header are named by their A1 letters.
  */
class SheetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sheet"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SheetDataSource.resolve(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    SheetDataSource.resolve(new CaseInsensitiveStringMap(properties))
}

object SheetDataSource {
  /** Name of the row-number metadata column (1-based sheet row) — shared
    * with the v1 reader so the two readers expose ONE column name. */
  val RowCol: String = graft.sources.SheetSource.RowCol

  private[v2] object SheetRowColumn extends MetadataColumn {
    override def name: String = RowCol
    override def dataType: DataType = LongType
    override def comment: String = "1-based sheet row number"
  }

  // fraction accepts 0..9 digits — the inference regex admits micro/nano
  // precision, so the converter must parse everything inference accepts
  private val TsFmt = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
    .toFormatter
  private val DateRe = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val TsRe = "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$".r

  /** Geometry + typing of one sheet read, computed once on the driver and
    * shipped to the reader. 0-based column offsets are relative to the
    * RAW file row; rows are 1-based sheet rows. */
  final case class SheetSpec(
      path: String,
      colOffsets: Seq[Int],
      dataStartRow: Long,
      endRow: Option[Long],
      schema: StructType) extends Serializable {
    /** A real data column named `_sheet_row` shadows the metadata column
      * everywhere — table surface, filter pushdown, reader — so the
      * shadow decision lives HERE, once (schema names are stored exactly
      * as promoted, so exact match is the right test). */
    def rowColIsData: Boolean = schema.fieldNames.contains(RowCol)
  }

  /** resolve() is memoized on (options, file mtime+size): Spark calls
    * inferSchema and getTable separately per load, which would otherwise
    * read + type-infer the whole file twice on the driver. A file edit
    * changes the key, so stale tables aren't served. */
  private val resolveCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Boolean, Boolean, Long, Long), SheetTable]()

  def resolve(options: CaseInsensitiveStringMap): SheetTable = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("sheet source requires a path"))
    val header = options.getBoolean("header", false)
    val infer = options.getBoolean("inferSchema", false)
    val rangeOpt = Option(options.get("range")).map(_.trim).filter(_.nonEmpty)
    val f = new java.io.File(path)
    val key = (path, rangeOpt.getOrElse(""), header, infer, f.lastModified(), f.length())
    resolveCache.computeIfAbsent(key, _ => resolveUncached(path, rangeOpt, header, infer))
  }

  private def resolveUncached(path: String, rangeOpt: Option[String],
      header: Boolean, infer: Boolean): SheetTable = {
    val rows = readRows(path)
    require(rows.nonEmpty, s"empty sheet: $path")
    val width = rows.map(_.length).max

    val (cols, startRow, endRow) = rangeOpt match {
      case Some(r) =>
        val cr = A1Notation.parseRange(r)
        require(cr.startCol <= width, s"range '$r' starts past sheet width $width")
        ((cr.startCol - 1) until math.min(cr.endCol, width),
          cr.startRow.toLong, cr.endRow.map(_.toLong))
      case None => (0 until width, 1L, None)
    }

    val sliced = rows.zipWithIndex
      .filter { case (_, i) =>
        val rn = i + 1L
        rn >= startRow && endRow.forall(rn <= _)
      }
      .map { case (cells, _) => cols.map(c => if (c < cells.length) cells(c) else "") }

    val (names, dataRows, dataStartRow) =
      if (header) {
        require(sliced.nonEmpty, "header requested on an empty range")
        (graft.sources.HeaderNames.sanitize(sliced.head), sliced.tail, startRow + 1)
      } else
        (cols.map(c => A1Notation.colLetters(c + 1)), sliced, startRow)

    val types: Seq[DataType] =
      if (infer) cols.indices.map(i => inferColumn(dataRows.iterator.map(_(i))))
      else cols.map(_ => StringType)

    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    }.toSeq)
    new SheetTable(SheetSpec(path, cols, dataStartRow, endRow, schema))
  }

  private[v2] def readRows(path: String): Vector[Seq[String]] = {
    val src = scala.io.Source.fromFile(path)
    try src.getLines().map(CsvCodec.parseLine).toVector
    finally src.close()
  }

  /** Autodetect priority (K4 parity): BIGINT → DOUBLE → BOOLEAN → DATE →
    * TIMESTAMP → STRING over non-empty cells; all-empty stays string. */
  private def inferColumn(values: Iterator[String]): DataType = {
    var sawAny = false
    var okLong, okDouble, okBool, okDate, okTs = true
    values.foreach { v0 =>
      val v = v0.trim
      if (v.nonEmpty) {
        sawAny = true
        if (okLong) okLong = Try(v.toLong).isSuccess
        if (okDouble) okDouble = Try(v.toDouble).isSuccess
        if (okBool) okBool = v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")
        if (okDate) okDate = DateRe.matches(v) && Try(LocalDate.parse(v)).isSuccess
        if (okTs) okTs = TsRe.matches(v)
      }
    }
    if (!sawAny) StringType
    else if (okLong) LongType
    else if (okDouble) DoubleType
    else if (okBool) BooleanType
    else if (okDate) DateType
    else if (okTs) TimestampType
    else StringType
  }

  /** Convert one trimmed cell to Spark's internal representation.
    * Degenerate-cell rule, shared with `SheetSource.inferSchema`'s string
    * branch: trim-then-null-if-empty — a whitespace-only cell is null in
    * BOTH readers (they advertise identical semantics for the same
    * physical sheet); a non-empty string keeps its original spacing. */
  private[v2] def convert(v: String, t: DataType): Any = {
    val s = v.trim
    if (s.isEmpty) null
    else t match {
      case StringType    => UTF8String.fromString(v)
      case LongType      => s.toLong
      case DoubleType    => s.toDouble
      case BooleanType   => s.equalsIgnoreCase("true")
      case DateType      => LocalDate.parse(s).toEpochDay.toInt
      case TimestampType =>
        val ldt = LocalDateTime.parse(s.replace('T', ' '), TsFmt)
        ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case other => throw new IllegalStateException(s"unsupported sheet type $other")
    }
  }
}

final class SheetTable(spec: SheetDataSource.SheetSpec) extends Table
  with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"sheet:${spec.path}"
  override def schema(): StructType = spec.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SheetScanBuilder(spec)
  // 1-based sheet row number, surfaced only when referenced (Spark's
  // metadata-column contract) — the filterable axis for row pushdown.
  // A sheet that carries a REAL column of this name shadows the
  // metadata column entirely (no row pushdown either): the data column
  // must keep data semantics.
  override def metadataColumns(): Array[MetadataColumn] =
    if (spec.rowColIsData) Array.empty
    else Array(SheetDataSource.SheetRowColumn)
}

/** Pushdown on BOTH sheet axes, completing parity with the reference's
  * server-side A1 range fetch (`export.py:50` moves only the requested
  * cells): columns are pruned at the cell level, and row-number
  * predicates on `_sheet_row` narrow the scan's row window so filtered
  * rows are never parsed, converted, or emitted. Accepted filters are
  * consumed entirely (not re-evaluated post-scan); anything not a simple
  * `_sheet_row` bound is left to Spark. */
final class SheetScanBuilder(spec: SheetDataSource.SheetSpec)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = spec.schema
  private var startRow: Long = spec.dataStartRow
  private var endRow: Option[Long] = spec.endRow
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  private def lower(v: Long): Unit = startRow = math.max(startRow, v)
  private def upper(v: Long): Unit = endRow = Some(endRow.fold(v)(math.min(_, v)))

  private def accept(f: Filter): Boolean = if (spec.rowColIsData) false else f match {
    case GreaterThan(SheetDataSource.RowCol, v: Number) => lower(v.longValue + 1); true
    case GreaterThanOrEqual(SheetDataSource.RowCol, v: Number) => lower(v.longValue); true
    case LessThan(SheetDataSource.RowCol, v: Number) => upper(v.longValue - 1); true
    case LessThanOrEqual(SheetDataSource.RowCol, v: Number) => upper(v.longValue); true
    case EqualTo(SheetDataSource.RowCol, v: Number) => lower(v.longValue); upper(v.longValue); true
    case IsNotNull(SheetDataSource.RowCol) => true // row numbers are never null
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(accept)
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    SheetScan(spec.copy(dataStartRow = startRow, endRow = endRow), required)
}

final case class SheetScan(spec: SheetDataSource.SheetSpec, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SheetScan ${spec.path} cols=${required.fieldNames.mkString(",")} " +
      s"rows=${spec.dataStartRow}..${spec.endRow.map(_.toString).getOrElse("end")}"
  // one ordered partition — sheet row order is part of the contract
  override def planInputPartitions(): Array[InputPartition] = Array(SheetPartition(spec))
  override def createReaderFactory(): PartitionReaderFactory =
    SheetReaderFactory(spec, required)
}

final case class SheetPartition(spec: SheetDataSource.SheetSpec) extends InputPartition

final case class SheetReaderFactory(spec: SheetDataSource.SheetSpec, required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SheetReader(spec, required)
}

/** Streams the sheet rows, converting ONLY the pruned-to columns;
  * `_sheet_row` fields are served from the row counter, not the cells. */
final class SheetReader(spec: SheetDataSource.SheetSpec, required: StructType)
  extends PartitionReader[InternalRow] {

  // -1 marks the _sheet_row metadata field; a DATA column of that name
  // takes precedence (the metadata column is shadowed, see SheetSpec)
  private val fieldIdx: Array[Int] = required.fieldNames.map {
    case SheetDataSource.RowCol if !spec.rowColIsData => -1
    case n => spec.schema.fieldIndex(n)
  }
  private val rows = SheetDataSource.readRows(spec.path).iterator.zipWithIndex
    .filter { case (_, i) =>
      val rn = i + 1L
      rn >= spec.dataStartRow && spec.endRow.forall(rn <= _)
    }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!rows.hasNext) false
    else {
      val (cells, i) = rows.next()
      val rn = i + 1L
      val values = fieldIdx.map { fi =>
        if (fi < 0) rn
        else {
          val c = spec.colOffsets(fi)
          val raw = if (c < cells.length) cells(c) else ""
          SheetDataSource.convert(raw, spec.schema.fields(fi).dataType)
        }
      }
      current = InternalRow.fromSeq(values.toIndexedSeq)
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
