package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import java.time.{Clock, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Load destinations (SURVEY.md §2.1 K1–K3, K5, D1). The reference's only
  * real sink is a BigQuery dataset `g_sheets` with delete-then-reload vs
  * append semantics (`/root/reference/flusher/load/bigquery.py:9,42-47`);
  * here that maps to Spark catalog tables. A CSV sink mirrors the
  * intermediate file the reference always materializes
  * (`export.py:59-66`) for export-only jobs (no Target System,
  * `manager.py:193`).
  */
final case class LoadRequest(df: DataFrame, destination: String, incremental: Boolean)

trait Sink {
  /** Load and return the human-readable result string (the reference
    * returns `"dataset.table"`, `bigquery.py:28`). */
  def load(req: LoadRequest): String
}

/** K2/K3/K5: Spark-catalog warehouse sink. Non-incremental load is
  * `SaveMode.Overwrite` — for a datasource table this drops and recreates
  * with the NEW schema, matching the reference's delete-then-reload +
  * re-autodetect (`bigquery.py:38-39,45-46`); incremental appends
  * (`bigquery.py:45-46`). The database is auto-created like the dataset
  * bootstrap (`bigquery.py:13-16`) — but lazily at load, not at import
  * (explicit lifecycle, SURVEY §2.1 X2).
  */
final class WarehouseSink(database: String = WarehouseSink.DefaultDatabase) extends Sink {
  def load(req: LoadRequest): String = {
    // destination comes from a free-text control cell — reject anything
    // that isn't a plain identifier instead of interpolating it into
    // quoted SQL (a backtick or dot would break out of the quoting and
    // redirect the load)
    WarehouseSink.requireIdent(database, "database")
    WarehouseSink.requireIdent(req.destination, "destination table")
    val spark = req.df.sparkSession
    // Cross-process durability: warehouse FILES outlive the in-memory
    // catalog, so a fresh JVM can meet a table directory it has no
    // entry for (the daemon's restart path; caught by the scripted
    // packaged-jar smoke on its second run — saveAsTable throws
    // LOCATION_ALREADY_EXISTS). BigQuery parity demands both modes keep
    // working across scheduler restarts (`bigquery.py:38-46`): a full
    // replace clears the orphan (it is about to be overwritten anyway —
    // CoLocated's r4 discipline), an append RE-ADOPTS it by registering
    // the surviving location so new rows continue the table.
    val loc = graft.plans.CoLocated.tableLocation(spark, database, req.destination)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ident = s"`$database`.`${req.destination}`"
    // tableExists must see the BACKTICKED name: requireIdent allows
    // digit-only destinations ('2024'), which the multipart-identifier
    // parser lexes as an integer literal unless quoted
    val exists = spark.catalog.tableExists(ident)
    val orphan = !exists && fs.exists(loc)
    if (!req.incremental) {
      // clear both restart shapes: the bare orphan (files, no entry) and
      // a table a previous APPEND re-adopted (external entry at the
      // managed location — Overwrite would drop it without its files,
      // then recreate managed on the non-empty directory and throw)
      if (orphan || (exists &&
          WarehouseSink.isAdoptedExternal(spark, database, req.destination, loc)))
        graft.plans.CoLocated.clearTable(spark, database, req.destination)
    } else if (orphan) {
      // re-adopt with the INCOMING schema spelled out: inference would
      // fail forever on a directory holding only _temporary/_SUCCESS
      // leftovers of a crashed write (underscore-prefixed entries are
      // invisible to inference and scans alike, so an empty adoption is
      // still a valid continuation point)
      spark.sql(s"CREATE TABLE $ident (${req.df.schema.toDDL}) " +
        s"USING parquet LOCATION '${loc.toString}'")
    }
    val mode = if (req.incremental) SaveMode.Append else SaveMode.Overwrite
    req.df.write.mode(mode).format("parquet").saveAsTable(ident)
    s"$database.${req.destination}"
  }
}

object WarehouseSink {
  /** `bigquery.py:9` — the reference's single hard-coded dataset. */
  val DefaultDatabase = "g_sheets"

  private val Ident = "^[A-Za-z0-9_]+$".r
  private[graft] def requireIdent(s: String, what: String): Unit =
    if (!Ident.matches(s))
      throw new IllegalArgumentException(
        s"invalid $what '$s': only letters, digits and _ are allowed")

  /** True iff `database.table` is an EXTERNAL entry whose location is the
    * database's own managed slot for that name — i.e. a table the
    * incremental branch re-adopted after a restart, not a user-registered
    * foreign table (those keep Spark's stock Overwrite semantics: entry
    * replaced, foreign files untouched). */
  private[sinks] def isAdoptedExternal(spark: org.apache.spark.sql.SparkSession,
      database: String, table: String, managedLoc: org.apache.hadoop.fs.Path): Boolean = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(database)))
    val fs = managedLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL &&
      fs.makeQualified(new org.apache.hadoop.fs.Path(meta.location)) ==
        fs.makeQualified(managedLoc)
  }
}

/** K1: CSV sink with all-cells-quoted output. The reference writes
  * `QUOTE_NONNUMERIC`, and since every gspread cell is a string, every
  * field ends up quoted in practice (`export.py:62`; SURVEY §2.1 K1) —
  * `quoteAll` reproduces the observed files.
  */
final class CsvSink(baseDir: String, header: Boolean = false) extends Sink {
  def load(req: LoadRequest): String = {
    // destination comes from a free-text control cell — resolve and pin
    // it under baseDir so a '../' (or absolute) value cannot redirect the
    // write outside the configured output root (same untrusted-cell
    // discipline as WarehouseSink.requireIdent)
    val base = java.nio.file.Paths.get(baseDir).toAbsolutePath.normalize
    val path = base.resolve(req.destination).normalize
    if (!path.startsWith(base) || path == base)
      throw new IllegalArgumentException(
        s"invalid destination '${req.destination}': escapes the CSV output directory")
    val mode = if (req.incremental) SaveMode.Append else SaveMode.Overwrite
    req.df.write.mode(mode)
      .option("quoteAll", "true")
      .option("header", header.toString)
      .csv(path.toString)
    path.toString
  }
}

object CsvSink {
  private val TsFmt = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  /** The reference's export filename convention
    * `document.sheet.cellrange.YYYYMMDD_HHmmss.csv` (`export.py:14-15`).
    * Clock injected for testability. */
  def fileName(document: String, sheet: String, cellRange: String,
      clock: Clock = Clock.systemUTC()): String =
    Seq(document, sheet, cellRange, TsFmt.format(clock.instant()))
      .filter(_.nonEmpty).mkString(".") + ".csv"
}

/** D1: dispatch on the control row's `Target System`, normalized with
  * `lower` + strip-spaces exactly like `manager.py:52-53`; unknown targets
  * surface the reference's NotImplemented message (`manager.py:55-58`).
  */
final class SinkRegistry(sinks: Map[String, Sink]) {
  def resolve(targetSystem: String): Either[String, Sink] = {
    val key = SinkRegistry.normalize(targetSystem)
    sinks.get(key).toRight(s"Cannot load to target system: $targetSystem")
  }
  def withSink(name: String, sink: Sink): SinkRegistry =
    new SinkRegistry(sinks + (SinkRegistry.normalize(name) -> sink))
}

object SinkRegistry {
  def normalize(s: String): String = s.toLowerCase.replace(" ", "")

  /** Default registry: the warehouse sink answers to both its native name
    * and the reference's `bigquery` spelling (a flusher user's control
    * rows keep working unchanged). */
  def default(csvDir: String): SinkRegistry = new SinkRegistry(Map(
    "bigquery" -> new WarehouseSink(),
    "warehouse" -> new WarehouseSink(),
    "csv" -> new CsvSink(csvDir)))
}
