package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) interchange — the lingua franca of
  * public LLM training corpora (The Pile, C4, RedPajama all ship this
  * shape). Spark's native `json` source is line-delimited already; what
  * this wrapper pins down is the CORPUS CONTRACT that matters at scale:
  *
  *  - **explicit schema on read, always.** Schema inference is a whole
  *    extra pass over the data before the real job starts — harmless on
  *    a fixture, a second 100 TB scan in production. Callers pass the
  *    schema (or use [[documentsSchema]]); nothing here ever infers.
  *  - **loud corrupt-record policy.** Default is FAILFAST — a truncated
  *    upload or a mid-file encoding bug should stop a training-data
  *    build, not silently null out fields (PERMISSIVE's default). The
  *    `quarantine` read keeps bad lines in `_corrupt_record` for triage
  *    instead — choose explicitly, there is no silent middle.
  *  - **bounded file sizes under gzip.** gzip members aren't splittable:
  *    one reader task per file, so the writer repartitions to
  *    `numFiles` BEFORE the write — at 100 TB pick corpus/target-file-
  *    size (same knob as ZOrder.writeClustered). Leave `codec=None`
  *    (plain text) when downstream readers need intra-file splits.
  */
object Jsonl {

  /** The documents-table interchange schema (doc_id, lang, source,
    * n_chars, text) — matches the parquet fixture column for column. */
  def documentsSchema: StructType = StructType.fromDDL(
    "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING")

  /** Write `df` as JSONL under `path`, `numFiles` files, optionally
    * compressed (`codec` = "gzip" | "zstd" | ...). Overwrite semantics:
    * re-running a corpus export replaces it. */
  def write(df: DataFrame, path: String, numFiles: Int = 1,
      codec: Option[String] = Some("gzip")): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val w = df.repartition(numFiles).write.mode(SaveMode.Overwrite)
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Strict read: the full `schema` is required and any malformed line
    * fails the job (FAILFAST) — the default posture for corpus builds. */
  def read(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Quarantine read: malformed lines survive as `_corrupt_record` (all
    * data fields null) so a triage job can count/inspect them; clean
    * rows parse normally. The caller decides what failure rate is
    * tolerable — this read never throws on bad data.
    *
    * Spark restriction: a query that references ONLY `_corrupt_record`
    * against the raw files is disallowed (the parser would have nothing
    * to fail on) — cache or write out the parsed frame before slicing
    * on the corrupt column alone. */
  def readQuarantine(s: SparkSession, path: String, schema: StructType): DataFrame = {
    // schema.add would happily create a duplicate column and the read
    // fails later with a confusing analysis error (ADVICE r6)
    require(!schema.fieldNames.contains("_corrupt_record"),
      "readQuarantine: caller schema must not already define _corrupt_record — it is reserved for the quarantine column")
    val withCorrupt = schema.add("_corrupt_record", "string")
    s.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }
}
