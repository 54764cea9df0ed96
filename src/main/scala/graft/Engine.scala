package graft

import graft.control.{CsvControlTable, CsvRunLog, JobRunner}
import graft.sinks.SinkRegistry
import org.apache.spark.sql.SparkSession
import java.nio.file.Path

/** X2 — explicit lifecycle (SURVEY §2.1). The reference authorizes
  * clients, opens the control document and creates the warehouse dataset
  * AT IMPORT TIME (`flusher/__init__.py:15-20`, `bigquery.py:11-16`,
  * `manager.py:217-218`), which makes it untestable and fragile
  * (token-expiry gap acknowledged at `__init__.py:19`). Here nothing
  * happens until `Engine.start(...)` wires the components against an
  * existing SparkSession, and the warehouse database is created lazily at
  * first load.
  */
final case class EngineConfig(
    sourceRoot: Path,
    controlPath: Path,
    runLogPath: Path,
    csvOutDir: String,
    identity: String = "graft-engine",
    maxConcurrentJobs: Int = 1)

final class Engine private[graft] (val spark: SparkSession, val runner: JobRunner)
    extends AutoCloseable {
  /** One scheduler cycle; returns the number of jobs executed. */
  def pollOnce(): Int = runner.pollOnce()

  /** The daemon loop (L1); bound `maxCycles` for batch/test use. */
  def run(pollMillis: Long = 1000L, maxCycles: Option[Int] = None): Unit =
    runner.run(pollMillis, maxCycles)

  /** L1, streaming form: the poll loop as a Structured Streaming query —
    * Spark owns cadence, restarts and progress monitoring. */
  def runStreaming(pollInterval: String = "1 second")
      : org.apache.spark.sql.streaming.StreamingQuery =
    runner.runStreaming(pollInterval)

  /** Streaming document ingestion under this engine's session
    * ([[graft.pipeline.StreamingCuration]]): quality gate → exact dedup →
    * near-dup (signature-history probe + batch CC) → ledgered warehouse
    * append. Restartable from `checkpointDir` — the `_batch_id` ledger
    * makes replayed batches no-ops, so the daemon and the ingestion
    * stream can crash and resume independently. */
  def startCuration(docs: org.apache.spark.sql.DataFrame, table: String,
      checkpointDir: String,
      database: String = graft.sinks.WarehouseSink.DefaultDatabase,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.pipeline.StreamingCuration.start(docs, table, checkpointDir,
      database, trigger = trigger)

  /** Release the engine-retained caches (shingle/pair tables — see
    * [[CacheRegistry]]). The SparkSession is the caller's and stays up. */
  def close(): Unit = CacheRegistry.unpersistAll()
}

object Engine {
  def start(spark: SparkSession, config: EngineConfig): Engine = {
    val control = new CsvControlTable(config.controlPath)
    val runLog = new CsvRunLog(config.runLogPath)
    val registry = SinkRegistry.default(config.csvOutDir)
    new Engine(spark, new JobRunner(spark, control, registry,
      config.sourceRoot, runLog, config.identity,
      maxConcurrent = config.maxConcurrentJobs))
  }
}
