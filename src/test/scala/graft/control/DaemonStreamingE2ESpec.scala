package graft.control

import graft.{Engine, EngineConfig, SparkSpec}
import graft.pipeline.StreamingCuration
import graft.sinks.StreamingDelivery
import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** End-to-end daemon + streaming-ingestion integration (VERDICT r4 item 6):
  * one [[Engine]] drives BOTH long-lived surfaces at once — the scheduler
  * poll loop as a streaming query (`runStreaming`, delivering a sheet job
  * through [[graft.sinks.WarehouseSink]]) and the document-curation
  * ingestion stream (`startCuration`) — then the ingestion stream is
  * STOPPED MID-STREAM and restarted from its checkpoint while the daemon
  * keeps polling. Proves, under the daemon rather than in isolation:
  *
  *   - the `_batch_id` ledger spans restarts — batches processed before
  *     the stop are not re-delivered after it (curated AND `_sigs` table);
  *   - `_input_rows` stamps record each batch's own pre-curation size;
  *   - the near-dup signature history survives the restart (a post-restart
  *     doc is dropped against a PRE-restart doc's signature);
  *   - the two queries share one session without interfering: the sheet
  *     job lands with its control-table state machine intact.
  */
class DaemonStreamingE2ESpec extends SparkSpec {
  import spark.implicits._

  private val db = "daemon_e2e"

  // 20 unique tokens → 18 3-token shingles; one interior edit kills
  // exactly 3, so Jaccard(docA, docAlike) = 15/21 ≈ 0.71 ≥ the 0.5 gate
  private val docA = (1 to 20).map(i => s"a$i").mkString(" ")
  private val docB = (1 to 20).map(i => s"b$i").mkString(" ")
  private val docAlike =
    (1 to 20).map(i => if (i == 7) "zz" else s"a$i").mkString(" ")

  test("daemon poll stream + curation stream run together and survive a mid-stream restart") {
    // --- engine wiring: sheet source, control table with one due job
    val root = Files.createTempDirectory("docs")
    val sheetDoc = Files.createDirectory(root.resolve("SalesDoc"))
    Files.write(sheetDoc.resolve("Sheet1.csv"), "id,amount\n1,10.5\n2,20.25\n".getBytes)
    val ctlPath = Files.createTempFile("ctl", ".csv")
    CsvControlTable.init(ctlPath, Seq(Seq(
      "SalesDoc", "Sheet1", "", "warehouse", "daemon_sales", "", "yes",
      "", "", "", "")))
    val runLogPath = Files.createTempFile("runlog", ".csv")
    Files.delete(runLogPath)
    val engine = Engine.start(spark, EngineConfig(
      sourceRoot = root, controlPath = ctlPath, runLogPath = runLogPath,
      csvOutDir = Files.createTempDirectory("csvout").toString))

    // --- streaming source + checkpoint shared across the restart
    val srcDir = Files.createTempDirectory("e2esrc").toString
    val ckpt = Files.createTempDirectory("e2eckpt").toString
    def feed(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir)
    def stream() = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val daemon = engine.runStreaming("200 milliseconds")
    try {
      // phase 1: two files → two micro-batches, then the query stops
      // (AvailableNow) — a deterministic "mid-stream" stop: the
      // checkpoint says batches 0-1 are done, the stream is not.
      feed(1L -> docA, 2L -> docA, 3L -> "short") // batch 0: dup + gate victim
      feed(4L -> docB)                            // batch 1
      engine.startCuration(stream(), "daemon_docs", ckpt, database = db)
        .awaitTermination()
      val tbl = s"`$db`.`daemon_docs`"
      assert(spark.table(tbl).select("doc_id").as[Long].collect().sorted.toSeq
        == Seq(1L, 4L), "pre-restart survivors")

      // phase 2: new data lands while the ingestion query is DOWN (the
      // daemon keeps polling); restart from the same checkpoint
      feed(5L -> docAlike, // near-dup of PRE-restart doc 1 — sig history must drop it
           6L -> docA)     // exact dup of PRE-restart doc 1 — fingerprint anti-join
      engine.startCuration(stream(), "daemon_docs", ckpt, database = db)
        .awaitTermination()

      val rows = spark.table(tbl)
        .select(col("doc_id").as[Long],
          col(StreamingDelivery.BatchIdCol).as[Long],
          col(StreamingCuration.InputRowsCol).as[Long]).collect().sortBy(_._1)
      // ledger spans the restart: batches 0-1 not re-delivered, batch 2 is
      // new; doc 5 dies on the persisted signature history, doc 6 on the
      // fingerprint anti-join — nothing post-restart survives
      assert(rows.map(_._1).toSeq == Seq(1L, 4L), s"post-restart rows: ${rows.toSeq}")
      assert(rows.map(r => r._1 -> r._2).toMap == Map(1L -> 0L, 4L -> 1L),
        "each survivor still carries its original batch id")
      // _input_rows is per-batch pre-curation input, not a global count
      assert(rows.map(r => r._1 -> r._3).toMap == Map(1L -> 3L, 4L -> 1L),
        s"per-batch input stamps: ${rows.toSeq}")

      // the signature history is ledgered across the restart too: docs
      // 1, 4 (batches 0-1) and 5, 6's batch appended exactly once
      val sigs = spark.table(s"`$db`.`daemon_docs${StreamingCuration.SigSuffix}`")
        .select(col("doc_id").as[Long], col(StreamingDelivery.BatchIdCol).as[Long])
        .collect().sortBy(_._1)
      assert(sigs.map(_._1).toSeq == Seq(1L, 4L, 5L),
        s"sig history holds every exact-deduped candidate once: ${sigs.toSeq}")
      assert(sigs.map(_._2).toSeq == Seq(0L, 1L, 2L), "sig rows keep their batch ids")

      // the daemon, polling throughout, delivered the sheet job with its
      // control-table lifecycle intact
      val deadline = System.currentTimeMillis() + 30000
      val ct = new CsvControlTable(ctlPath)
      while (System.currentTimeMillis() < deadline &&
        ct.jobs().head.state != StateMachine.Success) Thread.sleep(100)
      assert(ct.jobs().head.state == StateMachine.Success)
      assert(spark.table("g_sheets.daemon_sales").count() == 2)
    } finally daemon.stop()
  }
}
