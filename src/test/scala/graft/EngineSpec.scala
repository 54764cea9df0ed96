package graft

import java.nio.file.Files
import graft.control.{CsvControlTable, JobSpec}

/** X2: nothing happens at construction; Engine.start wires components and
  * a poll cycle drives a job end to end. */
class EngineSpec extends SparkSpec {

  test("Engine.start has no side effects until pollOnce drives a job") {
    val root = Files.createTempDirectory("engdocs")
    val doc = Files.createDirectory(root.resolve("Doc"))
    Files.write(doc.resolve("S1.csv"), "k,v\n1,a\n2,b\n".getBytes)
    val ctl = Files.createTempFile("engctl", ".csv")
    CsvControlTable.init(ctl, Seq(Seq(
      "Doc", "S1", "", "warehouse", "engine_t1", "", "yes", "", "", "", "")))
    val logPath = Files.createTempFile("englog", ".csv")
    Files.delete(logPath)

    val engine = Engine.start(spark, EngineConfig(
      sourceRoot = root, controlPath = ctl, runLogPath = logPath,
      csvOutDir = Files.createTempDirectory("engcsv").toString))
    // wiring alone created nothing
    assert(!spark.catalog.tableExists("g_sheets.engine_t1"))

    assert(engine.pollOnce() == 1)
    assert(spark.table("g_sheets.engine_t1").count() == 2)
    // second cycle: job is no longer due (Refresh Now cleared, no interval)
    assert(engine.pollOnce() == 0)

    // close() is the session-teardown hook for engine-retained caches
    import spark.implicits._
    graft.pipeline.NearDup.pairs(
      Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")).count()
    assert(CacheRegistry.entries.nonEmpty, "near-dup machinery retains caches")
    engine.close()
    assert(CacheRegistry.entries.isEmpty, "Engine.close releases every retained cache")
  }
}
