package graft.sinks

import graft.SparkSpec
import graft.streaming.EventStreams
import java.nio.file.Files

/** Idempotent streaming delivery: a replayed micro-batch (same batchId)
  * must not duplicate rows in the warehouse table — the streaming analog
  * of the reference's append load (`bigquery.py:42-47`). */
class StreamingDeliverySpec extends SparkSpec {
  import spark.implicits._

  private val db = "stream_wh_test"

  private def mkSource: String = {
    val dir = Files.createTempDirectory("sdsrc").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // two files → two micro-batches under maxFilesPerTrigger=1
    Seq((1L, ts(0), 7L, "click", 1.0), (2L, ts(1), 7L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, ts(2), 8L, "purchase", 3.0), (4L, ts(3), 8L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    dir
  }

  private def replay(srcDir: String, table: String): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    // EventStreams transform → warehouse, per the delivery contract
    val q = StreamingDelivery.startToWarehouse(
      EventStreams.dedupEvents(src), table,
      Files.createTempDirectory("sdcp").toString, database = db)
    q.awaitTermination()
  }

  test("replaying a file stream twice leaves the warehouse duplicate-free") {
    val srcDir = mkSource
    replay(srcDir, "events_delivered")
    val tbl = s"`$db`.`events_delivered`"
    val n1 = spark.table(tbl).count()
    assert(n1 == 4L, "first delivery lands every source row")

    // fresh checkpoint → Spark replays the same files as the same batch
    // ids; the _batch_id ledger must swallow them
    replay(srcDir, "events_delivered")
    assert(spark.table(tbl).count() == n1, "replay must not duplicate rows")

    // the ledger records one id per micro-batch (2 files → 2 batches)
    val ids = spark.table(tbl).select(StreamingDelivery.BatchIdCol)
      .distinct().as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L), s"unexpected batch ids: $ids")
  }

  test("delivery appends into a pre-existing unpartitioned ledger table") {
    val srcDir = mkSource
    // a table created before partitioned delivery existed (or by another
    // writer): appends must adopt ITS layout, not crash on a spec mismatch
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    Seq((99L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "click", 0.5, 999L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", StreamingDelivery.BatchIdCol)
      .write.mode("overwrite").format("parquet").saveAsTable(s"`$db`.`events_legacy`")
    replay(srcDir, "events_legacy")
    assert(spark.table(s"`$db`.`events_legacy`").count() == 5L,
      "1 legacy row + 4 delivered rows")
  }

  test("checkpoint reset over a grown source fails loudly instead of losing rows") {
    val srcDir = mkSource
    replay(srcDir, "events_grown")
    // the source grows, the checkpoint is lost, and the fresh run batches
    // everything into batch 0 — whose id the ledger already holds
    Seq((5L, java.sql.Timestamp.valueOf("2024-01-01 10:04:00"), 9L, "click", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir) // no maxFilesPerTrigger: all files land in batch 0
    val q = StreamingDelivery.startToWarehouse(
      EventStreams.dedupEvents(src), "events_grown",
      Files.createTempDirectory("sdcp").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("delivery ledger disagree")),
      s"expected ledger-mismatch error, got: ${causeMessages(e)}")
  }

  test("a foreign table without the ledger column fails with a clear error") {
    val srcDir = mkSource
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    Seq((1L, "x")).toDF("id", "v")
      .write.mode("overwrite").format("parquet").saveAsTable(s"`$db`.`no_ledger`")
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = StreamingDelivery.startToWarehouse(
      src, "no_ledger", Files.createTempDirectory("sdcp").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(causeMessages(e).exists(_.contains("ledger column")),
      s"expected missing-ledger error, got: ${causeMessages(e)}")
  }

  test("destination identifiers are validated before any SQL runs") {
    val srcDir = mkSource
    val src = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = StreamingDelivery.startToWarehouse(
      src, "bad`name", Files.createTempDirectory("sdcp").toString, database = db)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("invalid destination table") ||
      Option(e.getCause).exists(_.getMessage.contains("invalid destination table")))
  }
}
