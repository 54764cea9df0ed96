package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming MG sketch keeps the batch operator's guarantee after
  * chunked replay through the ledgered delivery: merged estimates never
  * overcount, undercount within n/(C+1), every true heavy hitter
  * survives — and a checkpoint-preserving re-run is a no-op (the ledger
  * absorbs replayed batches instead of double-counting summaries).
  */
class SketchStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming heavy-hitter summaries keep the MG bound; replay is a no-op") {
    val C = 64
    // token stream = the same stream t03/t11 read, split into 4 chunks
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split($"text", " ")).as("tok"))
    val dir = Files.createTempDirectory("tok-replay").toString
    (0 until 4).foreach { c =>
      toks.filter(pmod(xxhash64($"tok"), lit(4)) === c)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val ckpt = Files.createTempDirectory("tok-ckpt").toString
    val db = "g_sketch"
    val table = "hh_sigs"
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")

    def deliverOnce(checkpoint: String): Unit = {
      val src = spark.readStream
        .schema(toks.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
      val q = graft.sinks.StreamingDelivery.startToWarehouse(
        SketchStreams.heavyHitterSummaries(src, C), table, checkpoint, db,
        Trigger.AvailableNow())
      q.awaitTermination()
    }
    deliverOnce(ckpt)

    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (C + 1)
    def merged(): Map[String, Long] =
      SketchStreams.mergedHeavyHitters(spark, db, table)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = merged()
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"'$t' overcounted: $e > ${exact(t)}")
      assert(exact(t) - e <= bound, s"'$t' undercount ${exact(t) - e} > $bound")
    }
    exact.filter(_._2 > bound).foreach { case (t, c) =>
      assert(est.contains(t), s"heavy hitter '$t' (n=$c, bound=$bound) missing")
    }
    assert(exact.exists(_._2 > bound), "fixture must exercise the guarantee")

    // same checkpoint, unchanged source: offsets are committed, nothing
    // re-processes — merged estimates unchanged
    deliverOnce(ckpt)
    assert(merged() == est, "committed-offset re-run must not change the merge")

    // FROM-SCRATCH replay (fresh checkpoint, unchanged source): batch ids
    // restart at 0 and reproduce, so every append hits the `_batch_id`
    // ledger guard — this is the path that would double-count without it
    deliverOnce(Files.createTempDirectory("tok-ckpt2").toString)
    assert(merged() == est, "ledger must absorb a from-scratch replay, not double-count")
  }
}
