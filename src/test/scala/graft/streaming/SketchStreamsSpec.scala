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

  /** The events stream the HLL/KLL summary tests replay: day/user_id/
    * event_type/value pre-projected to plain types (the raw parquet is
    * TIMESTAMP(NANOS) — this mirrors what an ingest job would emit),
    * written as 4 user-hash chunks. */
  private def writeEventChunks(): (org.apache.spark.sql.DataFrame, String) = {
    val ev = graft.QueryHelpers.eventsTbl(spark, sf)
      .select(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"user_id", $"event_type", $"value")
    val dir = Files.createTempDirectory("ev-replay").toString
    (0 until 4).foreach { c =>
      ev.filter(pmod(xxhash64($"user_id"), lit(4)) === c)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    (ev, dir)
  }

  private def deliverSummaries(src: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType, dir: String,
      table: String, db: String, checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = graft.sinks.StreamingDelivery.startToWarehouse(
      src(stream), table, checkpoint, db, Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("streaming HLL DAU summaries merge to within 5% of exact; replay is a no-op") {
    val (ev, dir) = writeEventChunks()
    val db = "g_sketch"
    val table = "dau_sigs"
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val ckpt = Files.createTempDirectory("dau-ckpt").toString
    deliverSummaries(SketchStreams.dauSummaries(_), ev.schema, dir, table, db, ckpt)
    // user-hash chunking puts every day in EVERY chunk — the merge must
    // union partials across batches, not just concatenate disjoint days
    val exact = ev.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def merged(): Map[String, Long] =
      SketchStreams.mergedDau(spark, db, table)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = merged()
    assert(est.keySet == exact.keySet)
    est.foreach { case (d, e) =>
      val x = exact(d).toDouble
      assert(math.abs(e - x) / x <= 0.05, s"day $d: hll $e vs exact $x drifts > 5%")
    }
    // committed-offset re-run, then from-scratch replay: both no-ops
    deliverSummaries(SketchStreams.dauSummaries(_), ev.schema, dir, table, db, ckpt)
    assert(merged() == est)
    deliverSummaries(SketchStreams.dauSummaries(_), ev.schema, dir, table, db,
      Files.createTempDirectory("dau-ckpt2").toString)
    assert(merged() == est, "ledger must absorb a from-scratch replay, not double-count")
  }

  test("streaming KLL percentile summaries merge to ±2% rank error vs e10b's exact; replay is a no-op") {
    val (ev, dir) = writeEventChunks()
    val db = "g_sketch"
    val table = "kll_sigs"
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    val ckpt = Files.createTempDirectory("kll-ckpt").toString
    deliverSummaries(SketchStreams.valuePercentileSummaries(_), ev.schema, dir, table, db, ckpt)
    val vals = ev.select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    def merged(): Map[String, (Long, Double, Double, Double)] =
      SketchStreams.mergedValuePercentiles(spark, db, table)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // the same rank-interval gate batch e10 is held to vs e10b (the
    // exact dual): the sketch's value must occupy a rank within ±2% of
    // the target percentile in the exact sorted data
    def gate(est: Map[String, (Long, Double, Double, Double)]): Unit = {
      assert(est.keySet == vals.keySet)
      for ((k, sorted) <- vals;
           (p, av) <- Seq(0.50 -> est(k)._2, 0.95 -> est(k)._3, 0.99 -> est(k)._4)) {
        val n = sorted.length
        assert(est(k)._1 == n, s"$k merged n")
        val lo = sorted.count(_ < av) + 1
        val hi = sorted.count(_ <= av)
        val target = p * n
        val tol = 0.02 * n
        assert(hi >= target - tol && lo <= target + tol,
          s"$k p=$p kll=$av occupies ranks [$lo,$hi], target $target +- $tol of n=$n")
      }
    }
    gate(merged())
    // the ledger-level no-op is the DETERMINISTIC claim: re-delivery
    // must leave the stored summary rows unchanged. The merged estimates
    // are NOT exactly reproducible call-to-call — KLL compaction draws
    // from the library's process-wide java.util.Random once a merge
    // exceeds level capacity — so exact equality of merged() outputs
    // would be a flaky over-assertion; assert the stored rows instead
    // and re-gate the rank bound on a fresh merge.
    def ledger(): Seq[(String, Seq[Byte])] =
      spark.table(s"`$db`.`$table`").select($"event_type", $"kll").collect()
        .map(r => (r.getString(0), r.getAs[Array[Byte]]("kll").toSeq))
        .sortBy(x => (x._1, x._2.mkString(",")))
    val rows0 = ledger()
    deliverSummaries(SketchStreams.valuePercentileSummaries(_), ev.schema, dir, table, db, ckpt)
    assert(ledger() == rows0, "committed-offset re-run must not change the ledger")
    deliverSummaries(SketchStreams.valuePercentileSummaries(_), ev.schema, dir, table, db,
      Files.createTempDirectory("kll-ckpt2").toString)
    assert(ledger() == rows0, "ledger must absorb a from-scratch replay, not double-count")
    gate(merged())
  }
}
