package graft.streaming

import graft.SparkSpec
import graft.QueryHelpers.eventsTbl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming rolling WAU == batch e15 on a chunked file replay: same
  * observed days, same exact distinct counts, each day exactly once.
  */
class WauStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming rolling WAU equals batch e15 across a 4-chunk replay") {
    val dir = Files.createTempDirectory("waureplay").toString
    val ev = eventsTbl(spark, sf).select($"ts", $"user_id")
    val maxTs = ev.agg(max($"ts")).collect()(0).getTimestamp(0).toInstant
    val chunked = ev.withColumn("chunk",
      ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy($"ts")))
    (1 to 4).foreach { c =>
      chunked.filter($"chunk" === c).drop("chunk")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    // far-future sentinel closes every real day; its own day is dropped
    // from the comparison (it IS observed, 10 days past the real data,
    // so none of its 7 contribution days overlap real ones)
    val sentinelTs = java.sql.Timestamp.from(maxTs.plusSeconds(10 * 86400))
    val sentinelDay = sentinelTs.toInstant.atZone(java.time.ZoneOffset.UTC)
      .toLocalDate.toString
    Seq((sentinelTs, -1L)).toDF("ts", "user_id")
      .coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = WauStream.rollingWau(src).writeStream
      .format("memory").queryName("waustream").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val gotRows = spark.table("waustream").filter($"day" =!= sentinelDay).collect()
    val got = gotRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotRows.length == got.size, "a day was emitted more than once")

    val want = graft.Catalog.byName("e15_rolling_wau").run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("wau")).toMap
    assert(got == want, {
      val onlyB = want.keySet.diff(got.keySet).take(3)
      val onlyS = got.keySet.diff(want.keySet).take(3)
      s"WAU mismatch; batch-only=$onlyB stream-only=$onlyS " +
        s"diffs=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}"
    })
  }
}
