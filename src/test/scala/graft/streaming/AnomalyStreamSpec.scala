package graft.streaming

import graft.SparkSpec
import graft.QueryHelpers.eventsTbl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming rolling-anomaly == batch e18 on a chunked file replay: the
  * same (type, hour) rows, the same exact z doubles and integer-decided
  * flags — and each scored hour exactly once, so the stream is directly
  * appendable as an alert feed.
  */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketing follows the session zone: half-hour offsets shift the hour boundaries") {
    // batch e18 truncates in the SESSION timezone; the stream must
    // agree even where the zone offset is not a whole hour — in
    // Asia/Kolkata (+05:30) the hour containing 00:45Z starts at
    // 00:30Z, not 00:00Z. Direct kernel check via TestGroupState.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def pendingKeys(zone: String): Set[Long] = {
      val st = TestGroupState.create[AnomalyStream.St](
        optionalState = org.apache.spark.api.java.Optional.empty(),
        timeoutConf = GroupStateTimeout.EventTimeTimeout,
        batchProcessingTimeMs = 0L,
        eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(0L),
        hasTimedOut = false)
      val ts = java.sql.Timestamp.from(java.time.Instant.parse("2020-01-01T00:45:00Z"))
      AnomalyStream.process(java.time.ZoneId.of(zone))(
        "t", Iterator(AnomalyStream.Ev(ts, "t")), st).toList
      st.get._2.keySet
    }
    val utcHour = java.time.Instant.parse("2020-01-01T00:00:00Z").getEpochSecond * 1000000L
    val istHour = java.time.Instant.parse("2020-01-01T00:30:00Z").getEpochSecond * 1000000L
    assert(pendingKeys("UTC") == Set(utcHour))
    assert(pendingKeys("Asia/Kolkata") == Set(istHour),
      "the +05:30 zone's hour bucket must start at :30 UTC")
  }

  test("streaming anomaly detection equals batch e18 across a 4-chunk replay") {
    val dir = Files.createTempDirectory("anomreplay").toString
    val ev = eventsTbl(spark, sf).select($"ts", $"event_type")
    val maxTs = ev.agg(max($"ts")).collect()(0).getTimestamp(0).toInstant
    val chunked = ev.withColumn("chunk",
      ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy($"ts")))
    (1 to 4).foreach { c =>
      chunked.filter($"chunk" === c).drop("chunk")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    // far-future sentinel (own type) advances the watermark so every
    // real hour finalizes; its own series never reaches a full ring
    Seq(Tuple2(java.sql.Timestamp.from(maxTs.plusSeconds(10 * 86400)), "_sentinel"))
      .toDF("ts", "event_type")
      .coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[AnomalyStream.Ev]
    val q = AnomalyStream.anomalies(src).writeStream
      .format("memory").queryName("anomstream").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("anomstream")
      .filter($"event_type" =!= "_sentinel")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))))
      .toMap
    val want = graft.Catalog.byName("e18_rolling_anomaly").run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))))
      .toMap

    assert(spark.table("anomstream").filter($"event_type" =!= "_sentinel").count() ==
      got.size, "an hour was scored more than once")
    assert(got == want, {
      val onlyB = want.keySet.diff(got.keySet).take(3)
      val onlyS = got.keySet.diff(want.keySet).take(3)
      s"mismatch; batch-only=$onlyB stream-only=$onlyS " +
        s"diffs=${want.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}"
    })
    // the fixture must genuinely exercise the flag through the stream
    assert(got.values.exists(_._3), "no anomaly flagged in the streamed fixture")
    assert(got.values.exists(!_._3), "everything flagged — degenerate fixture")
  }
}
