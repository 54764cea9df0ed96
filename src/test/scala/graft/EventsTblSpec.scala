package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Pins [[QueryHelpers.eventsTbl]]'s cross-engine timestamp contract on
  * REAL parquet fixtures, including the pre-1970 sub-microsecond corner
  * the r8 ADVICE flagged: DuckDB's epoch floor semantics round toward
  * negative infinity, while a naive `div 1000` truncates toward zero, so
  * a value like -1500 ns must land on -2 µs (floor), not -1 µs (trunc).
  *
  * Empirically verified branch coverage on Spark 4.1.2 (this spec IS the
  * verification): a TIMESTAMP(NANOS) parquet column — either
  * isAdjustedToUTC flavor — reads as BIGINT under
  * `spark.sql.legacy.parquet.nanosAsLong=true` and is PARQUET_TYPE_ILLEGAL
  * without it. It NEVER surfaces as TimestampNTZType on this build, so
  * eventsTbl's NTZ branch only ever sees micros-precision NTZ data (the
  * driver testdata's actual layout, `timestamp[us]` + adjusted=false),
  * where "already floored to micros" holds trivially — there is no
  * sub-microsecond remainder left to floor. The LongType branch carries
  * the floor correction and is pinned here against DuckDB's values.
  */
class EventsTblSpec extends SparkSpec {

  /** nanos → micros with floor semantics, the oracle's epoch_ns div. */
  private def floorMicros(nanos: Long): Long = Math.floorDiv(nanos, 1000L)

  // pre-1970 non-whole-microsecond values on both sides of each boundary
  private val nanoValues =
    Seq(-1500L, -1001L, -1000L, -999L, -1L, 0L, 1L, 999L, 1000L, 1500L)

  private def writeNanosFixture(dir: java.io.File, adjustedToUtc: Boolean): Unit = {
    def purge(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(purge)
      f.delete()
    }
    purge(dir)
    dir.mkdirs()
    val schema = MessageTypeParser.parseMessageType(
      s"message events { required int64 ts (TIMESTAMP(NANOS,$adjustedToUtc)); " +
        "required int64 event_id; }")
    val w = ExampleParquetWriter
      .builder(new Path(new java.io.File(dir, "events.parquet").toString))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    nanoValues.zipWithIndex.foreach { case (v, i) =>
      val g = gf.newGroup()
      g.add("ts", v)
      g.add("event_id", i.toLong)
      w.write(g)
    }
    w.close()
  }

  test("LongType branch floors pre-1970 nanos to micros like DuckDB epoch_ns") {
    val dir = new java.io.File("target/test-fixtures/nanos-events")
    writeNanosFixture(dir, adjustedToUtc = false)
    val raw = spark.read.parquet(new java.io.File(dir, "events.parquet").toString)
    assert(raw.schema("ts").dataType == LongType,
      "nanosAsLong=true must surface TIMESTAMP(NANOS) as BIGINT on Spark 4.1")
    val got = QueryHelpers.eventsTbl(spark, dir.toString)
      .select(col("event_id"), unix_micros(col("ts")).as("um"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    nanoValues.zipWithIndex.foreach { case (v, i) =>
      assert(got(i) == floorMicros(v),
        s"$v ns must floor to ${floorMicros(v)} µs (DuckDB), got ${got(i)}")
    }
  }

  test("TIMESTAMP(NANOS) can never reach the NTZ branch on this Spark build") {
    // Without the legacy conf the read is rejected outright — so the NTZ
    // branch cannot receive nanos data whose sub-microsecond floor was
    // decided by Spark. Checked on an independent session so the shared
    // suite session's conf is untouched.
    val dir = new java.io.File("target/test-fixtures/nanos-events-utc")
    writeNanosFixture(dir, adjustedToUtc = true)
    val ns = spark.newSession()
    ns.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val e = intercept[Exception] {
      ns.read.parquet(new java.io.File(dir, "events.parquet").toString).schema
    }
    assert(causeMessages(e).exists(_.contains("PARQUET_TYPE_ILLEGAL")),
      s"expected PARQUET_TYPE_ILLEGAL, got: ${causeMessages(e).mkString(" | ")}")
  }

  test("NTZ branch is instant-exact for micros data incl. pre-1970") {
    // the driver testdata's actual layout: timestamp[us], adjusted=false
    // → Spark reads TimestampNTZType natively. Session TZ is UTC, so the
    // NTZ→TZ cast must preserve the exact micros value.
    val dir = new java.io.File("target/test-fixtures/micros-events")
    def purge(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(purge)
      f.delete()
    }
    purge(dir)
    val micros = Seq(-2L, -1L, 0L, 1L, -1000001L, 1000001L)
    import spark.implicits._
    micros.zipWithIndex.toDF("us", "event_id")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"), col("event_id"))
      .coalesce(1)
      .write.mode("overwrite").parquet(new java.io.File(dir, "events.parquet").toString)
    val raw = spark.read.parquet(new java.io.File(dir, "events.parquet").toString)
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"fixture must read back NTZ, got ${raw.schema("ts").dataType}")
    val got = QueryHelpers.eventsTbl(spark, dir.toString)
      .select(col("event_id"), unix_micros(col("ts")).as("um"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    micros.zipWithIndex.foreach { case (v, i) =>
      assert(got(i) == v, s"NTZ cast must be instant-exact: $v µs → got ${got(i)}")
    }
  }
}
