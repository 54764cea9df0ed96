package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ZOrderSpec extends SparkSpec {

  test("z-order clustered write: files are narrow rectangles; 1-D sort is not") {
    import spark.implicits._
    // sf0.01: partkey 0..1999, suppkey 0..99 (sf0.001's 0..9 suppkey
    // range would make every span assertion vacuous)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey")
    val dir = Files.createTempDirectory("zorder").toString + "/li"
    ZOrder.writeClustered(li, "l_partkey div 8", "l_suppkey", dir, numFiles = 16)

    def fileSpans(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max($"l_partkey") - min($"l_partkey")).as("pk_span"),
        (max($"l_suppkey") - min($"l_suppkey")).as("sk_span"))
      .collect().map(r => (r.getAs[Long]("pk_span"), r.getAs[Long]("sk_span")))

    val spans = fileSpans(dir)
    assert(spans.length >= 8, s"expected ~16 files, got ${spans.length}")
    // global spans: partkey 0..1999, suppkey 0..99. 16 quantile ranges
    // over the 16-bit z-value each cover ~2^12 codes ≈ a 512×64
    // rectangle; a range STRADDLING a high-bit boundary unions two
    // rectangles (measured on this data: pk spans 463..1023, sk spans
    // mostly ≤63 with exactly one 99 straddler). Every file must stay
    // well inside the global pk span, and all but a straddler minority
    // inside one sk rectangle — the property footer-stats pruning needs
    // in BOTH dimensions; finer targets come from more files, which is
    // exactly the 100 TB configuration.
    spans.foreach { case (pk, _) =>
      assert(pk <= 1200, s"file partkey span $pk too wide for pruning")
    }
    val narrowSk = spans.count(_._2 <= 64)
    assert(narrowSk >= spans.length - 2,
      s"only $narrowSk/${spans.length} files are suppkey-narrow")
    // contrast: the same data merely SORTED by partkey leaves suppkey
    // unclustered — every file spans (almost) the whole suppkey range
    val sortedDir = Files.createTempDirectory("sorted").toString + "/li"
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(sortedDir)
    val sortedSk = fileSpans(sortedDir).map(_._2)
    assert(sortedSk.count(_ > 80) >= sortedSk.length / 2,
      "baseline unexpectedly clustered suppkey — contrast assertion is vacuous")
    // and the clustered write loses no rows
    assert(spark.read.parquet(dir).count() == li.count())
  }

  test("writeClustered fails LOUDLY on keys outside 0..255 (ADVICE r5)") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 300L)).toDF("x", "y") // y=300 out of range
    val dir = Files.createTempDirectory("zorder-bad").toString + "/out"
    // raise_error surfaces as SparkRuntimeException (USER_RAISED_EXCEPTION),
    // possibly wrapped in a task-failure SparkException — match either
    val e = intercept[Exception] {
      ZOrder.writeClustered(df, "x", "y", dir, numFiles = 2)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("ZOrder.writeClustered")),
      s"expected the range-guard raise_error, got: ${messages(e).mkString(" | ")}")
    // in-range keys still write
    val okDir = Files.createTempDirectory("zorder-ok").toString + "/out"
    ZOrder.writeClustered(Seq((1L, 10L), (2L, 255L)).toDF("x", "y"), "x", "y", okDir, 1)
    assert(spark.read.parquet(okDir).count() == 2)
  }
}
