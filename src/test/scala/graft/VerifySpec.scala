package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins Verify's failure-visibility contract: a broken query must produce
  * a LOUD artifact the driver's checker reports as a red row — never the
  * silent omission that hid v08's round-4 breakage. */
class VerifySpec extends SparkSpec {

  test("dump leaves a loud marker for a failing query, real output for a good one") {
    val out = java.nio.file.Files.createTempDirectory("verify-spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "good" -> ((s, _) => s.range(3).toDF("n")),
      "bad" -> ((_, _) => throw new RuntimeException("deliberate spec failure")))
    Verify.dump(spark, queries, "/unused", out)
    assert(spark.read.parquet(s"$out/good").count() == 3)
    // the failing query must NOT vanish: an empty parquet with the error
    // schema fails schema-compare AND rows-only checks, and _error.txt
    // carries the message
    val bad = spark.read.parquet(s"$out/bad")
    assert(bad.columns.toSeq == Seq("_graft_error"))
    assert(bad.count() == 0)
    val msg = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/bad/_error.txt"))
    assert(msg.contains("deliberate spec failure"))
  }

  test("dump purges stale green output before marking a now-broken query") {
    val out = java.nio.file.Files.createTempDirectory("verify-spec").toString
    Verify.dump(spark,
      Map("q" -> ((s: SparkSession, _: String) => s.range(5).toDF("n"))),
      "/unused", out)
    assert(spark.read.parquet(s"$out/q").count() == 5)
    Verify.dump(spark,
      Map("q" -> ((_: SparkSession, _: String) =>
        throw new RuntimeException("now broken"))),
      "/unused", out)
    val q = spark.read.parquet(s"$out/q")
    assert(q.columns.toSeq == Seq("_graft_error") && q.count() == 0,
      "a stale green result must not survive a failing re-run")
  }
}
