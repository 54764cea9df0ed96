package graft.functions

import graft.SparkSpec
import java.time.Duration

class ParseHumanIntervalSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    ParseHumanInterval.install(spark)
  }

  test("SQL surface parses to DAY TO SECOND interval; invalid → NULL") {
    val rows = spark.sql(
      """SELECT parse_human_interval(s) AS iv FROM VALUES
         ('2 days 3 hours 4 minutes'), ('90 minutes'), ('5 weeks'), ('') t(s)"""
    ).collect()
    assert(rows(0).getAs[Duration](0) == Duration.ofDays(2).plusHours(3).plusMinutes(4))
    assert(rows(1).getAs[Duration](0) == Duration.ofMinutes(90))
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("whole-stage codegen path over a DataFrame column matches the Scala parser") {
    val inputs = Seq("1 day", "12 hours", "1 day 1 minute", "nonsense", "2 weeks")
    val got = inputs.toDF("s")
      .selectExpr("parse_human_interval(s) AS iv")
      .collect()
      .map(r => Option(r.getAs[Duration](0)))
    val want = inputs.map(s => graft.util.HumanInterval.tryParse(s).toOption)
    assert(got.toSeq == want)
  }

  test("wrong arity is rejected at analysis, not silently truncated") {
    val e = intercept[Exception](spark.sql("SELECT parse_human_interval('1 day', '2 days')").collect())
    assert(e.getMessage.contains("exactly 1 argument"))
  }

  test("usable as a relational predicate (P5's SQL face)") {
    val n = Seq("1 hour", "5 seconds", "3 days").toDF("interval")
      .filter("parse_human_interval(interval) IS NOT NULL")
      .count()
    assert(n == 2)
  }
}
