package graft.sinks

import graft.SparkSpec
import java.nio.file.Files
import java.time.{Clock, Instant, ZoneOffset}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("warehouse sink: database auto-create, overwrite replaces, append adds (K2/K3/K5)") {
    val sink = new WarehouseSink("g_sheets_test")
    val r1 = sink.load(LoadRequest(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t1", incremental = false))
    assert(r1 == "g_sheets_test.t1")
    assert(spark.catalog.databaseExists("g_sheets_test"))
    assert(spark.table("g_sheets_test.t1").count() == 2)

    // full-replace: fewer rows AND a changed schema survive (delete-then-
    // reload semantics, bigquery.py:38-46)
    sink.load(LoadRequest(Seq((9, "z", true)).toDF("id", "v", "flag"), "t1", incremental = false))
    val replaced = spark.table("g_sheets_test.t1")
    assert(replaced.columns.toSeq == Seq("id", "v", "flag"))
    assert(replaced.count() == 1)

    // incremental append
    sink.load(LoadRequest(Seq((10, "y", false)).toDF("id", "v", "flag"), "t1", incremental = true))
    assert(spark.table("g_sheets_test.t1").count() == 2)
  }

  test("warehouse sink rejects non-identifier destinations (injection guard)") {
    val sink = new WarehouseSink("g_sheets_test")
    val df = Seq((1, "a")).toDF("id", "v")
    intercept[IllegalArgumentException](
      sink.load(LoadRequest(df, "a`.`b", incremental = false)))
    intercept[IllegalArgumentException](
      sink.load(LoadRequest(df, "t1; DROP TABLE x", incremental = false)))
  }

  test("csv sink quotes every field (K1, QUOTE_NONNUMERIC on all-string cells)") {
    val dir = Files.createTempDirectory("csvsink").toString
    val sink = new CsvSink(dir)
    sink.load(LoadRequest(Seq(("1", "a b"), ("2", "c,d")).toDF("n", "s"), "out", incremental = false))
    val files = new java.io.File(s"$dir/out").listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val lines = files.flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq.sorted
    assert(lines == Seq("\"1\",\"a b\"", "\"2\",\"c,d\""))
  }

  test("csv sink rejects destinations that escape the output root") {
    val dir = Files.createTempDirectory("csvesc").toString
    val sink = new CsvSink(dir)
    val df = Seq(("1", "a")).toDF("n", "s")
    intercept[IllegalArgumentException](
      sink.load(LoadRequest(df, "../escaped", incremental = false)))
    intercept[IllegalArgumentException](
      sink.load(LoadRequest(df, "a/../../escaped", incremental = false)))
    intercept[IllegalArgumentException](
      sink.load(LoadRequest(df, "/tmp/absolute", incremental = false)))
    // a benign nested destination still works
    val ok = sink.load(LoadRequest(df, "sub/out", incremental = false))
    assert(ok.startsWith(dir))
  }

  test("export filename convention (export.py:14-15)") {
    val clock = Clock.fixed(Instant.parse("2026-08-12T06:30:00Z"), ZoneOffset.UTC)
    assert(CsvSink.fileName("Doc", "Sheet1", "A2:F", clock) == "Doc.Sheet1.A2:F.20260812_063000.csv")
    // empty sheet/range segments drop out (reference defaults sheet='' and
    // cellrange='', export.py:35)
    assert(CsvSink.fileName("Doc", "", "", clock) == "Doc.20260812_063000.csv")
  }

  test("sink registry normalizes target system and rejects unknowns (D1)") {
    val reg = SinkRegistry.default("/tmp/csv")
    assert(reg.resolve("Big Query").isRight)
    assert(reg.resolve("BIGQUERY").isRight)
    assert(reg.resolve("csv").isRight)
    val err = reg.resolve("redshift")
    assert(err == Left("Cannot load to target system: redshift"))
    // extensible: registered sinks resolve under normalized keys
    val reg2 = reg.withSink("S 3", new CsvSink("/tmp/s3"))
    assert(reg2.resolve("s3").isRight)
  }
}
