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

  test("warehouse sink survives an orphaned table location (cross-JVM restart parity)") {
    // A previous PROCESS leaves the managed table directory behind while
    // this JVM's in-memory catalog has no entry for it — the daemon's
    // restart path, first caught live by tools/smoke_jar_deploy.sh's
    // second run (saveAsTable: LOCATION_ALREADY_EXISTS). Simulate the
    // orphan by writing parquet at the managed location directly.
    val sink = new WarehouseSink("g_sheets_orph")
    val loc = graft.plans.CoLocated.tableLocation(spark, "g_sheets_orph", "t_orph")
    Seq((1, "old"), (2, "older")).toDF("id", "v")
      .write.mode("overwrite").parquet(loc.toString)
    assert(!spark.catalog.tableExists("g_sheets_orph.t_orph"))
    // full replace clears the orphan and lands the new shape
    sink.load(LoadRequest(Seq((5, "new")).toDF("id", "v"), "t_orph", incremental = false))
    assert(spark.table("g_sheets_orph.t_orph").as[(Int, String)].collect().toSet ==
      Set((5, "new")))
    // now orphan it AGAIN and append: the sink must re-adopt the
    // surviving rows, not fail and not clobber them (BigQuery parity:
    // appends continue the table across scheduler restarts). Dropping a
    // MANAGED table deletes its files, so stash a copy and restore it —
    // files-present-catalog-empty is exactly the restart state.
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(from).iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val locPath = java.nio.file.Paths.get(new java.net.URI(loc.toString).getPath)
    val stash = Files.createTempDirectory("orphstash")
    copyTree(locPath, stash)
    spark.sql("DROP TABLE `g_sheets_orph`.`t_orph`")
    assert(!spark.catalog.tableExists("g_sheets_orph.t_orph"))
    copyTree(stash, locPath)
    sink.load(LoadRequest(Seq((6, "appended")).toDF("id", "v"), "t_orph", incremental = true))
    assert(spark.table("g_sheets_orph.t_orph").as[(Int, String)].collect().toSet ==
      Set((5, "new"), (6, "appended")))
    // the re-adopted entry is EXTERNAL at the managed location; a later
    // full replace must clear it rather than letting Overwrite drop the
    // entry (files survive an external drop) and then throw
    // LOCATION_ALREADY_EXISTS recreating a managed table on the
    // non-empty directory — the replace-after-restart-append cycle
    sink.load(LoadRequest(Seq((7, "replaced")).toDF("id", "v"), "t_orph", incremental = false))
    assert(spark.table("g_sheets_orph.t_orph").as[(Int, String)].collect().toSet ==
      Set((7, "replaced")))
    // and the replacement is a normal managed table again: append works
    sink.load(LoadRequest(Seq((8, "more")).toDF("id", "v"), "t_orph", incremental = true))
    assert(spark.table("g_sheets_orph.t_orph").count() == 2)
  }

  test("warehouse sink re-adopts an orphan holding only crash leftovers (no readable footers)") {
    // a previous JVM died mid-write leaving _temporary/_SUCCESS junk (or
    // nothing at all) at the managed location: schema inference has no
    // footer to read, so adoption must carry the INCOMING frame's schema
    val sink = new WarehouseSink("g_sheets_junk")
    val loc = graft.plans.CoLocated.tableLocation(spark, "g_sheets_junk", "t_junk")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc, "_temporary/0"))
    fs.create(new org.apache.hadoop.fs.Path(loc, "_SUCCESS")).close()
    assert(!spark.catalog.tableExists("g_sheets_junk.t_junk"))
    sink.load(LoadRequest(Seq((1, "a")).toDF("id", "v"), "t_junk", incremental = true))
    assert(spark.table("g_sheets_junk.t_junk").as[(Int, String)].collect().toSet ==
      Set((1, "a")))
  }

  test("warehouse sink accepts digit-only destinations (requireIdent permits them)") {
    // '2024' lexes as an integer literal in an unquoted multipart
    // identifier — every catalog probe must use the backticked form
    val sink = new WarehouseSink("g_sheets_test")
    val r = sink.load(LoadRequest(Seq((1, "a")).toDF("id", "v"), "2024", incremental = false))
    assert(r == "g_sheets_test.2024")
    sink.load(LoadRequest(Seq((2, "b")).toDF("id", "v"), "2024", incremental = true))
    assert(spark.table("g_sheets_test.`2024`").count() == 2)
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
