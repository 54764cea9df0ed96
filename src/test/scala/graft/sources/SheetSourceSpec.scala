package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** E2e coverage for the sheet-export read path (SURVEY §7 "minimum
  * end-to-end slice", FIXTURES.md A.3): all-string cells, header row,
  * A1 slicing incl. a >26-column sheet (exercising true base-26 column
  * arithmetic where the reference's base-25 bug would misaddress), and
  * autodetect-style schema inference.
  */
class SheetSourceSpec extends SparkSpec {

  private def writeCsv(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("sheet").toFile
    val f = new java.io.File(dir, "sheet.csv")
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println)
    w.close()
    f.getAbsolutePath
  }

  test("full-sheet scan: all cells strings, row order preserved (S1)") {
    val path = writeCsv(Seq("a,b", "1,x", "2,y"))
    val df = SheetSource.readRaw(spark, path)
    assert(df.schema.fields.filter(_.name != SheetSource.RowCol)
      .forall(_.dataType.typeName == "string"))
    val rows = df.orderBy(SheetSource.RowCol).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "1", "2"))
    assert(rows.map(_.getAs[Long](SheetSource.RowCol)).toSeq == Seq(1L, 2L, 3L))
  }

  test("A1 range scan slices columns and rows; >26 columns hit true base-26 (S2)") {
    // 30 columns: A..AD. The reference's base-25 math reads 'AB' as col 51
    // (export.py:23); true base-26 says 28 — this fixture would misslice
    // under the bug.
    val header = (1 to 30).map(i => s"h$i").mkString(",")
    val row = (i: Int) => (1 to 30).map(c => s"r${i}c$c").mkString(",")
    val path = writeCsv(header +: (1 to 5).map(row))
    // AB2:AD4 = columns 28..30, rows 2..4
    val df = SheetSource.read(spark, path, cellRange = Some("AB2:AD4"))
    assert(df.columns.toSeq == Seq("_c27", "_c28", "_c29"))
    val got = df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(got == Seq("r1c28|r1c29|r1c30", "r2c28|r2c29|r2c30", "r3c28|r3c29|r3c30"))
  }

  test("open-ended range reads to the sheet's last row without counting (S3)") {
    val path = writeCsv(Seq("h1,h2,h3", "1,a,x", "2,b,y", "3,c,z"))
    val df = SheetSource.read(spark, path, cellRange = Some("A2:B"))
    assert(df.columns.length == 2)
    assert(df.count() == 3)
  }

  test("whole-column range A:C selects columns for all rows") {
    val path = writeCsv(Seq("a,b,c,d", "1,2,3,4", "5,6,7,8"))
    val df = SheetSource.read(spark, path, cellRange = Some("A:C"))
    assert(df.columns.length == 3)
    assert(df.count() == 3) // header row included: A:C starts at row 1
  }

  test("range bounds clamp to the sheet: end row/col past the data") {
    val path = writeCsv(Seq("a,b", "1,x", "2,y"))
    val df = SheetSource.read(spark, path, cellRange = Some("A2:Z999"))
    assert(df.columns.length == 2) // col slice clamps to sheet width
    assert(df.count() == 2)        // row filter simply matches nothing past EOF
  }

  test("range starting past the sheet width is rejected with a clear error") {
    val path = writeCsv(Seq("a,b", "1,x"))
    val e = intercept[IllegalArgumentException](
      SheetSource.read(spark, path, cellRange = Some("Z1:AA")))
    assert(e.getMessage.contains("sheet has 2"))
  }

  test("header promotion sanitizes names; inference types columns like autodetect (K4)") {
    val path = writeCsv(Seq(
      "id,price,active,born,seen at,note,blank",
      "1,1.5,true,2020-01-02,2020-01-02 10:00:00,hello,",
      "2,2.25,false,2021-03-04,2021-03-04 11:30:00,world,",
      "3,99,true,2022-05-06,2022-05-06 12:45:00,,"))
    val df = SheetSource.read(spark, path, header = true, infer = true)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("id") == "long")
    assert(types("price") == "double")
    assert(types("active") == "boolean")
    assert(types("born") == "date")
    assert(types("seen_at") == "timestamp")
    assert(types("note") == "string")
    assert(types("blank") == "string") // all-empty: no evidence, stays string
    assert(df.count() == 3)
    // empty cells become true nulls after inference
    assert(df.filter(df("note").isNull).count() == 1)
  }

  test("slice + header + infer compose (the flusher job shape)") {
    val path = writeCsv(Seq(
      "junk,junk,junk,junk",
      "x,id,qty,y",
      "x,1,10,y",
      "x,2,20,y"))
    val df = SheetSource.read(spark, path, cellRange = Some("B2:C"), header = true, infer = true)
    assert(df.columns.toSeq == Seq("id", "qty"))
    assert(df.schema.fields.forall(_.dataType.typeName == "long"))
    assert(df.agg(org.apache.spark.sql.functions.sum("qty")).collect()(0).getLong(0) == 30L)
  }
}
