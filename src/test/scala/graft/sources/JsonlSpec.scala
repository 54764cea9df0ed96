package graft.sources

import graft.SparkSpec

class JsonlSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .selectExpr("doc_id", "lang", "source", "CAST(n_chars AS BIGINT) AS n_chars", "text")

  test("documents roundtrip JSONL byte-faithfully, gzip and plain") {
    for (codec <- Seq(Some("gzip"), None)) {
      val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/docs"
      Jsonl.write(docs, dir, numFiles = 3, codec = codec)
      val back = Jsonl.read(spark, dir, Jsonl.documentsSchema)
      assert(back.schema == Jsonl.documentsSchema)
      val a = docs.collect().map(_.toSeq).toSet
      val b = back.collect().map(_.toSeq).toSet
      assert(a == b, s"roundtrip diverged under codec=$codec (${a.size} vs ${b.size} rows)")
      // gzip writes one member per partition: file count == numFiles
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(files.length == 3, s"expected 3 part files, got ${files.length}")
    }
  }

  test("strict read FAILFASTs on a corrupt line; quarantine read keeps it") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/bad"
    Jsonl.write(docs.limit(5), dir, numFiles = 1, codec = None)
    // append a malformed line to the single part file
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val fw = new java.io.FileWriter(part, true)
    fw.write("{\"doc_id\": oops not json\n")
    fw.close()
    // the local FS keeps a .crc sidecar per file; the manual append
    // invalidates it and Hadoop would fail the READ with a checksum
    // error before the JSON parser ever sees the line — drop it (a real
    // corrupt upload arrives without Hadoop checksums)
    new java.io.File(part.getParent, "." + part.getName + ".crc").delete()
    val strict = intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, dir, Jsonl.documentsSchema).collect()
    }
    assert(strict.getMessage.contains("MALFORMED_RECORD") ||
      strict.toString.contains("Malformed") || strict.getCause != null)
    // materialize before slicing on the corrupt column: Spark disallows
    // corrupt-only-column queries on raw JSON (see readQuarantine doc)
    val rows = Jsonl.readQuarantine(spark, dir, Jsonl.documentsSchema).collect()
    val (bad, good) = rows.partition(r => !r.isNullAt(r.fieldIndex("_corrupt_record")))
    assert(bad.length == 1, s"exactly the planted line quarantines, got ${bad.length}")
    assert(good.length == 5, "clean rows parse normally")
  }
}
