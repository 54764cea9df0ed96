package graft

/** Scratch timing harness (test scope, not shipped): splits d05's isolated
  * cost into the pairs build vs the CC loop, same JVM. Run with
  * `Test/runMain graft.CCProbe [sfDir]`.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    var t = System.nanoTime()
    val p = pipeline.NearDup.pairs(docs)
    println(s"[ccprobe] pairs rows=${p.count()} secs=${(System.nanoTime() - t) / 1e9}")
    t = System.nanoTime()
    val c = pipeline.NearDup.clusters(docs)
    println(s"[ccprobe] clusters rows=${c.count()} secs=${(System.nanoTime() - t) / 1e9}")
    // second call: everything retained — registry-hit economics
    t = System.nanoTime()
    pipeline.NearDup.clusters(docs).count()
    println(s"[ccprobe] clusters(warm) secs=${(System.nanoTime() - t) / 1e9}")
    spark.stop()
  }
}
