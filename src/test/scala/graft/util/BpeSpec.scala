package graft.util

import graft.SparkSpec

/** BPE trainer/application semantics, and the claim that the SQL
  * `replace`-chain emission agrees with the reference symbol-vector
  * implementation — including the boundary cases where the naive
  * space-joined form silently diverges.
  */
class BpeSpec extends SparkSpec {

  test("trainer replays the textbook Sennrich example deterministically") {
    // low*5 lower*2 newest*6 widest*3: (e,s) and (s,t) both count 9;
    // the lexicographic tie-break picks (e,s), then (es,t) fuses next
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(words, 4)
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")), merges.toString)
    assert(Bpe.train(words, 4) == merges, "training must be deterministic")
    // early stop: a corpus of single-char words has no pairs to merge
    assert(Bpe.train(Seq("a" -> 3L, "b" -> 1L), 8).isEmpty)
  }

  test("marker representation pins symbol boundaries (adversarial cases)") {
    val m = Seq(("a", "b"))
    // bab: symbols [b,a,b] — the space-joined form 'b a b' CONTAINS
    // 'a b' and would wrongly merge; the reference must not
    assert(Bpe.applyMerges("bab", m) == Vector("b", "ab"))
    // abab: adjacent repeats must BOTH merge (space-joined replace
    // consumes the shared delimiter and only merges once)
    assert(Bpe.applyMerges("abab", m) == Vector("ab", "ab"))
    // chained merges build multi-char symbols
    val m2 = Seq(("a", "b"), ("ab", "c"))
    assert(Bpe.applyMerges("abcabc", m2) == Vector("abc", "abc"))
    assert(Bpe.applyMerges("", m) == Vector.empty)
    assert(Bpe.applyMerges("x!", m) == Vector("x"), "normalization strips punctuation")
  }

  test("chain must NOT fire a merge whose right side only PREFIXES the next symbol") {
    // merges (a,t) then (c,a) on 'cat': after (a,t) the symbols are
    // [c, at] — (c,a) must not fire because the next symbol is 'at',
    // not 'a'. A left-marker-only chain ('|c|a' in '|c|at') matched
    // here and produced 1 token instead of 2; the length-prefixed
    // rendering ('|1:a' vs '|2:at') cannot.
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val merges = Seq(("a", "t"), ("c", "a"))
    assert(Bpe.applyMerges("cat", merges) == Vector("c", "at"))
    val got = Seq("cat", "ca", "cata", "catcat").toDF("w")
      .withColumn("n", expr(Bpe.wordCountSpark("w", merges)))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    Seq("cat", "ca", "cata", "catcat").foreach { w =>
      assert(got(w) == Bpe.applyMerges(w, merges).length,
        s"word '$w': SQL ${got(w)} vs reference ${Bpe.applyMerges(w, merges)}")
    }
    // repeat-run segmentation: leftmost pairs, leftover single trails
    val run = Seq(("a", "a"))
    val runs = Seq("aaa", "aaaa", "aaaaa", "aaaaaa").toDF("w")
      .withColumn("n", expr(Bpe.wordCountSpark("w", run)))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    Seq("aaa" -> 2, "aaaa" -> 2, "aaaaa" -> 3, "aaaaaa" -> 3).foreach { case (w, n) =>
      assert(Bpe.applyMerges(w, run).length == n)
      assert(runs(w) == n, s"word '$w': SQL ${runs(w)} vs $n")
    }
  }

  test("Spark replace-chain emission == reference on adversarial + fixture words") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val words = Seq("bab", "abab", "aab", "abba", "the", "data", "table",
      "stream", "scan", "partition", "broadcast", "x", "batchmergesort",
      // right-prefix adversaries vs DefaultMerges (reviewer replication:
      // these diverged under the left-marker-only chain)
      "cat", "her", "pat", "cata", "america", "scat", "therm")
    for (merges <- Seq(Seq(("a", "b")), Bpe.DefaultMerges)) {
      val got = words.toDF("w")
        .withColumn("n", expr(Bpe.wordCountSpark("w", merges)))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      words.foreach { w =>
        assert(got(w) == Bpe.applyMerges(w, merges).length,
          s"word '$w': SQL ${got(w)} vs reference ${Bpe.applyMerges(w, merges)}")
      }
    }
  }

  test("DefaultMerges compress the fixture vocabulary below char count") {
    val sample = Seq("the", "data", "table", "stream", "batch", "merge", "sort")
    val chars = sample.map(_.length).sum
    val toks = sample.map(w => Bpe.applyMerges(w, Bpe.DefaultMerges).length).sum
    assert(toks < chars, s"merges must fire on fixture-shaped words ($toks vs $chars)")
    assert(Bpe.DefaultMerges.size == 32)
  }

  test("packDocuments: bpe tokenizer swaps in; default keeps whitespace counts") {
    import spark.implicits._
    val docs = Seq(
      ("en", 1L, "the data table"),
      ("en", 2L, "stream batch merge sort"),
      ("de", 3L, "scan scan")).toDF("lang", "doc_id", "text")
    val ws = graft.operators.Documents.packDocuments(docs, budget = 4)
      .select("doc_id", "n_toks").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ws == Map(1L -> 3L, 2L -> 4L, 3L -> 2L))
    val bpe = graft.operators.Documents.packDocuments(docs, budget = 4,
        tokenizer = graft.operators.Documents.bpeTokenCount)
      .select("doc_id", "n_toks").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> Seq("the", "data", "table"),
      2L -> Seq("stream", "batch", "merge", "sort"),
      3L -> Seq("scan", "scan"))
      .view.mapValues(_.map(w => Bpe.applyMerges(w, Bpe.DefaultMerges).length.toLong).sum).toMap
    assert(bpe == want, s"bpe n_toks $bpe vs reference $want")
  }
}
