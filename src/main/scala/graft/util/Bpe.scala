package graft.util

/** Byte-pair encoding — the public subword-tokenization algorithm
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): train a merge list by repeatedly fusing
  * the most frequent adjacent symbol pair, then tokenize by replaying
  * the merges in training order.
  *
  * Everything here is deterministic and CROSS-ENGINE REPLAYABLE, which
  * is what puts t10 under the DuckDB hash gate:
  *
  *  - training ties break lexicographically (no insert-order or hash
  *    dependence), and the trainer is pure Scala over a fixed embedded
  *    corpus — the merge list is a compile-time constant, so the oracle
  *    SQL can carry it inline (d04's generated-literal technique);
  *  - application is a chain of plain `replace()` calls over a
  *    MARKER-PREFIXED symbol string: word → `|h|e|l|l|o`, merge (l,l) →
  *    `replace(s, '|l|l', '|ll')`. Both Spark and DuckDB implement
  *    leftmost non-overlapping `replace`, and the leading marker pins
  *    every match to a symbol BOUNDARY — the naive space-joined form
  *    (`replace(s, 'a b', 'ab')`) silently merges across boundaries
  *    when one symbol's suffix equals the merge's left side (symbols
  *    `[ba, b]` contain the substring `a b`), and diverges from true
  *    BPE on adjacent repeats (`a b a b` only merges once because the
  *    replacement consumes the shared delimiter). With the marker,
  *    `|b|a|b` does not contain `|a|b`, and `|a|b|a|b` merges twice —
  *    exactly [[applyMerges]]' symbol-vector semantics (pinned, with
  *    these adversarial cases, in BpeSpec).
  *
  * Token counts read off the final string as (marker count) =
  * `size(split(s, '\|')) - 1` — one evaluation of the chain, no
  * length/replace double-compute.
  */
object Bpe {

  /** Marker prefixed to every symbol in the string representation.
    * Words are normalized to [a-z0-9] before symbolization, so the
    * marker can never occur inside a symbol. */
  val Marker = "|"

  /** Frequency-weighted word list from a training corpus: lowercase,
    * strip non-alphanumerics, drop empties — the same normalization the
    * SQL emission applies at tokenization time. */
  def wordCounts(corpus: String): Seq[(String, Long)] =
    corpus.toLowerCase.split("\\s+").toSeq
      .map(_.replaceAll("[^a-z0-9]", ""))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1) // deterministic trainer input order (not that the trainer depends on it)

  /** Leftmost non-overlapping single-pair merge over a symbol vector —
    * the reference semantics `replace()` must agree with. */
  def mergeSeq(s: Vector[String], m: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == m._1 && s(j + 1) == m._2) {
        b += s(j) + s(j + 1); j += 2
      } else { b += s(j); j += 1 }
    }
    b.result()
  }

  /** Train `numMerges` merges: each round counts adjacent symbol pairs
    * over the frequency-weighted corpus and fuses the most frequent
    * (ties: lexicographically smallest pair). Stops early when no pair
    * remains. */
  def train(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var seqs: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (s, f) =>
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        seqs = seqs.map { case (s, f) => (mergeSeq(s, best), f) }
        i += 1
      }
    }
    out.result()
  }

  /** Reference tokenizer: normalize, symbolize, replay the merges. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Vector[String] = {
    val norm = word.toLowerCase.replaceAll("[^a-z0-9]", "")
    if (norm.isEmpty) Vector.empty
    else merges.foldLeft(norm.map(_.toString).toVector)(mergeSeq)
  }

  // ---- SQL emission (per-word expressions usable inside HOF lambdas) --

  private def chain(symbolized: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(symbolized) { case (acc, (a, b)) =>
      "replace(" + acc + ", '" + Marker + a + Marker + b + "', '" + Marker + a + b + "')"
    }

  /** Spark SQL: BPE token count of the (already-normalized, non-empty)
    * word expression `w`. Evaluates the replace chain once and counts
    * markers. */
  def wordCountSpark(w: String, merges: Seq[(String, String)]): String =
    "(size(split(" + chain("regexp_replace(" + w + ", '(.)', '|$1')", merges) +
      ", '\\\\|')) - 1)"

  /** DuckDB SQL: same count, RE2 replacement syntax and plain-delimiter
    * string_split. */
  def wordCountDuck(w: String, merges: Seq[(String, String)]): String =
    "(len(string_split(" + chain("regexp_replace(" + w + ", '(.)', '|\\1', 'g')", merges) +
      ", '|')) - 1)"

  /** Spark SQL: normalized non-empty word array of a text expression —
    * the shared pre-tokenization both engines apply. */
  def normWordsSpark(text: String): String =
    "filter(transform(split(" + text + ", ' '), " +
      "w -> regexp_replace(lower(w), '[^a-z0-9]', '')), w -> length(w) > 0)"

  /** DuckDB SQL twin of [[normWordsSpark]]. */
  def normWordsDuck(text: String): String =
    "list_filter(list_transform(string_split(" + text + ", ' '), " +
      "w -> regexp_replace(lower(w), '[^a-z0-9]', '', 'g')), w -> len(w) > 0)"

  /** The engine's default merge table: trained at library build time on
    * a fixed embedded corpus shaped like the `documents` fixture's
    * vocabulary (data-engineering words, frequency-weighted toward the
    * common ones), so the merges actually fire on the test tables. A
    * production deployment would swap in merges trained by [[train]] on
    * a hash-sample of its own corpus — training needs statistics, not
    * every row, the same argument as kMeansModel's sampling note. */
  val TrainingCorpus: String =
    ("the the the the the the data data data data table table table scan scan scan " +
      "query query query stream stream batch batch batch merge merge sort sort sort " +
      "filter filter window window join join join group group order order value " +
      "spark spark customer customer cluster cluster partition partition partition " +
      "shuffle shuffle broadcast rows rows row line line key key hash small big fast " +
      "slow agg column dup the data table scan stream batch sort the the data")

  val DefaultMerges: Seq[(String, String)] = train(wordCounts(TrainingCorpus), 32)
}
