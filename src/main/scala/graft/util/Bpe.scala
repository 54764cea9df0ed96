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
  *    LENGTH-PREFIXED symbol string: word → `|1:h|1:e|1:l|1:l|1:o`,
  *    merge (l,l) → `replace(s, '|1:l|1:l', '|2:ll')`. Both Spark and
  *    DuckDB implement leftmost non-overlapping `replace`, and the
  *    `|<len>:` prefix pins every match to a symbol boundary AND to the
  *    EXACT symbol — both boundaries, not just the left one. A bare
  *    leading marker (`|l|l`) is not enough: `|c|a` also matches inside
  *    `|c|at` (the next symbol merely STARTS with `a`), silently firing
  *    the merge (c,a) on the symbol pair (c,at) — divergence from
  *    [[applyMerges]] on any word where a merge's right side is a
  *    strict prefix of the actual next symbol (`cat` with merges
  *    (a,t),(c,a)). With the length field, `|1:a` cannot match `|2:at`
  *    (`:` vs the second digit/char mismatches), the digits-then-colon
  *    rendering parses uniquely (symbols are [a-z0-9] — no `|`/`:`),
  *    and because the pattern consumes NO trailing delimiter, adjacent
  *    repeats merge exactly like the reference: occurrences of
  *    `|1:a|1:b` in `|1:a|1:b|1:a|1:b` are disjoint, so one leftmost
  *    non-overlapping pass replaces both — precisely [[mergeSeq]]'s
  *    left-to-right j+=2 sweep (pinned, with these adversarial cases,
  *    in BpeSpec).
  *
  * Token counts read off the final string as (marker count) =
  * `size(split(s, '\|')) - 1` — one evaluation of the chain, no
  * length/replace double-compute.
  */
object Bpe {

  /** Boundary marker opening every `|<len>:<sym>` rendering. Words are
    * normalized to [a-z0-9] before symbolization, so neither the marker
    * nor the `:` length terminator can occur inside a symbol. */
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

  /** One symbol's string rendering: `|<len>:<sym>` — see the scaladoc
    * for why the length field is load-bearing (exact-symbol matching on
    * BOTH sides of a merge, not just the left boundary). */
  private def sym(s: String): String = Marker + s.length + ":" + s

  private def chain(symbolized: String, merges: Seq[(String, String)]): String =
    merges.foldLeft(symbolized) { case (acc, (a, b)) =>
      "replace(" + acc + ", '" + sym(a) + sym(b) + "', '" + sym(a + b) + "')"
    }

  /** Spark SQL: BPE token count of the (already-normalized, non-empty)
    * word expression `w`. Evaluates the replace chain once and counts
    * markers. */
  def wordCountSpark(w: String, merges: Seq[(String, String)]): String =
    "(size(split(" + chain("regexp_replace(" + w + ", '(.)', '|1:$1')", merges) +
      ", '\\\\|')) - 1)"

  /** DuckDB SQL: same count, RE2 replacement syntax and plain-delimiter
    * string_split. */
  def wordCountDuck(w: String, merges: Seq[(String, String)]): String =
    "(len(string_split(" + chain("regexp_replace(" + w + ", '(.)', '|1:\\1', 'g')", merges) +
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
