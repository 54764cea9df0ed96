package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation building blocks, composed from the catalog's
  * operators: deterministic split assignment, quality filtering, exact
  * and near-duplicate removal. Everything is hash- or rule-based — NO
  * RNG — so a re-run over the same corpus assigns identically (the
  * property that makes incremental dataset builds reproducible).
  */
object Splits {

  /** Deterministic train/validation/test assignment: bucket each row by
    * xxhash64 of its id into 10k slots and cut by cumulative weights.
    * Stable under repartitioning, appends and re-runs (pure function of
    * the id), unlike `randomSplit`. */
  def assign(df: DataFrame, idCol: String, weights: Seq[(String, Double)]): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val slots = 10000
    val bucket = pmod(xxhash64(col(idCol)), lit(slots.toLong))
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail.map(w => (w * slots).round)
    val expr0 = weights.map(_._1).zip(cuts).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, (name, cut)) =>
        when(bucket < cut, name).otherwise(acc)
      }
    df.withColumn("split", expr0)
  }

  /** Leakage-safe split assignment: near-duplicate CLUSTERS are atomic
    * split units. Plain per-doc hashing (assign above, or any Bernoulli
    * sampler) routinely puts two near-copies of the same document on
    * opposite sides of a train/holdout cut — the eval set then "tests"
    * on paraphrases of training documents and overstates quality (the
    * train/test contamination d06 screens EXTERNAL benchmarks for, but
    * arising from the corpus's own internal duplication). Here every doc
    * is keyed by its near-dup cluster representative (the component min
    * doc_id from [[NearDup.clusters]]) — its own id when unclustered —
    * and the split is a pure hash of THAT unit id, so all members of a
    * cluster land together by construction and membership stays a pure
    * function of the corpus (re-runs reproduce the split exactly).
    *
    * The hash is the catalog's cross-engine Knuth multiplicative scheme
    * (p02/p05's discipline) rather than assign's xxhash64, so a DuckDB
    * oracle can replay the whole assignment: holdout iff
    * ((unit_id mod 1048573) * 2654435761) mod 1000 < holdoutPm.
    *
    * Scale shape: the cluster frame is PAIRS-sized metadata (pairs ≪ n²
    * by the banded kernels), so the docs←clusters equi-join broadcasts;
    * the unit hash and split label are map-side expressions. Nothing
    * here shuffles the corpus — the near-dup pair generation inside
    * [[NearDup.clusters]] (banded, df-capped) is the only heavy stage,
    * and it is shared with d05/d09 via the registry cache.
    *
    * GROWTH semantics (the streaming-ingest question, spec-pinned in
    * CurationSpec): assignment is a pure function of the corpus
    * SNAPSHOT, and under ascending-id ingest (StreamingCuration's
    * monotone contract) re-assigning over a grown corpus changes an
    * existing doc's unit — and possibly its label — in exactly ONE
    * case: a new doc BRIDGES two previously-separate units, whose merge
    * takes the smaller unit id. A new doc can never lower an existing
    * cluster's min (its id exceeds every resident id), so non-bridging
    * growth — unrelated docs, or near-dups of a single existing unit —
    * leaves every resident label untouched. The bridge drift is
    * leakage-safety WORKING: once linked, the merged cluster must not
    * straddle the cut, so freezing labels at ingest would silently
    * reintroduce the contamination this exists to prevent; pipelines
    * that need frozen labels must re-derive holdout membership from the
    * FROZEN snapshot they evaluated on, not from the grown corpus. */
  def assignLeakageSafe(docs: DataFrame, threshold: Double = 0.5,
      holdoutPm: Long = 100L): DataFrame = {
    require(holdoutPm >= 0 && holdoutPm <= 1000, s"holdoutPm out of range: $holdoutPm")
    val cl = broadcast(NearDup.clusters(docs, threshold))
    docs.join(cl, Seq("doc_id"), "left")
      .withColumn("unit_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when((pmod(col("unit_id"), lit(1048573L)) * lit(2654435761L)) % 1000
          < holdoutPm, "holdout").otherwise("train"))
      .drop("cluster_id")
  }
}

object Curation {

  /** One-call corpus curation:
    * 1. quality gate: token count in [minTokens, ∞) and unique-token
    *    ratio ≥ minUniqRatio (t02's signals);
    * 2. exact dedup: keep the min-doc_id row per md5(text) (d01);
    * 3. near-dup removal: drop every doc whose near-dup cluster
    *    (connected components over MinHash-verified Jaccard ≥ 0.5 pairs,
    *    d03/d05) contains a smaller doc_id;
    * 4. deterministic split assignment (Splits.assign).
    *
    * Returns the curated frame plus a `split` column. All predicates are
    * deterministic; the whole pipeline is one lineage (no RNG, no
    * collect except the bounded CC iteration in the cluster step).
    */
  /** The quality gate shared by batch and streaming curation: token count
    * ≥ minTokens and unique-token ratio ≥ minUniqRatio (t02's signals).
    * One definition so the two ingestion paths cannot diverge. */
  private[pipeline] def qualityGate(docs: DataFrame, minTokens: Int,
      minUniqRatio: Double): DataFrame = {
    val toked = docs.withColumn("_toks", split(col("text"), " "))
    toked
      .filter(size(col("_toks")) >= minTokens)
      .filter(size(array_distinct(col("_toks"))) / size(col("_toks")) >= minUniqRatio)
      .drop("_toks")
  }

  /** Exact dedup shared by batch and streaming curation: stamp
    * `fingerprint` = md5(text) and keep the min-doc_id row per value.
    * Window partitioned by fingerprint — one shuffle on the dedup key,
    * no join back. The sort is made TOTAL by a content-hash tiebreak:
    * doc_id alone can tie (at-least-once sources, non-unique foreign
    * ids), and row_number over a partial order keeps whichever row the
    * shuffle delivered first — a re-run could keep a different survivor,
    * breaking this module's re-run-identical contract. With the
    * tiebreak, ties only remain between fully identical rows, where the
    * choice is immaterial. */
  private[pipeline] def exactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("fingerprint", md5(col("text")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint"))
          .orderBy(col("doc_id"), xxhash64(docs.columns.map(col): _*))))
      .filter(col("_rn") === 1).drop("_rn")

  /** PII scrub stage ([[graft.operators.Documents.redactPii]]): replaces
    * `text` with its redacted form and keeps the per-doc match counts
    * for the removal report. Runs BEFORE the quality gate and dedup so
    * fingerprints and shingles see the CLEANED text — two documents
    * differing only in their PII dedup together, which raw-text
    * fingerprints would miss. A stateless map with no watermark or
    * state, so the same call composes onto a STREAMING frame ahead of
    * [[StreamingCuration]]'s foreachBatch unchanged (spec-pinned). */
  def scrub(docs: DataFrame): DataFrame =
    graft.operators.Documents.redactPii(docs, "text")
      .drop("text").withColumnRenamed("redacted", "text")

  /** Duplicate-span CUT stage ([[graft.operators.Documents
    * .removeDuplicateSpans]]): splices cross-document duplicated k-token
    * spans out of every document except the span's min-doc_id keeper —
    * the substring-level leg of the dedup ladder (exact doc → near-dup
    * doc → duplicated SPAN), per Lee et al.'s finding that duplicated
    * substrings survive whole-document dedup and measurably hurt the
    * trained model. Composes like [[scrub]]: run it BEFORE [[curate]]
    * so the quality gate re-judges the POST-cut text (a doc reduced to
    * boilerplate crumbs by the cut should now fail the gate) and doc
    * fingerprints see cleaned text. Keeps the removal report column
    * `n_span_tokens_removed` for the curation ledger. */
  def cutSpans(docs: DataFrame, k: Int = 8): DataFrame =
    graft.operators.Documents.removeDuplicateSpans(docs, k)

  def curate(docs: DataFrame, minTokens: Int = 5, minUniqRatio: Double = 0.1,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)): DataFrame = {
    val exactDeduped = exactDedup(qualityGate(docs, minTokens, minUniqRatio))
      .drop("fingerprint")

    // near-dup removal: keep only cluster minima
    val clusters = NearDup.clusters(exactDeduped)
    val dropIds = clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val deduped = exactDeduped.join(dropIds, Seq("doc_id"), "left_anti")

    Splits.assign(deduped, "doc_id", weights)
  }

  /** The full pretraining-corpus recipe in ONE call — every stage of
    * the catalog's ladder composed in the published order:
    *
    *  1. [[scrub]] — PII redaction (t12), so duplicates differing only
    *     in redacted spans dedup together;
    *  2. [[cutSpans]] — duplicate-SPAN removal (d08/d10, Lee et al.),
    *     before the gate so post-cut text is re-judged;
    *  3. [[curate]] / [[curateSemantic]] — quality gate, exact dedup,
    *     lexical near-dup prune at the catalog's Jaccard 0.5 (d01/d03/
    *     d05), plus the SemDeDup stage when `vectors` is supplied (d07);
    *  4. [[Splits.assignLeakageSafe]] at `splitThreshold` — the
    *     deliberate asymmetry of the recipe: REMOVAL uses the strict
    *     0.5 (only true near-dups are dropped), while SPLIT ISOLATION
    *     uses a looser net, so borderline-similar survivors — too
    *     distinct to delete, too similar for one to train while the
    *     other evaluates — still land on the same side of the cut.
    *     This replaces curate's per-doc `split` column (which is
    *     leak-free only against pairs the prune already removed).
    *
    * Everything inside is hash/rule-based — re-runs over the same corpus
    * reproduce byte-identical output. */
  def pretrainingCorpus(docs: DataFrame, vectors: Option[DataFrame] = None,
      minTokens: Int = 5, minUniqRatio: Double = 0.1, spanK: Int = 8,
      splitThreshold: Double = 0.3, holdoutPm: Long = 100L,
      cells: Int = 0, iters: Int = 3, semThreshold: Double = 0.45,
      semProbes: Int = 0): DataFrame = {
    require(splitThreshold <= 0.5,
      s"splitThreshold ($splitThreshold) must not exceed the 0.5 prune " +
        "threshold: split isolation is the LOOSER net")
    val cleaned = cutSpans(scrub(docs), spanK).drop("n_span_tokens_removed")
    val deduped = vectors match {
      case Some(v) => curateSemantic(cleaned, v, cells, iters, semThreshold,
        minTokens, minUniqRatio, probes = semProbes)
      case None => curate(cleaned, minTokens, minUniqRatio)
    }
    Splits.assignLeakageSafe(deduped.drop("split"), splitThreshold, holdoutPm)
  }

  /** [[curate]] plus the SemDeDup stage (the standard third leg of LLM
    * dedup after exact and lexical near-dup): after quality gating and
    * lexical dedup, drop documents whose EMBEDDING is a within-cell
    * semantic near-dup of a surviving smaller-id document.
    * `vectors` is the corpus embedding table keyed by `vec_id` ==
    * `doc_id`; it is filtered to the lexical survivors BEFORE training
    * so the k-means cells reflect the corpus that actually remains
    * (d07's operator semantics, [[graft.operators.Embeddings
    * .semanticDedup]] — within-cell pruning only, never all-pairs; see
    * its scaladoc for the 100 TB argument). `cells <= 0` (default)
    * derives the cell count from the survivor corpus size
    * ([[graft.operators.Embeddings.kMeansCells]] — occupancy pinned, so
    * the within-cell quadratic stays linear in corpus size).
    * Split assignment is a pure
    * per-doc hash, so filtering after [[curate]] cannot skew the
    * train/valid/test proportions beyond the docs removed.
    *
    * `probes = 0` (default) is [[graft.operators.Embeddings
    * .autoProbes]]'s AUTO: single-assignment pruning on flat-routed
    * models (every DuckDB-holdable corpus — pipeline hashes unchanged),
    * top-2 fine probing where the derived cell count routes two-level,
    * so the production pipeline stops paying the measured 12–23%
    * boundary-recall cost exactly at the scales it appears (r17
    * verdict #1). Explicit `probes = 1` opts out; `probes >= 2` forces
    * multi-probe on any model.
    */
  def curateSemantic(docs: DataFrame, vectors: DataFrame,
      cells: Int = 0, iters: Int = 3, threshold: Double = 0.45,
      minTokens: Int = 5, minUniqRatio: Double = 0.1,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      probes: Int = 0)
      : DataFrame = {
    // the lexical survivor frame feeds THREE consumers (the vectors
    // semi-join behind the assignment cache, the drop-set derivation,
    // and the final anti-join): retain it so one action materializes the
    // quality-gate → dedup → near-dup → split pipeline once, not three
    // times (registry discipline as with the near-dup shingle/pair
    // frames; curate's plan roots on the CC kernel, so same-name calls
    // supersede — exactly one live copy)
    val survivors = graft.CacheRegistry.retain("curation.semantic.survivors",
      curate(docs, minTokens, minUniqRatio, weights))
    val vecs = vectors.join(
      survivors.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val kept = graft.operators.Embeddings.semanticDedup(vecs, cells, iters, threshold,
      probes = probes)
    // the semantic stage can only judge docs that HAVE an embedding row:
    // a doc without one is no near-dup candidate and must pass through,
    // so remove exactly the embedded-but-pruned set instead of semi-
    // joining on `kept` (which would silently drop every uncovered doc —
    // with an empty/mismatched vectors table, the whole corpus)
    val dropped = vecs.select(col("vec_id").as("doc_id"))
      .join(kept.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
    survivors.join(dropped, Seq("doc_id"), "left_anti")
  }
}

/** Near-dup machinery over any (doc_id, text) frame — the engine behind
  * catalog queries d02/d05, generalized off the test corpus. See
  * `operators.Documents` scaladoc for the scale argument (inverted-index
  * join, cached compact shingle table, repartition-before-HOFs).
  */
object NearDup {

  /** Hot-shingle probe results per retained shingle handle (the handle
    * is reference-stable across plan-matched calls; CacheRegistry holds
    * it strongly while relevant). Weak key: once the registry releases a
    * handle (unpersistAll / session end) the memo entry is GC-reclaimed
    * and a fresh handle re-probes. */
  private val probeMemo =
    new java.util.WeakHashMap[DataFrame, scala.collection.mutable.Map[Long, Boolean]]()

  /** doc_id + distinct 3-word shingles. */
  def shingled(docs: DataFrame): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, size(toks)-2), " +
          "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")).as("shingles"))

  /** Exact Jaccard on two distinct-shingle arrays; the same single
    * long/long IEEE division as the d02/d03 catalog arithmetic. */
  private[graft] def jaccardCol(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    inter / (size(a) + size(b) - inter).cast("long")
  }

  /** Per-doc MinHash band signatures — d03's exact construction (64 hash
    * functions over two-level shingle hashing, 32 bands × 2 rows):
    * `(doc_id, shingles, keys[32])`. Docs with fewer than 3 tokens carry
    * no shingles and produce no row (they cannot near-dup anything).
    * This is the frame [[StreamingCuration]] persists as its signature
    * history: at 100 TB it is the compact, probe-able residue of every
    * document ever seen — the shingle/minhash work is paid once per doc,
    * at ingest. */
  def signatures(docs: DataFrame): DataFrame = {
    val sh = shingled(docs)
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h0"))
    val sigCols = (0 until 64).map(h => min(xxhash64(col("h0"), lit(h))).as(s"mh$h"))
    val sig = ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    sig.select(col("doc_id"),
        array((0 until 32).map(b =>
          xxhash64(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))): _*).as("keys"))
      .join(sh, Seq("doc_id"))
  }

  /** Doc ids from `cand` that VERIFY (exact Jaccard ≥ `threshold`) as
    * near-dups of any row in `seen` — both frames in [[signatures]]
    * shape. A pair is a candidate iff it shares any of the 32 band keys
    * (d03's recall argument: P(miss) = (1−j²)³² — 1e-23 at j ≥ 0.9),
    * then the stored shingle arrays decide exactly, so precision is 1.
    *
    * Scale: `cand` is one trigger-bounded micro-batch and BROADCASTS
    * (both its band keys and its shingle arrays); `seen` — the unbounded
    * signature history — is only ever scanned map-side: band-key probe,
    * then shingle verify restricted to the (few) banded hits. No shuffle
    * of the history, ever. */
  def probeSeen(cand: DataFrame, seen: DataFrame, threshold: Double = 0.5): DataFrame = {
    val cx = cand.select(col("doc_id").as("cid"),
      posexplode(col("keys")).as(Seq("band", "key")))
    val sx = seen.select(col("doc_id").as("sid"), col("shingles").as("ssh"),
      posexplode(col("keys")).as(Seq("band", "key")))
    sx.join(broadcast(cx), Seq("band", "key"))
      .select(col("cid"), col("sid"), col("ssh")).distinct()
      .join(broadcast(cand.select(col("doc_id").as("cid"), col("shingles").as("csh"))),
        Seq("cid"))
      .filter(jaccardCol(col("csh"), col("ssh")) >= threshold)
      .select(col("cid").as("doc_id")).distinct()
  }

  /** Exact (doc_a, doc_b, jaccard) pairs with Jaccard ≥ threshold via the
    * inverted-index self-join.
    *
    * Stop-shingle guard: the join's cost is Σ_shingle df(shingle)², which
    * is unbounded on a stop-phrase at corpus scale (one shingle shared by
    * a million docs alone yields 10¹² candidate pairs). Shingles with
    * document frequency above `maxShingleDf` are dropped from the shingle
    * UNIVERSE — both intersection and union counts, the standard stop-word
    * treatment, so identical docs still score jaccard 1.0. The hot set is
    * tiny by construction (≤ corpus/maxShingleDf distinct values carry
    * df > maxShingleDf… in practice a handful) and broadcasts. The default
    * cap is far above any test fixture's max df (≤ n_docs = 5000 at
    * sf0.1), so test-scale output is unchanged; a doc whose every shingle
    * is hot simply produces no pairs. */
  def pairs(docs: DataFrame, threshold: Double = 0.5,
      maxShingleDf: Long = 100000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // no explicit populate job: the hot-probe below reads through this
    // cached handle and materializes it as a side effect (one job does
    // both), and a probe-memo hit implies an earlier pairs() call on the
    // same handle already populated it
    val sh = graft.CacheRegistry.retain("neardup.shingles", shingled(docs))
    val ex0 = sh.select($"doc_id", explode($"shingles").as("shingle"))
    val hot = ex0.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" > maxShingleDf).select($"shingle")
    // probe first (one aggregation over the inverted index): the capped
    // rewrite costs an extra anti-join shuffle plus a per-doc re-count,
    // so it only engages when a hot shingle EXISTS — the common clean
    // corpus keeps the plain plan (sizes as an array-length projection,
    // no second shuffle). A/B at sf0.1: 1.7 s vs 3.2 s warm. The probe
    // result is memoized against the retained shingle handle (reference-
    // stable across plan-matched calls), so d02/d05/curate in one
    // session pay it once, preserving the pair-cache reuse economics.
    // read-probe-write, with the Spark job OUTSIDE the lock: holding a
    // JVM-global monitor across a cluster job would serialize concurrent
    // pairs() callers (racing threads may probe twice — harmless)
    val memoized = probeMemo.synchronized(
      Option(probeMemo.get(sh)).flatMap(_.get(maxShingleDf)))
    val hasHot = memoized.getOrElse {
      val probed = hot.limit(1).count() > 0
      probeMemo.synchronized {
        var caps = probeMemo.get(sh)
        if (caps == null) {
          caps = scala.collection.mutable.Map.empty[Long, Boolean]
          probeMemo.put(sh, caps)
        }
        caps.getOrElseUpdate(maxShingleDf, probed)
      }
    }
    val (ex, sizes) =
      if (!hasHot)
        (ex0, sh.select($"doc_id", size($"shingles").cast("long").as("n")))
      else {
        // tiny by construction (each entry carries df > cap) — retained
        // under registry ownership like every other session-lived cache
        val h = graft.CacheRegistry.retain("neardup.hotshingles", hot)
        val exCapped = ex0.join(broadcast(h), Seq("shingle"), "left_anti")
        // per-doc sizes over the CAPPED universe (arrays are distinct, so
        // the count equals the array size minus its hot members)
        (exCapped, exCapped.groupBy($"doc_id").agg(count(lit(1)).as("n")))
      }
    val out = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
      .join(sizes.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
      .withColumn("jaccard", $"inter" / ($"na" + $"nb" - $"inter").cast("long"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
    // the pair set is tiny (bounded by true near-dups) and expensive to
    // produce — retain it so plan-matched callers (d02's listing, d05's
    // clustering, Curation) compute the inverted-index join once per
    // session instead of once per caller
    graft.CacheRegistry.retain("neardup.pairs", out)
  }

  /** Connected components of the near-dup graph: (doc_id, cluster_id =
    * component min). Pregel-style min-label propagation TO CONVERGENCE —
    * labels strictly decrease, so the loop terminates in O(component
    * diameter) rounds; the hard cap only guards against implementation
    * bugs and FAILS LOUDLY rather than silently returning unconverged
    * labels (which would leak near-duplicates through Curation and
    * contaminate train/test splits).
    *
    * Per-round cost is ONE job: the convergence signal rides a
    * LongAccumulator filled while the round's labels materialize into
    * cache — no separate compare-join + count job. (A task retry can
    * over-count the accumulator; that can only turn "converged" into
    * "one more no-op round", never the reverse — the loop still exits
    * on the next genuinely-unchanged round.)
    *
    * Each round's LOGICAL plan is re-rooted on the round's RDD
    * (`createDataFrame(plan.rdd, schema)`): the round plan references
    * `labels` twice (propagation join + carry-through), so a chained
    * logical lineage DOUBLES per round — at diameter ~15 the 2^15-node
    * plan OOMs Spark's own plan-string rendering before any result is
    * wrong (caught by the deep-chain spec). Re-rooting keeps every
    * round's plan flat while the RDD lineage stays LINEAR, and —
    * unlike `localCheckpoint`, whose storage only frees via the
    * ContextCleaner after a driver GC — the plain cache keeps at most
    * two label sets persisted at once (current + next, the superseded
    * one eagerly unpersisted).
    */
  /** Warm-call memo for [[components]], one slot per cache name: the
    * loop's result frame is rooted on a LogicalRDD and can never
    * plan-match a later call, so without this a second components() in
    * the same session re-runs EVERY propagation round (measured 4.4 s at
    * sf0.1 for the text clusters; the same re-pay dominated m06's first
    * warm profile) to rebuild an identical frame. The input pair handle
    * must be reference-stable across calls (the registry returns the
    * first object for plan-matched frames; closure-rooted pair sets like
    * m06's memoize their own handle) and its plan encodes the pairing
    * semantics, so object identity is an exact semantic key. Keyed by
    * cache name so the text (d05/d09) and media (m06) cluster frames
    * memoize independently. unpersistAll/Engine.close invalidates
    * transitively: it drops the registry entry, and a stopped session is
    * checked explicitly. Plain map ops under the JVM-global registry
    * discipline; the loop itself runs outside any lock. */
  private val componentsMemo =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, DataFrame)]

  def clusters(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    components(pairs(docs, threshold), "neardup.clusters")

  /** Below this many verified pairs the component computation runs as a
    * driver-side union-find over the collected edge list — the same
    * size-gated local/distributed split Spark applies to joins
    * (autoBroadcastJoinThreshold) and GraphFrames' connected components
    * applies to its end-game. A verified near-dup pair set is METADATA
    * next to the corpus it came from (pairs ≪ n²: 215 text / 3660 media
    * rows at sf0.1), while the distributed loop pays rounds × 3 shuffle
    * stages of fixed cost — 14 s for the media graph's 7 320 edges at
    * sf0.1, vs milliseconds locally. The cap is sized to the REAL driver
    * footprint of the local path — boxed-Long HashMap entries (~100 B
    * each over ≤ 2·pairs nodes), the collected tuple array, and the
    * LocalRelation the result embeds — ~30-40 MB at 2^17 pairs, the
    * same order as a default broadcast build side, NOT the raw 16
    * bytes/pair. Pair sets above the cap take the propagation loop —
    * the 100 TB path — and a spec pins the two paths' outputs equal. */
  val LocalComponentsMaxPairs: Long = 1L << 17

  /** Generic bounded-round min-label-propagation connected components
    * over an undirected verified pair set `(doc_a, doc_b)` — the kernel
    * behind [[clusters]], reused verbatim for media near-dup clustering
    * (m06), so text and media dedup cannot drift on the component
    * semantics. Returns `(doc_id, cluster_id = min doc_id reachable)`,
    * registry-retained under `cacheName`. Size-gated: pair sets at or
    * below `localMaxPairs` resolve by driver union-find (see
    * [[LocalComponentsMaxPairs]]); larger ones take the propagation
    * loop. */
  def components(pairSet: DataFrame, cacheName: String,
      localMaxPairs: Long = LocalComponentsMaxPairs): DataFrame = {
    componentsMemo.get(cacheName) match {
      case Some((in, out)) if (in eq pairSet) &&
          !out.sparkSession.sparkContext.isStopped &&
          graft.CacheRegistry.entries.contains(cacheName) =>
        return out
      case _ => ()
    }
    val spark = pairSet.sparkSession
    import spark.implicits._
    val ps = pairSet.select($"doc_a", $"doc_b")
    if (ps.count() <= localMaxPairs) {
      // driver union-find, union-by-min-id: attaching the larger root
      // under the smaller keeps every root the minimum doc_id of its
      // component, so find(id) IS the cluster label the loop computes
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      ps.as[(Long, Long)].collect().foreach { case (a, b) =>
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      import scala.jdk.CollectionConverters._
      val rows = parent.keySet().asScala.toSeq.sorted.map(id => (id, find(id)))
      val out = graft.CacheRegistry.retain(cacheName,
        rows.toDF("doc_id", "cluster_id"))
      out.count()
      componentsMemo.put(cacheName, (pairSet, out))
      return out
    }
    // co-partition the edge list by the propagation join key ONCE: the
    // cached layout already satisfies the per-round join's required
    // distribution, so each round shuffles only the (small) label frame
    // instead of re-exchanging the edge set — at 100 TB the edges are
    // data-sized and this per-round exchange is the loop's dominant
    // moving cost; labels-by-id stays a per-round shuffle (it changes
    // every round by construction)
    val edges = ps.union(ps.select($"doc_b", $"doc_a")).toDF("src", "dst")
      .repartition($"dst").cache()
    var labels = edges.select($"src".as("id")).distinct().withColumn("label", $"id").cache()
    var changed = true
    var iter = 0
    val maxIters = 200
    while (changed) {
      require(iter < maxIters,
        s"label propagation did not converge in $maxIters rounds — component diameter bug?")
      val prop = edges.join(labels, $"dst" === $"id")
        .groupBy($"src").agg(min($"label").as("nl"))
      // label shortcutting: besides the distance-1 neighbor min, each
      // node also adopts its current representative's label —
      // label(label(id)) — compressing label chains each round. On
      // min-label propagation over arbitrary id orderings this is not
      // full pointer-doubling (labels are mins seen, not tree parents),
      // but it measurably cuts rounds on high-diameter graphs: the media
      // phash graph at sf0.1 (diameter ~19) converges in 14 rounds vs 20
      // without, and the gain grows with diameter — the regime the
      // distributed path exists for. The fixpoint is unchanged: at
      // convergence every edge still enforces label(u) = label(v), so
      // labels equal the component min exactly as before — the jump only
      // accelerates monotone descent, it cannot introduce a label that
      // isn't some reachable node's. Join shape: labels(label → jid) is
      // a node-sized hash join; late-round skew (most nodes share the
      // component min) sits on the PROBE side, which shuffle-hash
      // handles — the build side stays one row per id.
      val jump = labels.select($"id".as("jid"), $"label".as("jl"))
      val acc = spark.sparkContext.longAccumulator(s"neardup-cc-changes-$iter")
      val roundPlan = labels.join(prop, $"id" === $"src", "left")
        .join(jump, $"label" === $"jid", "left")
        .select($"id",
          least($"label", coalesce($"nl", $"label"), coalesce($"jl", $"label")).as("label"),
          $"label".as("old"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, l, o) => if (l != o) acc.add(1L); (id, l) }
        }
        .toDF("id", "label")
      // flat logical root over the round's RDD (see scaladoc), cached +
      // counted: ONE job materializes and fills the accumulator
      val next = spark.createDataFrame(roundPlan.rdd, roundPlan.schema).cache()
      next.count()
      changed = acc.value > 0
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    // the result is re-rooted on its OWN flat LogicalRDD before the loop
    // caches are dropped: Spark 4.1's Dataset.unpersist CASCADES into
    // cache entries whose plan contains the unpersisted plan, so a plain
    // `labels.select(...).cache()` would lose its entry at the
    // labels.unpersist below — consumers would silently recompute through
    // RDD lineage and the materialized blocks would linger unowned
    // (verified by the returned-frame-stays-cached spec). Registry
    // ownership replaces the anonymous cache: Engine.close releases it.
    // A LogicalRDD never plan-matches a later call's, so the registry's
    // same-name eviction replaces the previous entry per call; if the
    // cached blocks are ever evicted under memory pressure, recompute
    // walks the (linear) RDD lineage back through the propagation rounds
    // — consumers needing durability should write the frame out instead.
    val projected = labels.select($"id".as("doc_id"), $"label".as("cluster_id"))
    val out = graft.CacheRegistry.retain(cacheName,
      spark.createDataFrame(projected.rdd, projected.schema))
    out.count() // materialize through labels' still-live cache
    edges.unpersist(blocking = false)
    labels.unpersist(blocking = false)
    componentsMemo.put(cacheName, (pairSet, out))
    out
  }
}
