package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("split assignment is deterministic, complete, disjoint, and ~weighted") {
    val w = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val a = Splits.assign(docs, "doc_id", w)
    val b = Splits.assign(docs.repartition(7), "doc_id", w)
    // stable under repartitioning & re-runs
    val am = a.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bm = b.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(am == bm)
    assert(am.size == docs.count())
    val frac = am.values.groupBy(identity).view.mapValues(_.size.toDouble / am.size).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac.getOrElse("valid", 0.0) - 0.1) < 0.05)
  }

  test("curate removes exact and near duplicates and assigns splits") {
    // plant an exact duplicate and a high-overlap near-duplicate
    val base = docs.limit(100)
    val origText = base.filter($"doc_id" === 0L).select("text").collect()(0).getString(0)
    val planted = Seq(
      (9001L, origText, "xx", "srcX", origText.length.toLong),
      (9002L, origText + " extra token tail", "xx", "srcX", origText.length + 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = base.unionByName(planted)

    val curated = Curation.curate(corpus).cache()
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(!kept.contains(9001L), "exact duplicate dropped (canonical doc 0 kept)")
    assert(!kept.contains(9002L), "near duplicate dropped")
    assert(kept.contains(0L), "canonical kept")
    // no surviving exact dups
    assert(curated.select(md5($"text")).distinct().count() == curated.count())
    // every row got a split
    assert(curated.filter($"split".isNull).count() == 0)
    // and no near-dup pair survives among the kept docs
    assert(NearDup.pairs(curated).count() == 0)
  }

  test("assignLeakageSafe: near-dup clusters are atomic split units") {
    // plant a near-dup PAIR whose members a per-doc hash would separate:
    // scan for two ids on opposite sides of the Knuth threshold, then
    // give them near-identical text so they cluster
    def side(id: Long): Boolean =
      (Math.floorMod(id, 1048573L) * 2654435761L) % 1000 < 100
    val a = (9100L to 9400L).find(side).get          // holdout side alone
    val b = (9100L to 9400L).find(id => !side(id)).get // train side alone
    val origText = docs.filter($"doc_id" === 0L).head.getAs[String]("text")
    val planted = Seq(
      (a, origText + " tail token", "xx", "srcX", 1L),
      (b, origText + " other tail", "xx", "srcX", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.limit(100).unionByName(planted)

    val out = Splits.assignLeakageSafe(corpus).cache()
    val bySplit = out.select("doc_id", "unit_id", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // every doc assigned exactly once
    assert(bySplit.size == corpus.count())
    // the planted pair clusters with doc 0: one unit, one split — even
    // though per-doc hashing puts a and b on OPPOSITE sides
    assert(side(a) != side(b))
    for (id <- Seq(0L, a, b)) assert(bySplit(id)._1 == 0L, s"unit of $id")
    assert(Seq(0L, a, b).map(bySplit(_)._2).distinct.size == 1)
    // no near-dup pair straddles the cut (the leakage property itself)
    val splits = out.select($"doc_id", $"split")
    val leaks = NearDup.pairs(corpus)
      .join(splits.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(splits.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .filter($"split_a" =!= $"split_b")
    assert(leaks.count() == 0)
    // unclustered docs keep their own id as unit and split by it
    val unclustered = bySplit.filter { case (id, (u, _)) => id == u && id != 0L }
    assert(unclustered.nonEmpty)
    unclustered.foreach { case (id, (_, s)) =>
      assert(s == (if (side(id)) "holdout" else "train"), s"doc $id")
    }
    out.unpersist()
  }

  test("assignLeakageSafe growth semantics: stable under non-bridging ingest, drifts ONLY on a bridge merge") {
    // the streaming-ingest question (ascending-id contract): when does a
    // doc's unit — and hence possibly its label — change as the corpus
    // grows? Pinned answer (see Splits scaladoc): ONLY when a new doc
    // bridges two previously-separate units; everything else is stable
    // because a later arrival's id can never lower an existing unit min.
    // Shingle algebra: A="a b c d"→{abc,bcd}, B="b c d e"→{bcd,cde}
    // (J(A,B)=1/3 < 0.5, separate), D="a b c d e"→all three (J(D,A)=
    // J(D,B)=2/4=0.5, the bridge); F="a b c d f" pairs with A only.
    graft.CacheRegistry.unpersistAll()
    def units(rows: Seq[(Long, String)]): Map[Long, Long] = {
      graft.CacheRegistry.unpersistAll()
      val out = Splits.assignLeakageSafe(rows.toDF("doc_id", "text"))
        .select("doc_id", "unit_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.CacheRegistry.unpersistAll()
      out
    }
    val base = Seq(1L -> "a b c d", 2L -> "b c d e", 3L -> "p q r s t")
    val u1 = units(base)
    assert(u1 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"A and B are below threshold and must start as separate units: $u1")
    // non-bridging growth: an unrelated doc and a near-dup of A alone —
    // every RESIDENT unit is untouched, the newcomers join/self-assign
    val grown = base ++ Seq(11L -> "u v w x y", 12L -> "a b c d f")
    val u2 = units(grown)
    assert(base.forall { case (id, _) => u2(id) == u1(id) },
      s"non-bridging growth must not move resident units: $u2")
    assert(u2(11L) == 11L && u2(12L) == 1L)
    // bridge growth: D links A's and B's units; the merge takes the
    // SMALLER unit id, so B drifts 2→1 — leakage-safety working (the
    // merged cluster must not straddle the cut), not a bug
    val bridged = grown :+ (20L -> "a b c d e")
    val u3 = units(bridged)
    assert(u3(2L) == 1L, s"bridge must merge B into A's unit: $u3")
    assert(Seq(1L, 2L, 12L, 20L).map(u3).distinct == Seq(1L),
      "the merged cluster is one atomic unit")
    assert(u3(3L) == 3L && u3(11L) == 11L, "unrelated docs stay put")
    // and the drift is exactly the no-straddle property: all members of
    // the merged unit necessarily share one split label (same unit hash)
  }

  test("pretrainingCorpus: the one-call recipe == its published stages; borderline pairs co-locate") {
    // base corpus plus two planted cases:
    //  - 9001/9002: a TRUE near-dup pair (1 edit, jaccard .71 > .5) —
    //    the prune must remove the larger id entirely;
    //  - a/b: a BORDERLINE pair (3 edits apart, jaccard .33: under the
    //    .5 prune, over the .3 split net) whose ids per-doc hashing
    //    provably separates — both must survive AND share a split.
    def side(id: Long): Boolean =
      (Math.floorMod(id, 1048573L) * 2654435761L) % 1000 < 100
    val a = (9100L to 9400L).find(side).get
    val b = (9100L to 9400L).find(id => !side(id)).get
    val t = (1 to 20).map(i => s"w$i").toVector // near-dup family
    val u = (1 to 20).map(i => s"u$i").toVector // borderline family
    def edited(base: Vector[String], edits: (Int, String)*): String =
      edits.foldLeft(base) { case (v, (i, w)) => v.updated(i, w) }.mkString(" ")
    // edit positions ≤ 7 tokens apart so the pairs share NO 8-token run:
    // cutSpans (stage 2) must not splice the planted similarity away
    // before the prune/split stages judge it
    val planted = Seq(
      (9001L, t.mkString(" "), "xx", "srcX", 1L),
      // 2 edits, j 12/24 = .5 ≥ .5 → pruned
      (9002L, edited(t, 5 -> "q1", 13 -> "q2"), "xx", "srcX", 1L),
      (math.min(a, b), u.mkString(" "), "xx", "srcX", 1L),
      // 3 edits apart: j 9/27 = .33 — under the .5 prune, over the .3 net
      (math.max(a, b), edited(u, 2 -> "e1", 8 -> "e2", 14 -> "e3"), "xx", "srcX", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.limit(80).unionByName(planted)

    val out = Curation.pretrainingCorpus(corpus).cache()
    // wiring claim: identical to applying the published stages by hand
    val manual = Splits.assignLeakageSafe(
      Curation.curate(Curation.cutSpans(Curation.scrub(corpus))
          .drop("n_span_tokens_removed"))
        .drop("split"), threshold = 0.3)
    val om = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mm = manual.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(om == mm, "one-call recipe diverges from its published stages")
    // true near-dup pruned; borderline pair survives and co-locates
    assert(om.contains(9001L) && !om.contains(9002L))
    assert(om.contains(a) && om.contains(b), s"borderline pair pruned: $a/$b")
    assert(side(a) != side(b), "fixture must separate under per-doc hashing")
    assert(om(a) == om(b), "borderline survivors must share a split")
    out.unpersist()
  }

  test("curateSemantic == curate ∩ semanticDedup over the lexical survivors") {
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
    // threshold low enough that the semantic stage bites on the fixture
    val got = Curation.curateSemantic(docs, vectors,
        cells = 4, iters = 2, threshold = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // replay the composition from its two published pieces: the wiring
    // under test is the id bridge and the drop-set direction (remove
    // exactly the embedded-but-pruned docs; unembedded docs pass)
    val lexical = Curation.curate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val embedded = vectors.join(lexical.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val vecsKept = graft.operators.Embeddings.semanticDedup(
        vectors.join(lexical.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi"),
        cells = 4, iters = 2, threshold = 0.25)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = lexical.diff(embedded.diff(vecsKept))
    assert(got == want, s"got ${got.size}, want ${want.size}")
    assert(got.size < lexical.size,
      "the semantic stage must drop docs beyond lexical dedup on the fixture")
  }

  test("curateSemantic keeps docs WITHOUT an embedding row (partial coverage)") {
    // embedding jobs fail on subsets routinely: a doc with no vector is
    // no semantic near-dup candidate and must survive the stage, and an
    // EMPTY vectors table must be a no-op, not a corpus wipe
    val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
    val lexical = Curation.curate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    // partial coverage: drop the vectors of half the lexical survivors
    val half = vectors.filter($"vec_id" % 2 === 0)
    val gotHalf = Curation.curateSemantic(docs, half, cells = 4, iters = 2, threshold = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val uncovered = lexical.filter(_ % 2 != 0)
    assert(uncovered.subsetOf(gotHalf),
      s"uncovered docs were dropped: ${uncovered.diff(gotHalf).take(5)}")
    // empty vectors: the semantic stage judges nothing, survivors pass
    val none = vectors.filter(lit(false))
    val gotNone = Curation.curateSemantic(docs, none, cells = 4, iters = 2, threshold = 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotNone == lexical, "empty vectors table must not change the lexical survivors")
  }

  test("cutSpans: duplicated spans vanish, repetition improves, gate re-judges cut docs") {
    // planted corpus: docs 1/2/3 share a 12-token boilerplate run (doc 1
    // keeps it), doc 4's text is MOSTLY that run (after the cut it falls
    // below the quality gate's token floor), docs 5/6 are clean
    val run = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def uniq(id: Long, n: Int) = (1 to n).map(i => s"u${id}w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"${uniq(1, 10)} $run ${uniq(1, 10).toUpperCase}"),
      (2L, s"${uniq(2, 12)} $run"),
      (3L, s"$run ${uniq(3, 12)}"),
      (4L, s"$run x4a x4b"),
      (5L, uniq(5, 20)),
      (6L, uniq(6, 20)))
      .toDF("doc_id", "text")

    // driver-side repetition signal (the d08 quantity): how many token
    // positions sit inside an 8-gram that some OTHER doc also contains
    def dupPositions(df: org.apache.spark.sql.DataFrame): Long = {
      val texts = df.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val bySpan = texts.toSeq.flatMap { case (id, t) =>
        val toks = t.split(" ", -1)
        (0 to toks.length - 8).map(i => (id, i, toks.slice(i, i + 8).mkString(" ")))
      }.groupBy(_._3)
      bySpan.valuesIterator.collect {
        case os if os.map(_._1).distinct.size >= 2 =>
          os.flatMap { case (id, i, _) => (i until i + 8).map(id -> _) }
      }.flatten.toSet.size.toLong
    }

    assert(dupPositions(corpus) > 0, "plant is live")
    val cut = Curation.cutSpans(corpus)
    // every cross-doc duplicated 8-gram is gone after one cut pass
    assert(dupPositions(cut) == 0L, "repetition signal drops to zero")
    val report = cut.select("doc_id", "n_span_tokens_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report(1L) == 0L && report(2L) == 12L && report(3L) == 12L)

    // composed ahead of curate, the quality gate judges the POST-cut
    // text: doc 4 (2 tokens after the cut) falls below the floor
    val kept = Curation.curate(Curation.cutSpans(corpus).drop("n_span_tokens_removed"),
        minTokens = 5, minUniqRatio = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(4L), "doc reduced to crumbs by the cut fails the gate")
    assert(Set(1L, 2L, 3L, 5L, 6L).subsetOf(kept), "substantial docs survive")
  }

  test("exactDedup picks a content-deterministic survivor when doc_ids tie") {
    // at-least-once sources / non-unique foreign ids: same doc_id, same
    // text, different payload column — the survivor must not depend on
    // shuffle order (pins the xxhash64 tiebreak in the window sort)
    val tied = Seq(
      (1L, "one two three four five six", "srcA"),
      (1L, "one two three four five six", "srcB"),
      (2L, "seven eight nine ten eleven twelve", "srcC"))
      .toDF("doc_id", "text", "source")
    def survivors() = Curation.exactDedup(tied.repartition(5))
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = survivors()
    assert(a.keySet == Set(1L, 2L), "one survivor per fingerprint")
    (1 to 5).foreach { _ =>
      assert(survivors() == a, "survivor choice is a pure function of content")
    }
  }

  test("stop-shingle guard drops hot shingles from the jaccard universe") {
    // two docs that share ONLY a planted hot phrase (df = 4 > cap of 3),
    // plus two docs that are near-dups through non-hot shingles
    val hot = "the quick brown fox"
    val corpus = Seq(
      (1L, s"$hot alpha beta gamma delta"),
      (2L, s"$hot epsilon zeta eta theta"),
      (3L, s"$hot iota kappa lambda mu one two three"),
      (4L, s"$hot iota kappa lambda mu one two four"))
      .toDF("doc_id", "text")

    // uncapped: docs 1&2 ARE near-dups through the hot phrase alone
    val uncapped = NearDup.pairs(corpus, threshold = 0.2, maxShingleDf = Long.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))

    // capped at df>3: the hot-phrase shingles ("the quick", "quick brown
    // fox alpha"… the 3-shingles inside the prefix have df 4) vanish, so
    // 1&2 no longer pair, while 3&4 still pair through their distinct tail
    val capped = NearDup.pairs(corpus, threshold = 0.2, maxShingleDf = 3L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!capped.contains((1L, 2L)), "pair held together only by a stop-shingle is dropped")
    assert(capped.contains((3L, 4L)), "genuine near-dups survive the cap")
  }

  test("scrub: PII-differing duplicates dedup together; composes onto a streaming frame") {
    import spark.implicits._
    // 5 tokens, every 3-shingle contains the PII token — so the RAW
    // texts share ZERO shingles (no near-dup) and both survive curate;
    // after scrub they are byte-identical and exact-dedup to doc 1
    val docs = Seq(
      (1L, "alpha beta a@x.io gamma delta"),
      (2L, "alpha beta b@y.io gamma delta"),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    graft.CacheRegistry.unpersistAll()
    val raw = Curation.curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    graft.CacheRegistry.unpersistAll()
    val scrubbed = Curation.curate(Curation.scrub(docs)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    graft.CacheRegistry.unpersistAll()
    assert(raw == Set(1L, 2L, 3L), s"raw text keeps both PII variants: $raw")
    assert(scrubbed == Set(1L, 3L), s"scrubbed variants must dedup to min doc_id: $scrubbed")
    // streaming composition: the SAME stateless call on a streaming frame
    val dir = java.nio.file.Files.createTempDirectory("scrub-stream").toString
    Seq((10L, "ping me at c@z.org or 1.2.3.4")).toDF("doc_id", "text")
      .write.parquet(s"$dir/in")
    val sdf = spark.readStream.schema("doc_id LONG, text STRING").parquet(s"$dir/in")
    val q = Curation.scrub(sdf).writeStream.format("memory")
      .queryName("scrub_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("scrub_stream")
      .select("text", "n_emails", "n_ipv4").collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "ping me at <EMAIL> or <IP>")
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 1L)
  }

  test("CC clustering converges on a deep chain (exercises the checkpoint path)") {
    // doc i = 10 consecutive words starting at 2i from a unique-word
    // stream: adjacent docs share 6 of their 8 shingles (J = 6/10 = 0.6),
    // docs two apart share 4 of 8 (J = 4/12 = 0.33 < 0.5) — a PATH graph.
    // 16 docs → diameter 15 → ~15 propagation rounds: enough that a
    // chained logical lineage (which doubles per round — the round plan
    // references labels twice) would OOM plan rendering; pins the
    // per-round flat re-rooting in NearDup.clusters.
    val nDocs = 16
    val words = (0 until 2 * nDocs + 10).map(i => s"w$i")
    val chain = (0 until nDocs).map { i =>
      (i.toLong + 100L, words.slice(2 * i, 2 * i + 10).mkString(" "))
    }.toDF("doc_id", "text")
    graft.CacheRegistry.unpersistAll() // isolate from other suites' memos
    // localMaxPairs = 0 forces the DISTRIBUTED loop — the default size
    // gate would resolve a 15-pair graph on the driver and this spec
    // exists to exercise the propagation loop's re-rooting
    val out = NearDup.components(NearDup.pairs(chain), "neardup.clusters",
        localMaxPairs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == nDocs, "every chained doc lands in the graph")
    assert(out.values.toSet == Set(100L), "one component, labeled by its min doc_id")
    graft.CacheRegistry.unpersistAll()
  }

  test("components: driver union-find path equals the distributed loop") {
    import spark.implicits._
    graft.CacheRegistry.unpersistAll()
    // chains, a singleton-pair, and out-of-order edges (5,4): both paths
    // must label every node with its component's min doc_id
    val prs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (5L, 4L)).toDF("doc_a", "doc_b")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = toSet(NearDup.components(prs, "spec.cc.local"))
    val dist = toSet(NearDup.components(prs, "spec.cc.dist", localMaxPairs = 0))
    assert(local == dist, s"local $local vs distributed $dist")
    assert(local((5L, 1L)), "5 reaches 1 through the out-of-order edge")
    assert(local((22L, 20L)))
    graft.CacheRegistry.unpersistAll()
  }

  test("clusters returns a frame that STAYS cached after the loop caches drop") {
    import spark.implicits._
    graft.CacheRegistry.unpersistAll()
    val docs2 = (0 until 6).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${2 * i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = NearDup.clusters(docs2)
    // Spark 4.1 Dataset.unpersist cascades into dependent cache entries;
    // the returned frame is re-rooted so the loop-frame unpersists inside
    // clusters() cannot drop it — without that, this storageLevel reads
    // NONE and every consumer silently recomputes through RDD lineage
    assert(out.storageLevel.useMemory,
      s"clusters() result lost its cache entry (storageLevel ${out.storageLevel})")
    assert(graft.CacheRegistry.entries.contains("neardup.clusters"))
    graft.CacheRegistry.unpersistAll()
    assert(!out.storageLevel.useMemory)
  }

  test("CacheRegistry same-name retain with a non-matching plan replaces the entry") {
    import spark.implicits._
    graft.CacheRegistry.unpersistAll()
    // LogicalRDD roots never sameResult-match across calls — the shape of
    // every kernel-closure / re-rooted frame (d04 sim, ivf tagged,
    // clusters). Pre-eviction each retain pinned a NEW full cached copy.
    def rerooted(): org.apache.spark.sql.DataFrame = {
      val p = Seq(1L, 2L, 3L).toDF("x")
      spark.createDataFrame(p.rdd, p.schema)
    }
    val r1 = graft.CacheRegistry.retain("spec.evict", rerooted())
    r1.count()
    assert(r1.storageLevel.useMemory)
    val r2 = graft.CacheRegistry.retain("spec.evict", rerooted())
    r2.count()
    assert(graft.CacheRegistry.entries.count(_ == "spec.evict") == 1,
      s"one live entry per name, got ${graft.CacheRegistry.entries}")
    assert(!r1.storageLevel.useMemory, "superseded same-name cache must be released")
    assert(r2.storageLevel.useMemory)
    graft.CacheRegistry.unpersistAll()
  }

  test("repeated clusters() calls hold one neardup.clusters entry") {
    import spark.implicits._
    graft.CacheRegistry.unpersistAll()
    val docs2 = (0 until 6).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${2 * i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    NearDup.clusters(docs2)
    val out2 = NearDup.clusters(docs2)
    assert(graft.CacheRegistry.entries.count(_ == "neardup.clusters") == 1,
      s"re-rooted result must replace, not accumulate: ${graft.CacheRegistry.entries}")
    assert(out2.storageLevel.useMemory, "the LIVE entry is the latest call's frame")
    graft.CacheRegistry.unpersistAll()
  }

  test("warm clusters() call is memoized; unpersistAll invalidates") {
    import spark.implicits._
    graft.CacheRegistry.unpersistAll()
    val docs2 = (0 until 6).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${2 * i + j}").mkString(" "))
    }.toDF("doc_id", "text")
    val a = NearDup.clusters(docs2)
    val b = NearDup.clusters(docs2)
    // the loop result can never plan-match (LogicalRDD root), so without
    // the memo the second call re-runs every propagation round; identity
    // equality proves zero recompute
    assert(a eq b, "warm call must return the memoized frame, not re-run the loop")
    graft.CacheRegistry.unpersistAll()
    val c = NearDup.clusters(docs2)
    assert(!(c eq a), "session teardown must invalidate the memo")
    assert(c.collect().toSet == a.collect().toSet,
      "post-invalidation rebuild must reproduce the same clustering")
    graft.CacheRegistry.unpersistAll()
  }

  test("CacheRegistry retains once per plan and unpersistAll releases") {
    graft.CacheRegistry.unpersistAll()
    val before = graft.CacheRegistry.entries.size
    NearDup.pairs(docs.limit(50)).count()
    NearDup.pairs(docs.limit(50)).count() // plan-identical: must not re-register
    val added = graft.CacheRegistry.entries.size - before
    assert(added == 2, s"expected shingles+pairs registered once, got $added new entries")
    graft.CacheRegistry.unpersistAll()
    assert(graft.CacheRegistry.entries.isEmpty)
  }
}
