package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Property-style coverage (seeded sampling) for [[Documents.chunkDocuments]]
  * and [[Embeddings.lshPlanes]] — the two round-10 kernels whose
  * correctness is pure arithmetic a driver-side reference can replay
  * exhaustively.
  */
class ChunkPropSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("chunkDocuments: driver reference replay over 200 random docs x 5 geometries") {
    // random word-soup docs, including single-token and whitespace-edge
    // shapes (split(' ') never yields an empty array: '' -> [''])
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(50)
      (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val byId = docs.toMap
    for ((c, o) <- Seq((1, 0), (4, 0), (4, 1), (8, 7), (5, 2))) {
      val step = c - o
      val got = Documents.chunkDocuments(df, c, o)
        .select("doc_id", "chunk_id", "tok_start", "n_toks", "chunk_text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1) // SQL split keeps trailing empties
        val starts = 0 until toks.length by step
        val chunks = got.getOrElse(id, Array.empty).sortBy(_._2)
        assert(chunks.length == starts.length, s"doc $id c=$c o=$o")
        chunks.zip(starts).foreach { case ((_, cid, st, n, body), expSt) =>
          assert(st == expSt && cid == expSt / step, s"doc $id chunk $cid")
          assert(n == math.min(c, toks.length - expSt).toLong)
          assert(body == toks.slice(expSt, expSt + c).mkString(" "))
        }
        // coverage: every token index lands in >= 1 chunk; exactly 1 when
        // overlap = 0 (the partition case)
        val cover = Array.fill(toks.length)(0)
        starts.foreach(s => (s until math.min(s + c, toks.length)).foreach(cover(_) += 1))
        assert(cover.forall(_ >= 1), s"doc $id uncovered token")
        if (o == 0) assert(cover.forall(_ == 1), s"doc $id double-covered at overlap 0")
      }
    }
  }

  test("lshPlanes: minimal plane count with the bucket bound, monotone, capped") {
    def reference(n: Long, lo: Int, hi: Int): Int =
      (lo to hi).find(p => (512L << p) >= n).getOrElse(hi)
    val interesting = Seq(0L, 1L, 511L, 512L, 513L) ++
      (0 to 20).flatMap(k => Seq((512L << k) - 1, 512L << k, (512L << k) + 1)) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 100000000L)
    for (n <- interesting; (lo, hi) <- Seq((4, 16), (6, 10), (1, 62))) {
      val p = Embeddings.lshPlanes(n, lo, hi)
      assert(p == reference(n, lo, hi), s"n=$n range=$lo..$hi")
      assert(p >= lo && p <= hi)
      // the bound: average bucket <= 512 unless capped
      assert((512L << p) >= n || p == hi, s"bucket bound violated at n=$n")
      // minimality: one fewer plane would break the bound (or be under lo)
      if (p > lo) assert((512L << (p - 1)) < n, s"non-minimal p at n=$n")
    }
    // monotone in n for a fixed range
    val ps = (0L to 2000000L by 9973L).map(Embeddings.lshPlanes(_, 4, 16))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "not monotone in n")
  }
}
