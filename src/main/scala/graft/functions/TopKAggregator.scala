package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class ScoredId(score: Double, id: Long)
final case class TopK(items: Seq[ScoredId])

/** Bounded top-k by (score desc, id asc) as a typed `Aggregator`
  * (SURVEY §4.2b): each partition keeps at most k candidates map-side and
  * merges k-vs-k buffers, so a per-group top-k never materializes or
  * sorts the full candidate set the way a rank-window does. Use through
  * `functions.udaf(new TopKAggregator(k))`.
  */
final class TopKAggregator(k: Int) extends Aggregator[ScoredId, List[ScoredId], TopK] {
  require(k > 0)

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] =
    if (buf.lengthCompare(k) < 0) (a :: buf).sorted(ord)
    else if (ord.lt(a, buf.last)) (a :: buf.init).sorted(ord)
    else buf

  override def merge(x: List[ScoredId], y: List[ScoredId]): List[ScoredId] =
    (x ++ y).sorted(ord).take(k)

  override def finish(buf: List[ScoredId]): TopK = TopK(buf)

  override def bufferEncoder: Encoder[List[ScoredId]] = Encoders.kryo[List[ScoredId]]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
