package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of e18's rolling anomaly detection: per event_type,
  * each OBSERVED hour's volume is z-scored against the previous 24
  * observed hourly buckets the moment the watermark finalizes it — the
  * alerting form of the batch monitor (a pipeline wants the spike flag
  * minutes after the hour closes, not at the next batch run).
  *
  * Parity contract: emitted rows EQUAL batch e18's (spec-pinned on a
  * chunked replay). The rolling window is observation-indexed exactly
  * like the batch ROWS frame — empty hours are skipped, not
  * zero-filled (compose [[GapFillStream]] upstream when time-indexed
  * history is wanted) — and a row is emitted only once its type has a
  * full 24-bucket history. The |z| > 3 flag is the same pure-integer
  * predicate ((c·24 − S)² > 9·(24·Q − S²)) and z the same single
  * division of exact i64 sums, so streamed values are bit-identical.
  *
  * Finality and bounds (the [[GapFillStream]] discipline): hour h is
  * scored once the watermark passed its end (h+1h ≤ wm — any event
  * still belonging to h would now be dropped as late, so its count is
  * frozen). State per type: the last ≤24 finalized counts (a fixed
  * ring — O(|types| × 24) forever) plus the not-yet-final pending hour
  * accumulators (bounded by the watermark horizon). An event-time
  * timeout drains quiet types as the watermark advances.
  */
object AnomalyStream {

  final case class Ev(ts: java.sql.Timestamp, event_type: String)
  final case class AnomalyRow(event_type: String, hour: String, n: Long,
      z: java.lang.Double, is_anomaly: Boolean)

  /** (last ≤24 finalized counts, oldest first; pending hourUs → count) */
  type St = (List[Long], Map[Long, Long])

  private val HourUs = 3600L * 1000000L

  private val HourFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  def anomalies(events: Dataset[Ev]): Dataset[AnomalyRow] = {
    implicit val outEnc = Encoders.product[AnomalyRow]
    implicit val stEnc = Encoders.kryo[St]
    implicit val keyEnc = Encoders.STRING
    events
      .withWatermark("ts", EventStreams.Lateness)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private[streaming] def process(eventType: String, events: Iterator[Ev],
      state: GroupState[St]): Iterator[AnomalyRow] = {
    var (ring, pending) = state.getOption.getOrElse((Nil: List[Long], Map.empty[Long, Long]))
    events.foreach { e =>
      val h = Math.floorDiv(micros(e.ts), HourUs) * HourUs
      pending = pending.updated(h, pending.getOrElse(h, 0L) + 1L)
    }
    val wm = state.getCurrentWatermarkMs() * 1000L
    val out = List.newBuilder[AnomalyRow]
    // finalize observed hours in order; score only against a FULL ring
    pending.keys.toSeq.sorted.takeWhile(_ + HourUs <= wm).foreach { h =>
      val n = pending(h)
      pending = pending - h
      if (ring.length == 24) {
        var s = 0L
        var q = 0L
        ring.foreach { c => s += c; q += c * c }
        val dev = n * 24L - s
        val varn = 24L * q - s * s
        val z: java.lang.Double =
          if (varn > 0L) java.lang.Double.valueOf(dev.toDouble / math.sqrt(varn.toDouble))
          else null
        out += AnomalyRow(eventType,
          HourFmt.format(java.time.Instant.ofEpochSecond(h / 1000000L)),
          n, z, dev * dev > 9L * varn)
      }
      ring = (ring :+ n).takeRight(24)
    }
    state.update((ring, pending))
    if (pending.nonEmpty)
      // wake when the watermark passes the earliest unemitted hour's end
      state.setTimeoutTimestamp((pending.keys.min + HourUs) / 1000L + 1L)
    out.result().iterator
  }
}
