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

  def anomalies(events: Dataset[Ev]): Dataset[AnomalyRow] = {
    implicit val outEnc = Encoders.product[AnomalyRow]
    implicit val stEnc = Encoders.kryo[St]
    implicit val keyEnc = Encoders.STRING
    // hour bucketing and labels follow the SESSION timezone, exactly
    // like batch e18's date_trunc/date_format — a UTC-pinned formatter
    // would silently break the streamed==batch parity on any session
    // whose timezone is not UTC (incl. half-hour-offset zones, where
    // even the bucket BOUNDARIES differ from epoch-hour multiples)
    val zone = java.time.ZoneId.of(
      events.sparkSession.conf.get("spark.sql.session.timeZone"))
    events
      .withWatermark("ts", EventStreams.Lateness)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(zone))
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private[streaming] def process(zone: java.time.ZoneId)(eventType: String,
      events: Iterator[Ev], state: GroupState[St]): Iterator[AnomalyRow] = {
    var (ring, pending) = state.getOption.getOrElse((Nil: List[Long], Map.empty[Long, Long]))
    events.foreach { e =>
      // truncate to the hour IN THE SESSION ZONE, then key state by the
      // bucket start instant (zone-dependent for non-whole-hour offsets)
      val h = java.time.Instant.ofEpochSecond(
          micros(e.ts) / 1000000L, (micros(e.ts) % 1000000L) * 1000L)
        .atZone(zone).truncatedTo(java.time.temporal.ChronoUnit.HOURS)
        .toInstant
      val hUs = h.getEpochSecond * 1000000L
      pending = pending.updated(hUs, pending.getOrElse(hUs, 0L) + 1L)
    }
    val wm = state.getCurrentWatermarkMs() * 1000L
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(zone)
    val out = List.newBuilder[AnomalyRow]
    // finalize observed hours in order; score only against a FULL ring
    pending.keys.toSeq.sorted.takeWhile(_ + HourUs <= wm).foreach { h =>
      val n = pending(h)
      pending = pending - h
      if (ring.length == 24) {
        // BigInt throughout: s², 24·q, dev² and 9·varn overflow i64
        // from ~8.4e7 events/hour/type, where the batch form fails
        // LOUDLY under ANSI — driver-side Long arithmetic would wrap
        // SILENTLY instead, emitting a wrong flag at exactly the
        // volumes an anomaly detector targets. Within i64 range the
        // values (and the Double conversions feeding z) are identical
        // to the batch arithmetic; beyond it the stream keeps
        // producing correct answers where batch refuses (documented
        // divergence in the safe direction). Few rows reach this
        // point, so the boxed arithmetic costs nothing.
        var s = BigInt(0)
        var q = BigInt(0)
        ring.foreach { c => s += c; q += BigInt(c) * c }
        val dev = BigInt(n) * 24 - s
        val varn = q * 24 - s * s
        val z: java.lang.Double =
          if (varn > 0) java.lang.Double.valueOf(dev.toDouble / math.sqrt(varn.toDouble))
          else null
        out += AnomalyRow(eventType,
          fmt.format(java.time.Instant.ofEpochSecond(h / 1000000L)),
          n, z, dev * dev > varn * 9)
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
