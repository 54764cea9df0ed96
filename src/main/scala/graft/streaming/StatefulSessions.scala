package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** Custom sessionization state machine on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the hand-rolled
  * counterpart of `EventStreams.sessionize` for session logic
  * `session_window` can't express (per-session custom accumulators,
  * emit-on-close semantics, cross-batch gap handling under a watermark).
  *
  * Correctness rule: a session closes only when the WATERMARK passes its
  * last event + gap — an in-batch split alone is not enough, because a
  * later micro-batch may still deliver an event (≥ watermark) that lands
  * inside the gap. State per user is the not-yet-finalizable suffix of
  * events, bounded by the watermark horizon (late events beyond the
  * watermark are dropped upstream by `withWatermark`).
  */
object StatefulSessions {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  final case class SessionOut(user_id: Long, session_start: String, n_events: Long, sum_value: Double)

  /** buffered (micros, value) pairs awaiting finalization */
  type Buf = List[(Long, Double)]

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  def sessionize(events: Dataset[Ev], gapMicros: Long = 1800L * 1000000L): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val bufEnc = Encoders.kryo[Buf]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", EventStreams.Lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapMicros))
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private[streaming] def process(gapMicros: Long)(
      userId: Long, events: Iterator[Ev], state: GroupState[Buf]): Iterator[SessionOut] = {
    val buffered = state.getOption.getOrElse(Nil)
    val all = (buffered ++ events.map(e => (micros(e.ts), e.value))).sortBy(_._1)
    if (all.isEmpty) { state.remove(); return Iterator.empty }

    val wmMicros = state.getCurrentWatermarkMs() * 1000L

    // split into gap-delimited sessions (strict >, matching the batch
    // gaps-and-islands in e04)
    val sessions = all.tail.foldLeft(List(List(all.head))) { (acc, ev) =>
      if (ev._1 - acc.head.head._1 > gapMicros) List(ev) :: acc
      else (ev :: acc.head) :: acc.tail
    }.map(_.reverse).reverse // chronological sessions, chronological events

    // a session is final when no admissible future event can extend it
    val (closed, open) = sessions.partition(s => s.last._1 + gapMicros <= wmMicros)

    if (open.isEmpty) state.remove()
    else {
      state.update(open.flatten)
      // wake up when the watermark passes the EARLIEST open session's
      // close point (a later session's close point would delay emitting
      // earlier finished sessions for a quiet user); each wake-up re-arms
      // for the next session still open
      state.setTimeoutTimestamp(open.head.last._1 / 1000L + gapMicros / 1000L + 1L)
    }

    closed.iterator.map { s =>
      SessionOut(userId,
        Fmt.format(java.time.Instant.ofEpochSecond(s.head._1 / 1000000L)),
        s.length.toLong,
        s.map(_._2).sum)
    }
  }
}
