package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of e13's first-order transition matrix: per-user event
  * chains finalized under the watermark, emitted as raw `(user, prev,
  * cur)` transition pairs (the matrix itself is a trivial downstream
  * aggregation — emitting pairs keeps the operator composable and the
  * sink idempotent per pair).
  *
  * Correctness rule (the subtle one, mirroring [[StatefulSessions]]): a
  * transition a→b is final only when the WATERMARK passes b — a later
  * micro-batch may still deliver an admissible event (ts ≥ watermark)
  * that sorts between a and b and would change the chain. So the state
  * buffers the not-yet-finalizable suffix, bounded by the watermark
  * horizon, plus ONE anchor (the last finalized event): the anchor is
  * the only part that never expires — a user's next event may arrive
  * arbitrarily later — making steady-state memory O(users), exactly the
  * last-event-per-user a batch lag() would need anyway.
  *
  * Tie order matches batch e13: (ts, event_id). An event with ts equal
  * to b's but a smaller id could still displace b, so finality requires
  * strictly ts < watermark (an event AT the watermark is admissible).
  */
object TransitionStream {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  final case class Transition(user_id: Long, prev_type: String, event_type: String)

  /** (micros, event_id, type): anchor + chronological pending suffix. */
  type St = (Option[(Long, Long, String)], List[(Long, Long, String)])

  def transitions(events: Dataset[Ev]): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val stEnc = Encoders.kryo[St]
    implicit val keyEnc = Encoders.scalaLong
    events
      .withWatermark("ts", EventStreams.Lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private[streaming] def process(
      userId: Long, events: Iterator[Ev], state: GroupState[St]): Iterator[Transition] = {
    val (anchor0, pending0) = state.getOption.getOrElse((None, Nil))
    val merged = (pending0 ++ events.map(e => (micros(e.ts), e.event_id, e.event_type)))
      .sortBy(e => (e._1, e._2))
    val wmMicros = state.getCurrentWatermarkMs() * 1000L

    var anchor = anchor0
    val out = List.newBuilder[Transition]
    var rest = merged
    while (rest.nonEmpty && rest.head._1 < wmMicros) {
      val e = rest.head
      anchor.foreach(a => out += Transition(userId, a._3, e._3))
      anchor = Some(e)
      rest = rest.tail
    }

    state.update((anchor, rest))
    if (rest.nonEmpty)
      // wake when the watermark passes the earliest pending event so its
      // transition finalizes even if the user goes quiet
      state.setTimeoutTimestamp(rest.head._1 / 1000L + 1L)
    out.result().iterator
  }
}
