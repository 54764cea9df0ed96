package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of e11's ordered funnel (signup → click → purchase,
  * each stage the user's FIRST qualifying event strictly after the
  * previous stage): emits a `(user, stage, t)` row the moment a stage
  * becomes watermark-final. Batch's `min(t)`-per-stage equals the first
  * qualifying event in (ts, event_id) order, so a single forward fold
  * over watermark-final events reproduces the batch chain exactly — an
  * event can only influence a stage decision once no earlier-sorting
  * admissible event can still arrive (strictly ts < watermark, same
  * finality rule as [[TransitionStream]]).
  *
  * State: the three resolved stage times plus the not-yet-final event
  * suffix, watermark-bounded; once the funnel completes the suffix is
  * dropped and the state is a constant-size tombstone. Steady-state
  * memory is O(users) like the batch per-user aggregates.
  */
object FunnelStream {

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  final case class StageHit(user_id: Long, stage: String, t: Long)

  /** (t_signup, t_click, t_purchase, pending (micros, event_id, type)). */
  type St = (Option[Long], Option[Long], Option[Long], List[(Long, Long, String)])

  private val Stages = Set("signup", "click", "purchase")

  def stages(events: Dataset[Ev]): Dataset[StageHit] = {
    implicit val outEnc = Encoders.product[StageHit]
    implicit val stEnc = Encoders.kryo[St]
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter($"event_type".isin(Stages.toSeq: _*))
      .withWatermark("ts", EventStreams.Lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process _)
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  private[streaming] def process(
      userId: Long, events: Iterator[Ev], state: GroupState[St]): Iterator[StageHit] = {
    val (s0, c0, p0, pending0) = state.getOption.getOrElse((None, None, None, Nil))
    val merged = (pending0 ++ events.map(e => (micros(e.ts), e.event_id, e.event_type)))
      .sortBy(e => (e._1, e._2))
    val wmMicros = state.getCurrentWatermarkMs() * 1000L

    var (tS, tC, tP) = (s0, c0, p0)
    val out = List.newBuilder[StageHit]
    var rest = merged
    while (rest.nonEmpty && rest.head._1 < wmMicros) {
      val (t, _, tpe) = rest.head
      tpe match {
        case "signup" if tS.isEmpty =>
          tS = Some(t); out += StageHit(userId, "signup", t)
        case "click" if tS.isDefined && tC.isEmpty && t > tS.get =>
          tC = Some(t); out += StageHit(userId, "click", t)
        case "purchase" if tC.isDefined && tP.isEmpty && t > tC.get =>
          tP = Some(t); out += StageHit(userId, "purchase", t)
        case _ => // non-qualifying under the ordered-chain rule
      }
      rest = rest.tail
    }

    val keep = if (tP.isDefined) Nil else rest
    state.update((tS, tC, tP, keep))
    if (keep.nonEmpty)
      state.setTimeoutTimestamp(keep.head._1 / 1000L + 1L)
    out.result().iterator
  }
}
