package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization via `flatMapGroupsWithState` — the custom-
  * state operator the batch `q_sessionize` gap-based logic maps onto in
  * a live pipeline (survey §2.7 T10; batch twin in
  * queries/Behavioral.sessionize). A session closes when its key sees no
  * event for `gapSeconds` — and closure is committed ONLY once the
  * watermark has passed the session's deadline (last + gap), so a
  * late-but-within-watermark event can still extend, backfill, or
  * bridge open sessions. Results are therefore independent of
  * micro-batch boundaries: the closed-session set is a pure function of
  * the event stream and the watermark policy.
  *
  * State per key is the list of OPEN sessions — bounded by
  * watermark-delay / gap + 1 (only sessions whose deadline the
  * watermark hasn't passed are retained), the canonical shape for
  * unbounded keys at scale.
  */
object Sessionize {

  final case class Event(userId: Long, ts: Timestamp, value: Double)

  /** One open session's bounds. */
  final case class SessionState(start: Long, last: Long, nEvents: Long, valueSum: Double)

  /** Open sessions carried between micro-batches (newest-first order is
    * not guaranteed; normalization sorts by start). */
  final case class OpenSessions(sessions: List[SessionState])

  /** Closed session emitted downstream. */
  final case class Session(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
                           durationSeconds: Long, nEvents: Long, valueSum: Double)

  private def close(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.last),
      (s.last - s.start) / 1000L, s.nEvents, s.valueSum)

  /** Sort by start and merge any sessions within `gapMs` of each other
    * (an event can bridge two previously-separate sessions). */
  private def normalize(sessions: List[SessionState], gapMs: Long): List[SessionState] =
    sessions.sortBy(_.start).foldLeft(List.empty[SessionState]) { (acc, s) =>
      acc match {
        case h :: t if s.start <= h.last + gapMs =>
          SessionState(h.start, math.max(h.last, s.last),
            h.nEvents + s.nEvents, h.valueSum + s.valueSum) :: t
        case _ => s :: acc
      }
    }.reverse

  /** Emit sessions whose deadline the watermark has passed; retain the
    * rest and arm the event-time timeout at the earliest remaining
    * deadline (clamped above the watermark, as Spark requires). */
  private def drain(userId: Long, sessions: List[SessionState], gapMs: Long,
                    state: GroupState[OpenSessions]): Iterator[Session] = {
    val wm = state.getCurrentWatermarkMs()
    val (closed, open) = sessions.partition(s => s.last + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open))
      state.setTimeoutTimestamp(math.max(open.map(_.last + gapMs).min, wm + 1))
    }
    closed.sortBy(_.start).map(close(userId, _)).iterator
  }

  /** The per-key transition function. Events inside a batch are sorted
    * by event time (flatMapGroupsWithState gives no intra-batch order
    * guarantee); an event joins any open session within the gap of its
    * bounds, else opens a new one; bridged sessions merge. */
  private[streaming] def transition(gapSeconds: Long)(
      userId: Long, events: Iterator[Event], state: GroupState[OpenSessions]): Iterator[Session] = {
    val gapMs = gapSeconds * 1000L
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    if (state.hasTimedOut) return drain(userId, existing, gapMs, state)
    val withEvents = events.toSeq.sortBy(_.ts.getTime).foldLeft(existing) { (sessions, e) =>
      val t = e.ts.getTime
      sessions.indexWhere(s => t >= s.start - gapMs && t <= s.last + gapMs) match {
        case -1 => SessionState(t, t, 1L, e.value) :: sessions
        case i =>
          val s = sessions(i)
          sessions.updated(i, SessionState(math.min(s.start, t), math.max(s.last, t),
            s.nEvents + 1, s.valueSum + e.value))
      }
    }
    drain(userId, normalize(withEvents, gapMs), gapMs, state)
  }

  /** Wire the operator: `events` must carry a watermark on `ts` (the
    * timeout clock). Output mode append (closed sessions only). */
  def sessions(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ss = Encoders.product[OpenSessions]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(transition(gapSeconds))
  }
}
