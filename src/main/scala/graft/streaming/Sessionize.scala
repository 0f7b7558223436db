package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization via `flatMapGroupsWithState` — the custom-
  * state operator the batch `q_sessionize` gap-based logic maps onto in
  * a live pipeline (survey §2.7 T10; batch twin in
  * queries/Behavioral.sessionize). A session closes when its key sees no
  * event for `gapSeconds`; closure is emitted either by a newer event
  * arriving past the gap or by event-time timeout once the watermark
  * passes the session's deadline — so results are deterministic under
  * replay (no wall-clock dependence).
  *
  * State per key is O(1) (the open session's bounds), the canonical
  * shape for unbounded keys at scale.
  */
object Sessionize {

  final case class Event(userId: Long, ts: Timestamp, value: Double)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(start: Long, last: Long, nEvents: Long, valueSum: Double)

  /** Closed session emitted downstream. */
  final case class Session(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
                           durationSeconds: Long, nEvents: Long, valueSum: Double)

  private def close(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.last),
      (s.last - s.start) / 1000L, s.nEvents, s.valueSum)

  /** The per-key transition function. Events inside a batch are sorted
    * by event time (flatMapGroupsWithState gives no intra-batch order
    * guarantee); sessions split on gaps > `gapSeconds`. */
  private[streaming] def transition(gapSeconds: Long)(
      userId: Long, events: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
    val gapMs = gapSeconds * 1000L
    if (state.hasTimedOut) {
      val closed = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return closed
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.last > gapMs =>
          closed += close(userId, s)
          open = Some(SessionState(t, t, 1L, e.value))
        case Some(s) =>
          open = Some(SessionState(s.start, math.max(s.last, t), s.nEvents + 1, s.valueSum + e.value))
        case None =>
          open = Some(SessionState(t, t, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close via event time: fires when the watermark passes last+gap
      state.setTimeoutTimestamp(s.last + gapMs)
    }
    closed.result().iterator
  }

  /** Wire the operator: `events` must carry a watermark on `ts` (the
    * timeout clock). Output mode append (closed sessions only). */
  def sessions(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ss = Encoders.product[SessionState]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(transition(gapSeconds))
  }
}
