package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running counters with an event-time idle flush, on Spark 4's
  * `transformWithState` (the arbitrary-stateful-processing successor to
  * `flatMapGroupsWithState`: named state variables, first-class timers,
  * per-state TTL). Complements [[Sessionize]] (which stays on
  * `flatMapGroupsWithState` as the classic formulation): here the
  * processor keeps TWO named state variables — the running totals and
  * the armed timer's timestamp (so re-arming can delete the stale
  * timer) — and lets the engine fire `handleExpiredTimer` once the
  * WATERMARK passes a key's idle deadline.
  *
  * Semantics: every input batch emits the key's updated running totals
  * (`closed = false`, Update-mode consumers overwrite by key); when a
  * key sees nothing for `quietSeconds` of EVENT time, the engine emits
  * one final `closed = true` row and clears the key's state — state
  * stays bounded for an unbounded key universe, the same discipline as
  * Sessionize's open-session cap.
  *
  * Scale shape: state per key is O(1) (two scalars), reads/writes are
  * point lookups in the state store, and the only shuffle is the
  * groupByKey hash partitioning — identical physical shape at 1000
  * executors. `transformWithState` requires the RocksDB state store
  * provider (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`), which is also the right
  * choice at scale: state spills to local disk with changelog
  * checkpointing instead of living on the heap.
  */
object Accumulate {

  final case class Event(userId: Long, ts: Timestamp, value: Double)

  /** Running totals carried between micro-batches. */
  final case class Totals(nEvents: Long, valueSum: Double, lastSec: Long)

  /** Emitted row: running (`closed=false`) or final idle flush. */
  final case class Running(userId: Long, nEvents: Long, valueSum: Double, closed: Boolean)

  final class Processor(quietSeconds: Long)
      extends StatefulProcessor[Long, Event, Running] {

    @transient private var totals: ValueState[Totals] = _
    @transient private var armedTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[Totals]("totals", Encoders.product[Totals], TTLConfig.NONE)
      armedTimer = getHandle.getValueState[Long]("armedTimer", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Running] = {
      val prev = if (totals.exists()) totals.get() else Totals(0L, 0.0, 0L)
      var n = prev.nEvents
      var sum = prev.valueSum
      var last = prev.lastSec
      rows.foreach { e =>
        n += 1
        sum += e.value
        last = math.max(last, e.ts.getTime / 1000L)
      }
      totals.update(Totals(n, sum, last))
      // re-arm: exactly one live timer per key
      if (armedTimer.exists()) getHandle.deleteTimer(armedTimer.get())
      val deadline = (last + quietSeconds) * 1000L
      getHandle.registerTimer(deadline)
      armedTimer.update(deadline)
      Iterator.single(Running(key, n, sum, closed = false))
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Running] = {
      val out: Iterator[Running] =
        if (totals.exists()) {
          val t = totals.get()
          Iterator.single(Running(key, t.nEvents, t.valueSum, closed = true))
        } else Iterator.empty
      totals.clear()
      armedTimer.clear()
      out
    }
  }

  /** Wire the operator: `events` must carry a watermark on `ts` (the
    * timer clock in EventTime mode). Update output mode — running rows
    * overwrite per key; the `closed=true` row is the key's last. */
  def running(events: Dataset[Event], quietSeconds: Long = 60L): Dataset[Running] = {
    implicit val enc: Encoder[Running] = Encoders.product[Running]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .transformWithState(new Processor(quietSeconds), TimeMode.EventTime(), OutputMode.Update())
  }
}
