package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared event-enum helpers: the five-way conditional-count pivot (the
  * reference's gold counter columns) and the deterministic invalid-row
  * id. One definition — the streaming gold aggregate, the batch serving
  * counters, and both quarantine projections must never drift apart. */
object EventCounters {

  val EventTypes: Seq[String] = Seq("view", "click", "purchase", "signup", "error")

  /** views / clicks / purchases / signups / errors conditional counts. */
  def typeCounts: Seq[Column] =
    EventTypes.map(t => count(when(col("event_type") === t, 1)).as(t + "s"))

  /** Deterministic invalid id = topic:partition:offset (reference P8). */
  def invalidEventId: Column =
    concat_ws(":", coalesce(col("source_topic"), lit("unknown")),
      col("source_partition"), col("source_offset"))
}
