package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.functions.Decisions

/** Typed action-queue row validation (reference D6:
  * rt_action_queue_producer.py:95-339 — required fields, domain checks,
  * time ordering, non-empty reason codes; invalid rows are returned as
  * a reject Dataset with codes, never silently dropped).
  *
  * Dataset[T]-typed (not DataFrame) deliberately: the queue write path
  * is the one place the reference models rows as frozen dataclasses,
  * and compile-time field checks + exhaustive reject codes are the
  * point. Runs distributed (a pure function in mapPartitions-style
  * flatMap); no driver-side loop.
  */
object QueueValidation {

  final case class QueueRow(
      action_id: String,
      video_id: String,
      window_start: Timestamp,
      window_end: Timestamp,
      decision_type: String,
      priority: Int,
      ttl_minutes: Int,
      rule_version: String,
      reason_codes: Seq[String],
      decided_at: Timestamp,
      expires_at: Timestamp)

  final case class QueueReject(video_id: String, reject_code: String, detail: String)

  val ValidDecisions: Set[String] = Set(Decisions.Boost, Decisions.Review, Decisions.Rescue)
  val PriorityByDecision: Map[String, Int] =
    Map(Decisions.Rescue -> 1, Decisions.Review -> 2, Decisions.Boost -> 3)

  /** All reject codes for one row, in check order; empty = valid. */
  def rejectsFor(r: QueueRow): Seq[QueueReject] = {
    def bad(code: String, detail: String) = QueueReject(r.video_id, code, detail)
    val checks = Seq(
      Option.when(r.action_id == null || r.action_id.isEmpty)(
        bad("MISSING_ACTION_ID", "action_id empty")),
      Option.when(r.video_id == null || r.video_id.isEmpty)(
        bad("MISSING_VIDEO_ID", "video_id empty")),
      Option.when(r.window_start == null || r.window_end == null)(
        bad("MISSING_WINDOW", "window bounds required")),
      Option.when(r.window_start != null && r.window_end != null &&
          !r.window_end.after(r.window_start))(
        bad("INVALID_WINDOW_ORDER", s"${r.window_end} !> ${r.window_start}")),
      Option.when(!ValidDecisions.contains(r.decision_type))(
        bad("INVALID_DECISION_TYPE", s"'${r.decision_type}' (NO_ACTION is never persisted)")),
      Option.when(PriorityByDecision.get(r.decision_type).exists(_ != r.priority))(
        bad("PRIORITY_MISMATCH", s"${r.decision_type} must be priority ${PriorityByDecision(r.decision_type)}, got ${r.priority}")),
      Option.when(r.ttl_minutes <= 0)(
        bad("INVALID_TTL", s"ttl ${r.ttl_minutes} <= 0")),
      Option.when(r.rule_version == null || r.rule_version.isEmpty)(
        bad("MISSING_RULE_VERSION", "rule_version empty")),
      Option.when(r.reason_codes == null || r.reason_codes.isEmpty)(
        bad("EMPTY_REASON_CODES", "at least one reason code required")),
      Option.when(r.decided_at == null || r.expires_at == null ||
          !r.expires_at.after(r.decided_at))(
        bad("INVALID_EXPIRY_ORDER", "expires_at must follow decided_at")))
    checks.flatten
  }

  final case class SplitResult(valid: Dataset[QueueRow], rejects: Dataset[QueueReject])

  def split(rows: Dataset[QueueRow])(implicit spark: SparkSession): SplitResult = {
    import spark.implicits._
    SplitResult(
      valid = rows.filter((r: QueueRow) => rejectsFor(r).isEmpty),
      rejects = rows.flatMap((r: QueueRow) => rejectsFor(r)))
  }
}
