package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.functions.Decisions

/** Typed action-queue write-row validation (reference D6:
  * rt_action_queue_producer.py:95-339 — required fields, domain checks,
  * time ordering, non-empty reason codes; invalid rows are returned as
  * a reject Dataset with (code, field, reason), never silently dropped).
  *
  * Dataset[T]-typed (not DataFrame) deliberately: the queue write path
  * is the one place the reference models rows as frozen dataclasses,
  * and compile-time field checks + exhaustive reject codes are the
  * point. Runs distributed (a pure function in flatMap); no driver-side
  * loop. The reference's MISSING_REQUIRED_FIELD code
  * (rt_action_queue_producer.py:95) cannot fire here: a typed row
  * cannot lack a field — the compiler enforces what the Python
  * validator checks at runtime. Its row_index likewise has no
  * distributed meaning; rejects carry (action_id, video_id) identity
  * instead. */
object QueueValidation {

  /** The 18-column producer write row
    * (action-queue-contract.md:19-38, rt_action_queue_producer.py:103-124). */
  final case class QueueRow(
      action_id: String,
      video_id: String,
      decision_type: String,
      priority: Int,
      state: String,
      decided_at: Timestamp,
      window_start: Timestamp,
      window_end: Timestamp,
      expires_at: Timestamp,
      rule_version: String,
      velocity_30m: Double,
      completion_rate_30m: Double,
      skip_rate_30m: Double,
      impressions_30m: Long,
      reason_codes: Seq[String],
      created_at: Timestamp,
      updated_at: Timestamp,
      state_updated_at: Timestamp)

  /** Structured reject mirroring the reference's ActionQueueRowReject
    * (rt_action_queue_producer.py:127-137) minus row_index. */
  final case class QueueReject(
      action_id: String, video_id: String, code: String, field: String, reason: String)

  val ValidDecisions: Set[String] = Set(Decisions.Boost, Decisions.Review, Decisions.Rescue)
  val StateDomain: Set[String] = Decisions.StateDomain.toSet
  val PriorityByDecision: Map[String, Int] =
    Map(Decisions.Rescue -> 1, Decisions.Review -> 2, Decisions.Boost -> 3)

  /** Reference reject codes (rt_action_queue_producer.py:95-100). */
  val NullRequiredField = "NULL_REQUIRED_FIELD"
  val InvalidDecisionType = "INVALID_DECISION_TYPE"
  val InvalidInitialState = "INVALID_INITIAL_STATE"
  val InvalidTimeOrder = "INVALID_TIME_ORDER"
  val EmptyReasonCodes = "EMPTY_REASON_CODES"
  /** Repo-additional codes (stricter than the reference: window order,
    * priority-map consistency, invalid — not just non-initial — state). */
  val InvalidWindowOrder = "INVALID_WINDOW_ORDER"
  val PriorityMismatch = "PRIORITY_MISMATCH"
  val InvalidState = "INVALID_STATE"

  val AllCodes: Seq[String] = Seq(NullRequiredField, InvalidDecisionType, InvalidInitialState,
    InvalidTimeOrder, EmptyReasonCodes, InvalidWindowOrder, PriorityMismatch, InvalidState)

  /** All reject codes for one row, in check order; empty = valid. */
  def rejectsFor(r: QueueRow): Seq[QueueReject] = {
    def bad(code: String, field: String, reason: String) =
      QueueReject(r.action_id, r.video_id, code, field, reason)

    // required-field nullness (contract §6.1 names 7; the producer
    // validator checks every field — here only reference-typed
    // nullables can be null, primitives are compile-time non-null)
    def nullStr(v: String) = v == null || v.isEmpty
    val requiredNulls = Seq(
      "action_id" -> nullStr(r.action_id),
      "video_id" -> nullStr(r.video_id),
      "decision_type" -> nullStr(r.decision_type),
      "state" -> nullStr(r.state),
      "decided_at" -> (r.decided_at == null),
      "window_start" -> (r.window_start == null),
      "window_end" -> (r.window_end == null),
      "expires_at" -> (r.expires_at == null),
      "rule_version" -> nullStr(r.rule_version),
      "reason_codes" -> (r.reason_codes == null),
      "created_at" -> (r.created_at == null),
      "updated_at" -> (r.updated_at == null),
      "state_updated_at" -> (r.state_updated_at == null)
    ).collect { case (f, true) => bad(NullRequiredField, f, s"required field `$f` is null/empty") }

    val checks = Seq(
      Option.when(!nullStr(r.decision_type) && !ValidDecisions.contains(r.decision_type))(
        bad(InvalidDecisionType, "decision_type",
          s"unsupported decision_type `${r.decision_type}` (NO_ACTION is never persisted)")),
      Option.when(!nullStr(r.state) && !StateDomain.contains(r.state))(
        bad(InvalidState, "state", s"state `${r.state}` outside ${StateDomain.mkString("/")}")),
      Option.when(!nullStr(r.state) && StateDomain.contains(r.state) &&
          r.state != Decisions.InitialState)(
        bad(InvalidInitialState, "state",
          s"producer write state must be `${Decisions.InitialState}`, got `${r.state}`")),
      Option.when(r.decided_at != null && r.expires_at != null &&
          !r.expires_at.after(r.decided_at))(
        bad(InvalidTimeOrder, "expires_at", "expires_at must be greater than decided_at")),
      Option.when(r.window_start != null && r.window_end != null &&
          !r.window_end.after(r.window_start))(
        bad(InvalidWindowOrder, "window_end", s"${r.window_end} !> ${r.window_start}")),
      Option.when(r.reason_codes != null && r.reason_codes.isEmpty)(
        bad(EmptyReasonCodes, "reason_codes", "reason_codes must not be empty")),
      Option.when(PriorityByDecision.get(r.decision_type).exists(_ != r.priority))(
        bad(PriorityMismatch, "priority",
          s"${r.decision_type} must be priority ${PriorityByDecision(r.decision_type)}, got ${r.priority}")))

    requiredNulls ++ checks.flatten
  }

  final case class SplitResult(valid: Dataset[QueueRow], rejects: Dataset[QueueReject])

  def split(rows: Dataset[QueueRow])(implicit spark: SparkSession): SplitResult = {
    import spark.implicits._
    SplitResult(
      valid = rows.filter((r: QueueRow) => rejectsFor(r).isEmpty),
      rejects = rows.flatMap((r: QueueRow) => rejectsFor(r)))
  }
}
