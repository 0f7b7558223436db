package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QueueValidation
import graft.operators.QueueValidation._

class QueueValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private val good = QueueRow(
    action_id = "a1", video_id = "v1", decision_type = "BOOST", priority = 3,
    state = "PENDING", decided_at = ts("2024-01-01 00:01:00"),
    window_start = ts("2024-01-01 00:00:00"), window_end = ts("2024-01-01 00:01:00"),
    expires_at = ts("2024-01-01 00:16:00"), rule_version = "rules_v1",
    velocity_30m = 1.2, completion_rate_30m = 0.8, skip_rate_30m = 0.1,
    impressions_30m = 42L, reason_codes = Seq("HIGH_VELOCITY_P90", "GATE_PASS"),
    created_at = ts("2024-01-01 00:01:00"), updated_at = ts("2024-01-01 00:01:00"),
    state_updated_at = ts("2024-01-01 00:01:00"))

  test("valid row passes with no rejects") {
    assert(QueueValidation.rejectsFor(good).isEmpty)
  }

  private def codes(r: QueueRow) = QueueValidation.rejectsFor(r).map(_.code)
  private def fields(r: QueueRow) = QueueValidation.rejectsFor(r).map(_.field)

  test("NULL_REQUIRED_FIELD fires per null/empty field, carrying the field name") {
    assert(codes(good.copy(action_id = "")) == Seq(NullRequiredField))
    assert(fields(good.copy(action_id = "")) == Seq("action_id"))
    assert(fields(good.copy(video_id = null)) == Seq("video_id"))
    assert(fields(good.copy(rule_version = "")) == Seq("rule_version"))
    assert(fields(good.copy(reason_codes = null)) == Seq("reason_codes"))
    assert(fields(good.copy(created_at = null)) == Seq("created_at"))
    assert(fields(good.copy(updated_at = null)) == Seq("updated_at"))
    assert(fields(good.copy(state_updated_at = null)) == Seq("state_updated_at"))
    // decision_type null reports ONLY nullness, not also domain violation
    assert(codes(good.copy(decision_type = null)) == Seq(NullRequiredField))
    assert(codes(good.copy(state = null)) == Seq(NullRequiredField))
    // a null timestamp suppresses the dependent ordering checks
    assert(codes(good.copy(decided_at = null)) == Seq(NullRequiredField))
    assert(codes(good.copy(window_start = null)) == Seq(NullRequiredField))
    assert(codes(good.copy(window_end = null)) == Seq(NullRequiredField))
    assert(codes(good.copy(expires_at = null)) == Seq(NullRequiredField))
  }

  test("INVALID_DECISION_TYPE: outside BOOST/REVIEW/RESCUE") {
    assert(codes(good.copy(decision_type = "NO_ACTION")).contains(InvalidDecisionType))
    assert(codes(good.copy(decision_type = "PROMOTE")).contains(InvalidDecisionType))
  }

  test("INVALID_STATE vs INVALID_INITIAL_STATE are distinct violations") {
    // in the domain but not the producer initial state
    assert(codes(good.copy(state = "ACKED")) == Seq(InvalidInitialState))
    // outside the domain entirely
    assert(codes(good.copy(state = "LIMBO")) == Seq(InvalidState))
  }

  test("INVALID_TIME_ORDER: expires_at must follow decided_at") {
    assert(codes(good.copy(expires_at = good.decided_at)) == Seq(InvalidTimeOrder))
    assert(codes(good.copy(expires_at = ts("2024-01-01 00:00:30"))) == Seq(InvalidTimeOrder))
  }

  test("INVALID_WINDOW_ORDER: window_end must follow window_start") {
    assert(codes(good.copy(window_end = good.window_start, decided_at = good.window_start,
      expires_at = ts("2024-01-01 00:15:00"), created_at = good.window_start,
      updated_at = good.window_start, state_updated_at = good.window_start))
      == Seq(InvalidWindowOrder))
  }

  test("EMPTY_REASON_CODES: empty is a violation, null is a nullness violation") {
    assert(codes(good.copy(reason_codes = Seq.empty)) == Seq(EmptyReasonCodes))
    assert(codes(good.copy(reason_codes = null)) == Seq(NullRequiredField))
  }

  test("PRIORITY_MISMATCH: priority must match the decision map") {
    assert(codes(good.copy(priority = 1)) == Seq(PriorityMismatch))
    assert(codes(good.copy(decision_type = "RESCUE", priority = 3,
      reason_codes = Seq("UNDER_EXPOSED_P40"))) == Seq(PriorityMismatch))
  }

  test("multiple violations all reported") {
    assert(codes(good.copy(action_id = "", state = "LIMBO")).toSet ==
      Set(NullRequiredField, InvalidState))
  }

  test("serving actionQueueRows validate clean end-to-end (D5 -> D6)") {
    implicit val s = spark
    import s.implicits._
    val events = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val ctx = graft.serving.Serving.decisionContextFromEvents(events)
    val rows = graft.serving.Serving.actionQueueRows(ctx, "rules_v1")
      .as[QueueRow]
    val r = QueueValidation.split(rows)
    val nRejects = r.rejects.count()
    assert(rows.count() > 0)
    assert(nRejects == 0, s"queue rows from the serving pipeline must validate clean, got $nRejects rejects")
  }

  test("actionQueueRows are deterministic across runs (decided_at from window, not wall clock)") {
    val events = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    def run() = graft.serving.Serving
      .actionQueueRows(graft.serving.Serving.decisionContextFromEvents(events), "rules_v1")
      .select("action_id").collect().map(_.getString(0)).sorted.toSeq
    assert(run() == run(), "replayed batch must emit identical action ids")
  }

  test("split returns valid and reject datasets distributed") {
    implicit val s = spark
    import s.implicits._
    val rows = Seq(
      good,
      good.copy(video_id = "v2", decision_type = "NO_ACTION"),
      good.copy(video_id = "v3", reason_codes = Seq.empty)).toDS()
    val r = QueueValidation.split(rows)
    assert(r.valid.collect().map(_.video_id).toSeq == Seq("v1"))
    assert(r.rejects.collect().map(x => (x.video_id, x.code)).toSet ==
      Set(("v2", InvalidDecisionType), ("v3", EmptyReasonCodes)))
  }
}
