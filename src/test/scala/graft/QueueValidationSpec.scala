package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QueueValidation
import graft.operators.QueueValidation.QueueRow

class QueueValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private val good = QueueRow("a1", "v1", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00"),
    "BOOST", 3, 15, "rules_v1", Seq("VELOCITY_P90"), ts("2024-01-01 00:01:05"), ts("2024-01-01 00:16:05"))

  test("valid row passes with no rejects") {
    assert(QueueValidation.rejectsFor(good).isEmpty)
  }

  test("each violation produces its reject code") {
    def codes(r: QueueRow) = QueueValidation.rejectsFor(r).map(_.reject_code)
    assert(codes(good.copy(action_id = "")) == Seq("MISSING_ACTION_ID"))
    assert(codes(good.copy(window_end = good.window_start)) == Seq("INVALID_WINDOW_ORDER"))
    assert(codes(good.copy(decision_type = "NO_ACTION")).contains("INVALID_DECISION_TYPE"))
    assert(codes(good.copy(priority = 1)) == Seq("PRIORITY_MISMATCH"))
    assert(codes(good.copy(ttl_minutes = 0)) == Seq("INVALID_TTL"))
    assert(codes(good.copy(reason_codes = Seq.empty)) == Seq("EMPTY_REASON_CODES"))
    assert(codes(good.copy(expires_at = good.decided_at)) == Seq("INVALID_EXPIRY_ORDER"))
    // multiple violations all reported
    assert(codes(good.copy(action_id = "", ttl_minutes = -1)).toSet ==
      Set("MISSING_ACTION_ID", "INVALID_TTL"))
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

  test("split returns valid and reject datasets distributed") {
    implicit val s = spark
    import s.implicits._
    val rows = Seq(
      good,
      good.copy(video_id = "v2", decision_type = "NO_ACTION"),
      good.copy(video_id = "v3", reason_codes = Seq.empty)).toDS()
    val r = QueueValidation.split(rows)
    assert(r.valid.collect().map(_.video_id).toSeq == Seq("v1"))
    assert(r.rejects.collect().map(x => (x.video_id, x.reject_code)).toSet ==
      Set(("v2", "INVALID_DECISION_TYPE"), ("v3", "EMPTY_REASON_CODES")))
  }
}
