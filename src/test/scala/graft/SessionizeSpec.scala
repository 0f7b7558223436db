package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Stateful streaming sessionization (T10): gap splits, closure only
  * once the watermark passes a session's deadline (batch-boundary
  * independent), late-event backfill, out-of-order batches. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("sessions close only when the watermark passes last+gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 60)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(Event(1L, ts(1000), 1.0), Event(1L, ts(1030), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "open session must not emit")

      // the 1200 event advances the watermark to 1190, past session 1's
      // deadline (1090) — the engine's trailing no-data batch fires the
      // event-time timeout and closes exactly that session
      input.addData(Event(1L, ts(1200), 5.0))
      q.processAllAvailable()
      val first = spark.table("sess_out").as[Session].collect()
      assert(first.length == 1)
      assert(first.head.nEvents == 2L && first.head.durationSeconds == 30L
        && first.head.valueSum == 3.0)

      // watermark past 1260 → the second session closes too
      input.addData(Event(2L, ts(1400), 1.0))
      q.processAllAvailable()
      val u1 = spark.table("sess_out").as[Session].collect()
        .filter(_.userId == 1L).sortBy(_.sessionStart.getTime)
      assert(u1.length == 2, s"expected both user-1 sessions closed, got ${u1.toSeq}")
      assert(u1(1).nEvents == 1L && u1(1).valueSum == 5.0)
    } finally q.stop()
  }

  test("late-but-in-watermark event backfills its own session, not the newest one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "600 seconds"), gapSeconds = 60)
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      input.addData(Event(1L, ts(1000), 1.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(1200), 1.0)) // opens a second session
      q.processAllAvailable()
      // late event (watermark is only 600) belonging to the FIRST session
      input.addData(Event(1L, ts(1040), 1.0))
      q.processAllAvailable()
      // push watermark past both deadlines
      input.addData(Event(2L, ts(2000), 1.0))
      q.processAllAvailable()
      input.addData(Event(2L, ts(2001), 1.0))
      q.processAllAvailable()
      val u1 = spark.table("sess_late").as[Session].collect()
        .filter(_.userId == 1L).sortBy(_.sessionStart.getTime)
      assert(u1.map(s => (s.sessionStart.getTime / 1000, s.sessionEnd.getTime / 1000, s.nEvents)).toSeq
        == Seq((1000L, 1040L, 2L), (1200L, 1200L, 1L)),
        s"late event must extend [1000] to [1000,1040], got ${u1.toSeq}")
    } finally q.stop()
  }

  test("intra-batch unordered events still sessionize by event time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 60)
    val q = sessions.writeStream.format("memory").queryName("sess_out2")
      .outputMode("append").start()
    try {
      // delivered out of order within one batch: 1100, 1000, 1030, 1300
      input.addData(Event(7L, ts(1100), 1.0), Event(7L, ts(1000), 1.0),
        Event(7L, ts(1030), 1.0), Event(7L, ts(1300), 1.0))
      q.processAllAvailable()
      // next batch carries the advanced watermark (1290) → timeouts fire
      input.addData(Event(8L, ts(1300), 1.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out2").as[Session].collect()
        .filter(_.userId == 7L).sortBy(_.sessionStart.getTime)
      // event-time grouping: [1000,1030] (gap 30), [1100] (gap 70 splits),
      // then 1300 stays open
      assert(closed.map(s => (s.sessionStart.getTime / 1000, s.nEvents)).toSeq ==
        Seq((1000L, 2L), (1100L, 1L)))
    } finally q.stop()
  }

  test("native session_window MERGES an event landing exactly gap after the last (closed boundary)") {
    // sf0.1 carries a real exactly-1800s pair and session_window merged
    // it — the q_session_window oracle mirrors with `> gap`, and this
    // pins the engine semantics the oracle depends on
    import org.apache.spark.sql.functions._
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val ev = Seq(
      (1L, t0), (1L, plus(1800)),      // exactly gap apart -> ONE session
      (2L, t0), (2L, plus(1801))       // one past gap      -> TWO sessions
    ).toDF("user_id", "ts")
    val got = ev.groupBy(session_window(col("ts"), "1800 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(1L) == Seq(2L), s"exact-gap event must merge: ${got(1L)}")
    assert(got(2L) == Seq(1L, 1L), s"past-gap event must split: ${got(2L)}")
  }
}
