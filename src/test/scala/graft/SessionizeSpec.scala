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
}
