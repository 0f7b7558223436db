package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Stateful streaming sessionization (T10): gap-split inline, event-time
  * timeout closure, replay-deterministic (no wall clock). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("gap split + event-time timeout close sessions deterministically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Sessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 60)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one session: 2 events 30s apart
      input.addData(Event(1L, ts(1000), 1.0), Event(1L, ts(1030), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "open session must not emit")

      // event past the 60s gap closes session 1 inline
      input.addData(Event(1L, ts(1200), 5.0))
      q.processAllAvailable()
      val first = spark.table("sess_out").as[Session].collect()
      assert(first.length == 1)
      assert(first.head.nEvents == 2L && first.head.durationSeconds == 30L
        && first.head.valueSum == 3.0)

      // another key's event advances the watermark past 1200+60 → the
      // dangling session closes by timeout (needs a following batch for
      // the new watermark to take effect)
      input.addData(Event(2L, ts(1400), 1.0))
      q.processAllAvailable()
      input.addData(Event(2L, ts(1401), 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[Session].collect()
      val u1 = all.filter(_.userId == 1L).sortBy(_.sessionStart.getTime)
      assert(u1.length == 2, s"expected both user-1 sessions closed, got ${u1.toSeq}")
      assert(u1(1).nEvents == 1L && u1(1).valueSum == 5.0)
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
      val closed = spark.table("sess_out2").as[Session].collect()
        .sortBy(_.sessionStart.getTime)
      // event-time grouping: [1000,1030] (gap 30), [1100] (gap 70 splits),
      // then 1300 stays open
      assert(closed.map(s => (s.sessionStart.getTime / 1000, s.nEvents)).toSeq ==
        Seq((1000L, 2L), (1100L, 1L)))
    } finally q.stop()
  }
}
