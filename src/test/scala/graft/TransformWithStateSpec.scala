package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Accumulate
import graft.streaming.Accumulate.{Event, Running}

/** `transformWithState` (Spark 4 arbitrary stateful processing): named
  * state variables, event-time timers, idle flush + state clear. Runs
  * on the RocksDB provider (required by the operator and the 100 TB
  * setting). */
class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def withRocks[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("running totals accumulate per key; idle timer flushes and clears state") {
    withRocks {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val out = Accumulate.running(
        input.toDS().withWatermark("ts", "10 seconds"), quietSeconds = 60)
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        input.addData(Event(1L, ts(1000), 1.0), Event(1L, ts(1030), 2.0))
        q.processAllAvailable()
        val r1 = spark.table("tws_out").as[Running].collect().toSeq
        assert(r1 == Seq(Running(1L, 2L, 3.0, closed = false)), s"got $r1")

        // user-2 event advances the watermark to 1990, past user-1's
        // idle deadline (1030+60) — the timer fires: one closed row,
        // state cleared
        input.addData(Event(2L, ts(2000), 5.0))
        q.processAllAvailable()
        val r2 = spark.table("tws_out").as[Running].collect().toSeq
        assert(r2.contains(Running(1L, 2L, 3.0, closed = true)), s"no flush row in $r2")
        assert(r2.contains(Running(2L, 1L, 5.0, closed = false)))

        // user 1 returns AFTER the flush: counters restart from zero
        // (state really was cleared, not suppressed)
        input.addData(Event(1L, ts(2100), 7.0))
        q.processAllAvailable()
        val r3 = spark.table("tws_out").as[Running].collect()
          .filter(r => r.userId == 1L && !r.closed).toSeq
        assert(r3.contains(Running(1L, 1L, 7.0, closed = false)),
          s"state not cleared, got $r3")
      } finally q.stop()
    }
  }

  test("re-arming deletes the stale timer: one flush per idle gap, not one per batch") {
    withRocks {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val out = Accumulate.running(
        input.toDS().withWatermark("ts", "10 seconds"), quietSeconds = 60)
      val q = out.writeStream.format("memory").queryName("tws_rearm")
        .outputMode("update").start()
      try {
        // three batches keep extending the same key's activity
        input.addData(Event(1L, ts(1000), 1.0)); q.processAllAvailable()
        input.addData(Event(1L, ts(1020), 1.0)); q.processAllAvailable()
        input.addData(Event(1L, ts(1040), 1.0)); q.processAllAvailable()
        // idle out well past every per-batch deadline
        input.addData(Event(2L, ts(3000), 1.0)); q.processAllAvailable()
        input.addData(Event(2L, ts(3001), 1.0)); q.processAllAvailable()
        val flushes = spark.table("tws_rearm").as[Running].collect()
          .filter(r => r.userId == 1L && r.closed).toSeq
        assert(flushes == Seq(Running(1L, 3L, 3.0, closed = true)),
          s"expected exactly one flush with full totals, got $flushes")
      } finally q.stop()
    }
  }

  test("dropDuplicatesWithinWatermark: dedup by event_id with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = input.toDS()
      .withWatermark("ts", "30 seconds")
      .dropDuplicatesWithinWatermark("userId", "ts")
    val q = deduped.writeStream.format("memory").queryName("tws_dedup")
      .outputMode("append").start()
    try {
      input.addData(Event(1L, ts(1000), 1.0), Event(1L, ts(1000), 1.0))
      q.processAllAvailable()
      input.addData(Event(1L, ts(1000), 1.0)) // dup again, still within watermark
      q.processAllAvailable()
      input.addData(Event(2L, ts(2000), 1.0)) // advances watermark far past 1000
      q.processAllAvailable()
      val n = spark.table("tws_dedup").filter(col("userId") === 1L).count()
      assert(n == 1L, s"expected 1 surviving user-1 row, got $n")
    } finally q.stop()
  }
}
