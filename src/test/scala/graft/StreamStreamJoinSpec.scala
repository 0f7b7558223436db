package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (beyond the reference, which only joins
  * stream→static dim): clicks joined to impressions of the same user
  * within a bounded event-time window. Both sides are watermarked and
  * the join condition bounds click time to [imp, imp + 10 min], so the
  * state store can evict rows as watermarks advance — the only shape a
  * stream-stream join can run with finite state. */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked interval join matches clicks to in-window impressions only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(String, java.sql.Timestamp)]
    val clicks = MemoryStream[(String, java.sql.Timestamp)]

    val impDf = imps.toDF().toDF("user", "imp_ts").withWatermark("imp_ts", "30 minutes")
    val clickDf = clicks.toDF().toDF("c_user", "click_ts").withWatermark("click_ts", "30 minutes")
    val joined = impDf.join(clickDf,
      col("user") === col("c_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    imps.addData(("u1", ts("2024-01-01 00:00:00")), ("u2", ts("2024-01-01 00:00:00")))
    clicks.addData(
      ("u1", ts("2024-01-01 00:05:00")),  // in window → joins
      ("u1", ts("2024-01-01 00:20:00")),  // beyond +10m → no join
      ("u3", ts("2024-01-01 00:05:00")))  // no impression → no join
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_join")
      .select("user", "click_ts").as[(String, java.sql.Timestamp)].collect().toSet
    assert(got == Set(("u1", ts("2024-01-01 00:05:00"))))
  }

  test("LEFT OUTER interval join emits unmatched impressions once the watermark passes") {
    // the attribution shape: every impression must surface, clicked or
    // not — but the null row can only be emitted when the watermark
    // proves no in-window click can still arrive, so state stays finite
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(String, java.sql.Timestamp)]
    val clicks = MemoryStream[(String, java.sql.Timestamp)]

    val impDf = imps.toDF().toDF("user", "imp_ts").withWatermark("imp_ts", "5 minutes")
    val clickDf = clicks.toDF().toDF("c_user", "click_ts").withWatermark("click_ts", "5 minutes")
    val joined = impDf.join(clickDf,
      col("user") === col("c_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")

    val q = joined.writeStream.format("memory").queryName("ss_left_join")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    imps.addData(("u1", ts("2024-01-01 00:00:00")), ("u2", ts("2024-01-01 00:00:00")))
    clicks.addData(("u1", ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // matched row emits immediately; u2's null row must NOT exist yet —
    // a click inside [00:00, 00:10] could still arrive
    val early = spark.table("ss_left_join")
      .select("user", "c_user").as[(String, Option[String])].collect().toSet
    assert(early == Set(("u1", Some("u1"))), s"premature outer emission: $early")

    // advance both watermarks far past u2's join window end (00:10 +
    // 5m delay); the unmatched impression must now emit with nulls
    imps.addData(("u9", ts("2024-01-01 01:00:00")))
    clicks.addData(("u9", ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    q.stop()
    val late = spark.table("ss_left_join")
      .select("user", "c_user").as[(String, Option[String])].collect().toSet
    assert(late.contains(("u2", None)), s"unmatched impression never emitted: $late")
    assert(!late.contains(("u1", None)), "matched impression must not also emit a null row")
  }

  test("stream-static enrichment: broadcast dim join, misses pass through with nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(String, Long)]
    val dim = Seq(("u1", "premium"), ("u2", "free")).toDF("user", "segment")
    val enriched = graft.streaming.EventPipeline.enrich(
      events.toDF().toDF("user", "amount"), dim, "user")

    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    events.addData(("u1", 10L), ("u3", 7L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out")
      .select("user", "amount", "segment").as[(String, Long, Option[String])]
      .collect().toSet
    assert(got == Set(("u1", 10L, Some("premium")), ("u3", 7L, None)),
      s"got $got")
    // the stream side must not shuffle: the broadcast hint must survive
    // analysis so every micro-batch plans the dim as a broadcast join
    val analyzed = enriched.queryExecution.analyzed.toString
    assert(analyzed.contains("strategy=broadcast"), s"broadcast hint lost:\n$analyzed")
  }
}
