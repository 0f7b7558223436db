package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof semantics: latest right at-or-before; equal timestamp matches; none-before is null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:05:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // equal to a right ts → matches it
      (3L, 10L, ts("2023-12-31 23:59:00")), // before every right row → null
      (4L, 20L, ts("2024-01-01 00:10:00")), // key with no right rows → null
      (5L, 30L, ts("2024-01-01 00:10:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), 10.0),
      (10L, ts("2024-01-01 00:04:00"), 20.0),
      (30L, ts("2024-01-01 00:10:00"), 30.0)
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("rt", "v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(20.0), 2L -> Some(10.0), 3L -> None, 4L -> None, 5L -> Some(30.0)))
  }

  test("null keys/timestamps never match — same as the inequality formulation") {
    val left = Seq(
      (1L, Some(10L), Some(ts("2024-01-01 00:05:00"))),
      (2L, Option.empty[Long], Some(ts("2024-01-01 00:05:00"))), // null key
      (3L, Some(10L), Option.empty[java.sql.Timestamp])          // null ts
    ).toDF("id", "k", "t")
    val right = Seq(
      (Some(10L), Some(ts("2024-01-01 00:00:00")), 1.0),
      (Option.empty[Long], Some(ts("2024-01-01 00:00:00")), 666.0), // null key: matches nothing
      (Some(10L), Option.empty[java.sql.Timestamp], 777.0)          // null ts: matches nothing
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
    val twin = AsofJoin.asofJoinViaWindow(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(twin == got, "null semantics must agree between formulations")
  }

  test("union-window implementation ≡ inequality-join twin on real events") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_trunc("second", col("ts")).as("ts_sec"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_sec").as("purchase_ts"))
      .agg(max_by(col("value"), col("event_id")).as("purchase_value"))
    val left = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "purchase_ts", "purchase_value")
      .as[(String, Option[Timestamp], Option[Double])].collect().sortBy(_._1).toSeq
    val fast = norm(AsofJoin.asofJoin(left, purchases, "user_id", "ts_sec", "purchase_ts",
      Seq("purchase_ts", "purchase_value")))
    val slow = norm(AsofJoin.asofJoinViaWindow(left, purchases, "user_id", "ts_sec", "purchase_ts",
      Seq("purchase_ts", "purchase_value")))
    assert(fast.nonEmpty && fast == slow)
  }

  test("one shuffle + one window, no join node in the union-tag plan") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:05:00"))).toDF("id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "rt", "v")
    val plan = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"union-tag asof must not contain a join:\n$plan")
  }
}
