package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BinnedIntervalJoin

class BinnedIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedIntervalJoin
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq BinnedIntervalJoin)
  }

  private def proximityDf = {
    val l = Seq((1L, 100L), (2L, 160L), (3L, 161L), (4L, 5000L)).toDF("lid", "lt")
    val r = Seq((10L, 100L), (11L, 220L), (12L, 4990L)).toDF("rid", "rt")
    l.join(r, abs(col("lt") - col("rt")) <= 60)
  }

  test("pure proximity join: rule replaces the nested loop with a binned equi-join, same rows") {
    val baseline = proximityDf
    val basePlan = baseline.queryExecution.executedPlan.toString
    assert(basePlan.contains("BroadcastNestedLoopJoin"),
      s"precondition: Spark plans the raw predicate as a nested loop\n$basePlan")
    val baseRows = baseline.select("lid", "rid").as[(Long, Long)].collect().toSet

    withRule {
      val rewritten = proximityDf
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rule must eliminate the nested loop\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"), s"expected an equi-join\n$plan")
      val rows = rewritten.select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(rows == baseRows, "rewrite must be row-identical")
      // (3,10) excluded at distance 61; (3,11) included at distance 59
      assert(rows == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 12L)))
    }
  }

  test("joins with an equi conjunct are left alone (Spark already plans them hash-partitioned)") {
    withRule {
      val l = Seq((1L, 5L, 100L)).toDF("lid", "k", "lt")
      val r = Seq((9L, 5L, 120L)).toDF("rid", "k", "rt")
      val j = l.join(r, l("k") === r("k") && abs(col("lt") - col("rt")) <= 60)
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__lbin"), s"rule must not touch equi joins\n$optimized")
      assert(j.count() == 1)
    }
  }

  test("exact at epoch-nanos magnitude (beyond double's 2^53) and on negative timestamps") {
    // at ~1.7e18 a double bin would round by hundreds of units and
    // drop true pairs across a bin edge; the long floorDiv must not
    val base = 1700000000000000000L
    val l = Seq((1L, base), (2L, base + 99L), (3L, base + 101L), (4L, -1000L), (5L, -899L))
      .toDF("lid", "lt")
    val r = Seq((10L, base + 50L), (11L, -950L)).toDF("rid", "rt")
    def q = l.join(r, abs(col("lt") - col("rt")) <= 100)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val plain = q
    val binned = withRule(q)
    assert(binned == plain)
    assert(plain == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 11L), (5L, 11L)))
  }

  test("non-integral radius or operands are left to Spark's own plan (no unsafe rewrite)") {
    withRule {
      val l = Seq((1L, 1.5)).toDF("lid", "lt")
      val r = Seq((9L, 1.2)).toDF("rid", "rt")
      val j = l.join(r, abs(col("lt") - col("rt")) <= 0.5)
      assert(!j.queryExecution.optimizedPlan.toString.contains("__lbin"))
      assert(j.count() == 1)
    }
  }

  test("rule is fixed-point safe and equivalent on random collision-heavy data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rows = Gen.listOfN(120, Gen.chooseNum(0L, 300L))(Gen.Parameters.default, Seed(5L)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val l = rows.toDF("lid", "lt")
    val r = rows.map { case (i, t) => (i + 1000L, t) }.toDF("rid", "rt")
    def q = l.join(r, abs(col("lt") - col("rt")) <= 13)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val plain = q
    val binned = withRule(q)
    assert(binned == plain)
  }
}
