package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** Approx sketches (the 100 TB swap-ins): assert HLL++ distinct counts
  * and KLL-style quantiles land within tolerance of the exact values. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 2% of exact") {
    val e = Tables(spark, dir, "events")
    val rows = e.groupBy("event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("a"), countDistinct($"user_id").as("x"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (t, a, x) =>
      assert(math.abs(a - x).toDouble / x <= 0.02, s"$t: approx $a vs exact $x")
    }
  }

  test("percentile_approx within 1% of exact p90") {
    val e = Tables(spark, dir, "events")
    val rows = e.groupBy("event_type")
      .agg(expr("percentile_approx(value, 0.9, 10000)").as("a"),
        expr("percentile(value, 0.9)").as("x"))
      .as[(String, Double, Double)].collect()
    rows.foreach { case (t, a, x) =>
      assert(math.abs(a - x) / x <= 0.01, s"$t: approx $a vs exact $x")
    }
  }
}
