package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Forecast

/** Holt linear smoothing: exact on linear series (the defining
  * property — l₁=x₁, b₁=x₂−x₁ makes every update a fixed point), and
  * the ≥2-points contract. */
class ForecastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactly linear series: level = last value, trend = slope, forecasts extrapolate") {
    // x_t = 10 + 3t for t = 1..6, any alpha/beta: the two-point init
    // puts (l, b) on the line and the update is a fixed point there
    val df = (1 to 6).map(t => ("k", t.toLong, 10.0 + 3.0 * t)).toDF("key", "t", "x")
    val r = Forecast.holtLinear(df, "key", "t", "x", alpha = 0.5, beta = 0.25, horizon = 3)
      .select("n", "level", "trend", "fc_1", "fc_2", "fc_3")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(r._1 == 6L)
    assert(r._2 == 28.0, s"level ${r._2}")          // x_6 = 10+18
    assert(r._3 == 3.0, s"trend ${r._3}")
    assert((r._4, r._5, r._6) == ((31.0, 34.0, 37.0)), s"forecasts $r")
  }

  test("damping toward level: constant series after a jump decays the trend") {
    // 0,0,0, then constant 10: after the step-response overshoot the
    // trend must shrink toward 0 and the level settle toward 10
    val xs = Seq(0.0, 0.0, 0.0) ++ Seq.fill(11)(10.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }.toDF("key", "t", "x")
    val r = Forecast.holtLinear(df, "key", "t", "x", alpha = 0.5, beta = 0.25)
      .select("level", "trend").as[(Double, Double)].head()
    assert(math.abs(r._1 - 10.0) < 1.0, s"level ${r._1} should approach 10")
    assert(math.abs(r._2) < 1.0, s"trend ${r._2} should decay toward 0")
  }

  test("keys with a single observation are dropped; order of arrival is irrelevant") {
    val df = Seq(("solo", 1L, 5.0), ("pair", 2L, 8.0), ("pair", 1L, 4.0))
      .toDF("key", "t", "x")
    val out = Forecast.holtLinear(df, "key", "t", "x", alpha = 0.5, beta = 0.25)
    val keys = out.select("key").as[String].collect().toSet
    assert(keys == Set("pair"), s"got $keys")
    // shuffled arrival: series is time-sorted inside, so b₁ = x(t=2) − x(t=1) = 4
    val tr = out.select("trend").as[Double].head()
    assert(tr == 4.0, s"trend $tr")
  }

  test("parameter domain is enforced") {
    val df = Seq(("k", 1L, 1.0)).toDF("key", "t", "x")
    intercept[IllegalArgumentException] {
      Forecast.holtLinear(df, "key", "t", "x", alpha = 0.0, beta = 0.5)
    }
    intercept[IllegalArgumentException] {
      Forecast.holtLinear(df, "key", "t", "x", alpha = 0.5, beta = 0.5, horizon = 0)
    }
  }

  test("olsTrend: exact fit on a noiseless line (slope 2, intercept 3, r2 = 1), " +
    "re-basing makes the fit t-offset invariant") {
    import spark.implicits._
    val rows = (0 to 9).flatMap(t => Seq(("k", t.toLong + 1000000L, 2.0 * t + 3.0)))
    val r = Forecast.olsTrend(rows.toDF("key", "t", "x"), "key", "t", "x")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].collect().head
    assert(r._2 == 10L)
    assert(math.abs(r._3.get - 2.0) < 1e-12, s"slope ${r._3}")
    // intercept is at the RE-BASED origin (t - min t), by design
    assert(math.abs(r._4.get - 3.0) < 1e-9, s"intercept ${r._4}")
    assert(r._5.get == 1.0, s"r2 ${r._5}")
  }

  test("olsTrend: flat series -> slope 0 with undefined r2 (NULL, not 0); " +
    "single-timestamp key -> NULL slope") {
    import spark.implicits._
    val flat = (0 to 4).map(t => ("f", t.toLong, 7.0))
    val oneT = Seq(("s", 5L, 1.0), ("s", 5L, 9.0))
    val r = Forecast.olsTrend((flat ++ oneT).toDF("key", "t", "x"), "key", "t", "x")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r("f")._3.get == 0.0 && r("f")._5.isEmpty, s"flat: ${r("f")}")
    assert(r("s")._3.isEmpty && r("s")._5.isEmpty, s"single-t: ${r("s")}")
  }
}
