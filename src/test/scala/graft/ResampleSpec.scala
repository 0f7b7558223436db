package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("forwardFill: dense spine per key, gaps carry the last value, is_gap marks them") {
    val ev = Seq(
      ("u1", ts("2024-01-01 00:10:00"), 1.0),
      ("u1", ts("2024-01-01 03:20:00"), 5.0), // hours 1,2 are gaps
      ("u2", ts("2024-01-01 10:00:00"), 7.0)  // single-hour key
    ).toDF("k", "t", "v")
    val got = Resample.forwardFill(ev, "k", "t", sum(col("v")), unit = "hour")
      .select("k", "bucket", "is_gap", "v_filled")
      .as[(String, Timestamp, Boolean, Double)].collect()
      .sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(got.map(r => (r._1, r._2)) == Seq(
      ("u1", ts("2024-01-01 00:00:00")), ("u1", ts("2024-01-01 01:00:00")),
      ("u1", ts("2024-01-01 02:00:00")), ("u1", ts("2024-01-01 03:00:00")),
      ("u2", ts("2024-01-01 10:00:00"))), "spine must cover each key's own span only")
    assert(got.map(_._3) == Seq(false, true, true, false, false))
    assert(got.map(_._4) == Seq(1.0, 1.0, 1.0, 5.0, 7.0), "gaps carry the last observed value")
  }

  test("forwardFill: same-bucket events aggregate before filling; no cross-key leakage") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:05:00"), 2.0),
      ("a", ts("2024-01-01 00:55:00"), 3.0), // same hour -> sums to 5
      ("b", ts("2024-01-01 01:30:00"), 9.0)
    ).toDF("k", "t", "v")
    val got = Resample.forwardFill(ev, "k", "t", sum(col("v")), unit = "hour")
      .select("k", "v_filled").as[(String, Double)].collect().toSet
    assert(got == Set(("a", 5.0), ("b", 9.0)), s"unexpected fill: $got")
  }

  test("robustTrend: strictly increasing series — S = C(n,2), positive z, exact Theil-Sen slope") {
    // x = 3t: every pairwise sign +1, every pairwise slope exactly 3
    val df = (1 to 10).map(t => ("k", t.toLong, 3L * t)).toDF("key", "t", "x")
    val r = Resample.robustTrend(df, "key", "t", "x")
      .select("n", "s_stat", "z", "theil_sen_slope")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 10L && r._2 == 45L, s"S must be C(10,2) = 45: $r")
    assert(r._3 > 2.5, s"monotone trend must be significant: z = ${r._3}")
    assert(r._4 == 3.0, s"Theil-Sen slope ${r._4}")
  }

  test("robustTrend: constant series — S = 0, z = 0, slope 0; tie correction keeps var finite") {
    val df = (1 to 8).map(t => ("k", t.toLong, 7L)).toDF("key", "t", "x")
    val r = Resample.robustTrend(df, "key", "t", "x")
      .select("s_stat", "var_s", "z", "theil_sen_slope")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 0L && r._3 == 0.0 && r._4 == 0.0, s"$r")
    // all values tied: tie_sum = n(n-1)(2n+5) -> var_s = 0 exactly
    assert(r._2 == 0.0, s"fully-tied series must zero the variance: ${r._2}")
  }

  test("ccf: a planted y = x-shifted-by-2 series peaks at lag +2, symmetric range emitted") {
    // x is a noisy-ish integer pattern; y copies x two steps later
    val xs = Seq(5L, 9L, 2L, 8L, 1L, 7L, 3L, 9L, 0L, 6L, 4L, 8L, 2L, 7L, 1L)
    val ys = Seq(0L, 0L) ++ xs.dropRight(2)
    val df = xs.indices.map(i => (i.toLong, xs(i), ys(i))).toDF("t", "x", "y")
    val r = Resample.ccf(df, "t", "x", "y", maxLag = 3)
      .as[(Int, Double)].collect().toMap
    assert(r.keySet == (-3 to 3).toSet, s"lags ${r.keySet}")
    val best = r.maxBy(_._2)
    assert(best._1 == 2, s"planted shift must peak at +2, got $r")
    assert(best._2 > 0.8, s"peak correlation weak: $best")
  }
}
