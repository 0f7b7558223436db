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
