package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MetricOps

class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rollingActives: exact WAU equals brute-force range distinct; WAU >= DAU") {
    // users 1..5 active on hand-placed days across a 12-day span
    val rows = Seq(
      (1L, "2024-03-01"), (1L, "2024-03-02"), (1L, "2024-03-10"),
      (2L, "2024-03-01"), (2L, "2024-03-08"),
      (3L, "2024-03-03"), (3L, "2024-03-03"), // dup pair must not double count
      (4L, "2024-03-05"), (5L, "2024-03-12"))
    val df = rows.toDF("user_id", "d")
      .select(col("user_id"), to_timestamp(col("d")).as("ts"))
    val got = MetricOps.rollingActives(df, "user_id", "ts", windowDays = 7)
      .select("day", "dau", "wau").as[(java.sql.Date, Long, Long)].collect()
      .map { case (d, a, w) => d.toString -> ((a, w)) }.toMap
    // brute force in Scala
    val pairs = rows.map { case (u, d) => (u, java.time.LocalDate.parse(d)) }.distinct
    val days = pairs.map(_._2).distinct
    val expect = days.map { d =>
      val wau = pairs.filter(p => !p._2.isAfter(d) && !p._2.isBefore(d.minusDays(6)))
        .map(_._1).distinct.size.toLong
      val dau = pairs.filter(_._2 == d).map(_._1).distinct.size.toLong
      d.toString -> ((dau, wau))
    }.toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (d, (dau, wau)) =>
      assert(got(d) == ((dau, wau)), s"day $d: got ${got(d)} want ($dau, $wau)")
      assert(wau >= dau)
    }
  }

  test("rollingActives: HLL gate true on every day of a real-sized frame") {
    val df = (0 until 5000).map { i =>
      (i % 137L, f"2024-03-${i % 20 + 1}%02d")
    }.toDF("user_id", "d").select(col("user_id"), to_timestamp(col("d")).as("ts"))
    val bad = MetricOps.rollingActives(df, "user_id", "ts")
      .filter(!col("wau_est_ok")).count()
    assert(bad == 0, "HLL estimate must sit within 5% of exact on every day")
  }

  test("deltaDecomposition: per-segment effects reconcile to the overall delta") {
    val df = (0 until 2000).map { i =>
      val seg = s"s${i % 3}"
      val period = if (i % 5 < 2) "a" else "b"
      // rates and mix genuinely differ between periods
      val v = (i % 3) * 10.0 + (if (period == "b") 7.25 else 0.0) + (i % 11) * 0.5
      (seg, period, v)
    }.toDF("seg", "period", "v")
    val out = MetricOps.deltaDecomposition(df, "seg", "period", "v").collect()
    val effects = out.map(r =>
      r.getAs[Double]("mix_effect") + r.getAs[Double]("rate_effect") +
        r.getAs[Double]("interaction")).sum
    val Array(avgA, avgB) = Seq("a", "b").map(p =>
      df.filter(col("period") === p).agg(avg("v")).as[Double].head).toArray
    assert(math.abs(effects - (avgB - avgA)) < 1e-9,
      s"decomposition must telescope: $effects vs ${avgB - avgA}")
    // identity check: overall avg per period equals sum(share*rate)
    val rebuiltB = out.map(r => r.getAs[Double]("share_b") * r.getAs[Double]("rate_b")).sum
    assert(math.abs(rebuiltB - avgB) < 1e-9)
  }

  test("bitmapDistinct equals countDistinct across bucket boundaries") {
    // ids span > 3 of the 32768-wide bitmap buckets, with collisions
    val df = (0 until 20000).map(i => (s"k${i % 4}", (i * 7L) % 100000L + 1L))
      .toDF("k", "id")
    val got = MetricOps.bitmapDistinct(df, "k", "id")
      .as[(String, Long)].collect().toMap
    val want = df.groupBy("k").agg(countDistinct(col("id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("weightedQuantiles: unit weights reduce to the rank statistic; weights shift the median") {
    val df = Seq(
      ("g", 1.0, 1.0, 1L), ("g", 2.0, 1.0, 2L), ("g", 3.0, 1.0, 3L),
      ("g", 4.0, 1.0, 4L), ("g", 5.0, 1.0, 5L)).toDF("k", "v", "w", "tie")
    val m = MetricOps.weightedQuantiles(df, "k", "v", "w", Seq("tie"), Seq(0.5))
      .select("wq50").as[Double].head()
    assert(m == 3.0) // first row with cumw >= 2.5 is v=3
    // now pile weight on v=1: median must move down
    val dfw = df.withColumn("w", when(col("v") === 1.0, 10.0).otherwise(1.0))
    val mw = MetricOps.weightedQuantiles(dfw, "k", "v", "w", Seq("tie"), Seq(0.5))
      .select("wq50").as[Double].head()
    assert(mw == 1.0, s"weighted median must follow the mass, got $mw")
  }

  test("ebShrinkRates: posterior mean sits between raw rate and prior mean; big n moves less") {
    val per = Seq(
      ("sparse_hi", 4L, 4L),   // raw 1.0 on 4 trials -> pulled hard toward prior
      ("dense_hi", 400L, 280L), // raw 0.7 on 400 trials -> barely moves
      ("a", 50L, 10L), ("b", 60L, 20L), ("c", 70L, 30L), ("d", 80L, 25L),
      ("e", 90L, 35L), ("f", 100L, 30L)).toDF("k", "n", "k_succ")
    val out = MetricOps.ebShrinkRates(per, "k", "n", "k_succ", minTrials = 5)
      .select("k", "alpha", "beta", "rate_raw", "rate_eb")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, alpha, beta, _, _) = out("a")
    assert(alpha > 0 && beta > 0, s"MoM prior must be proper: a=$alpha b=$beta")
    val prior = alpha / (alpha + beta)
    out.values.foreach { case (k, _, _, raw, eb) =>
      val lo = math.min(raw, prior) - 1e-12
      val hi = math.max(raw, prior) + 1e-12
      assert(eb >= lo && eb <= hi, s"$k: eb=$eb outside [$lo, $hi]")
    }
    val pullSparse = math.abs(out("sparse_hi")._5 - out("sparse_hi")._4)
    val pullDense = math.abs(out("dense_hi")._5 - out("dense_hi")._4)
    assert(pullSparse > pullDense,
      s"sparse key must shrink more: $pullSparse vs $pullDense")
  }

  test("qiniDeciles: counts conserve and the cumulative tail hits the closed form") {
    val units = (0 until 500).map { i =>
      val treated = i % 2
      // treated units convert more when score is high -> positive uplift up top
      val conv = if (treated == 1 && i < 150) 1L else if (i % 7 == 0) 1L else 0L
      (i.toLong, 500.0 - i, treated.toLong, conv)
    }.toDF("uid", "score", "treated", "converted")
    val out = MetricOps.qiniDeciles(units, "score", "uid", "treated", "converted", k = 10)
      .collect()
    assert(out.map(_.getAs[Long]("n_t")).sum + out.map(_.getAs[Long]("n_c")).sum == 500)
    val (ct, cc, nt, nc) = (
      out.map(_.getAs[Long]("conv_t")).sum.toDouble,
      out.map(_.getAs[Long]("conv_c")).sum.toDouble,
      out.map(_.getAs[Long]("n_t")).sum.toDouble,
      out.map(_.getAs[Long]("n_c")).sum.toDouble)
    val lastQini = out.last.getAs[Double]("qini_cum")
    assert(math.abs(lastQini - (ct - cc * nt / nc)) < 1e-9)
    // the planted signal: top decile uplift strictly positive
    assert(out.head.getAs[Double]("uplift") > 0)
  }
}
