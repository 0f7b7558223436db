package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical samples give KS = 0; disjoint samples give KS = 1") {
    val same = (1 to 50).flatMap(i => Seq(("a", i.toDouble), ("b", i.toDouble)))
      .toDF("g", "value")
    val ks0 = Drift.ksTwoSample(same, "value", "g", "a", "b").head
    assert(ks0.getAs[Double]("ks_stat") == 0.0)
    val disjoint = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (100 to 150).map(i => ("b", i.toDouble))).toDF("g", "value")
    val ks1 = Drift.ksTwoSample(disjoint, "value", "g", "a", "b").head
    assert(ks1.getAs[Double]("ks_stat") == 1.0)
    assert(ks1.getAs[Double]("ks_at") == 50.0, "max gap first attained at a's top value")
  }

  test("hand-computed KS on a small shifted sample") {
    // a: 1,2,3,4  b: 3,4,5,6 -> max gap at v=2: |2/4 - 0/4| = 0.5
    val df = (Seq(1, 2, 3, 4).map(i => ("a", i.toDouble)) ++
      Seq(3, 4, 5, 6).map(i => ("b", i.toDouble))).toDF("g", "value")
    val r = Drift.ksTwoSample(df, "value", "g", "a", "b").head
    assert(r.getAs[Double]("ks_stat") == 0.5)
    assert(r.getAs[Double]("ks_at") == 2.0)
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
  }

  test("chiSquareIndependence: independent 2x2 gives chi2 = 0; hand-computed dependent table") {
    // perfectly proportional table -> expected == observed -> chi2 0
    val indep = (Seq.fill(20)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    val r0 = graft.operators.Drift.chiSquareIndependence(indep, "a", "b").head
    assert(r0.getAs[Double]("chi2") == 0.0)
    assert(r0.getAs[Long]("dof") == 1)
    // diagonal 2x2: o=[[10,0],[0,10]], e=5 everywhere -> chi2 = 4*25/5 = 20
    val dep = (Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    val r1 = graft.operators.Drift.chiSquareIndependence(dep, "a", "b").head
    assert(r1.getAs[Double]("chi2") == 20.0, s"got ${r1.getAs[Double]("chi2")}")
    assert(r1.getAs[Long]("n") == 20)
  }

  test("bucket width does not change the statistic (two-level prefix sum is exact)") {
    val df = (1 to 300).map(i => (if (i % 3 == 0) "a" else "b", (i % 41) + i / 100.0))
      .toDF("g", "value")
    val w1 = Drift.ksTwoSample(df, "value", "g", "a", "b", bucketCents = 1L).head
    val w2 = Drift.ksTwoSample(df, "value", "g", "a", "b", bucketCents = 100000L).head
    assert(w1.getAs[Double]("ks_stat") == w2.getAs[Double]("ks_stat"))
    assert(w1.getAs[Double]("ks_at") == w2.getAs[Double]("ks_at"))
  }

  test("wasserstein1: identical = 0; a pure shift moves mass by exactly the shift") {
    val same = (1 to 40).flatMap(i => Seq(("a", i.toDouble), ("b", i.toDouble)))
      .toDF("g", "value")
    assert(Drift.wasserstein1(same, "value", "g", "a", "b")
      .head.getAs[Double]("w1") == 0.0)
    // b = a + 2.5 pointwise: W1 of a pure translation is the shift
    val shifted = ((1 to 40).map(i => ("a", i.toDouble)) ++
      (1 to 40).map(i => ("b", i + 2.5))).toDF("g", "value")
    val w = Drift.wasserstein1(shifted, "value", "g", "a", "b")
      .head.getAs[Double]("w1")
    assert(math.abs(w - 2.5) < 1e-6, s"translation by 2.5 must transport 2.5, got $w")
    // symmetric in its arguments
    val rev = Drift.wasserstein1(shifted, "value", "g", "b", "a")
      .head.getAs[Double]("w1")
    assert(math.abs(w - rev) < 1e-9)
  }

  test("cusum: matches the textbook recursion; sustained shift alarms, flat series stays 0") {
    import graft.operators.Anomaly
    // 20 in-control minutes at rate 1, then 15 at rate 3 (the shift)
    val xs = (Seq.fill(20)(1.0) ++ Seq.fill(15)(3.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val got = Anomaly.cusum(xs.toDF("t", "x"), "t", "x",
        target = 1.0, slack = 0.5, h = 5.0)
      .orderBy("t").select("t", "cusum_pos", "alarm")
      .as[(Long, Double, Boolean)].collect()
    // driver-side reference recursion
    var c = 0.0
    val ref = xs.map { case (t, v) => c = math.max(0.0, c + (v - 1.0 - 0.5)); (t, c) }.toMap
    got.foreach { case (t, cp, al) =>
      assert(cp == ref(t), s"t=$t: closed form $cp != recursion ${ref(t)}")
      assert(al == (cp > 5.0))
    }
    assert(!got(19)._3 && got.last._3, "alarm fires only after the sustained shift")
    val flat = Anomaly.cusum(xs.take(20).toDF("t", "x"), "t", "x", 1.0, 0.5, 5.0)
      .select("cusum_pos", "cusum_neg").as[(Double, Double)].collect()
    assert(flat.forall(_._1 == 0.0), "in-control series accumulates nothing positive")
  }

  test("seasonalDecompose: components reconstruct the series; planted cycle lands in seasonal") {
    import graft.operators.Resample
    // period-4 sawtooth (0,3,0,3,...) on a flat base: seasonal should
    // absorb the cycle, residual stays near zero
    val xs = (0 until 64).map(i => (i.toLong, (if (i % 2 == 0) 0 else 3).toDouble))
      .toDF("t", "x")
    val r = Resample.seasonalDecompose(xs, "t", "x", period = 2, halfWindow = 2)
      .select("t", "x", "trend", "seasonal", "residual")
      .as[(Long, Double, Double, Double, Double)].collect()
    r.foreach { case (t, x, tr, se, res) =>
      assert(math.abs(x - (tr + se + res)) < 1e-9, s"t=$t decomposition must reconstruct x")
    }
    // interior rows (full centered window): trend flat at 1.2 or 1.8
    // depending on parity window composition; residual small
    val interior = r.filter(x => x._1 >= 2 && x._1 < 62)
    assert(interior.map(x => math.abs(x._5)).max < 0.7,
      "cycle must be absorbed by the seasonal component, not the residual")
    val slots = interior.groupBy(_._1 % 2).view.mapValues(_.map(_._4).distinct).toMap
    assert(slots(0).forall(_ < 0) && slots(1).forall(_ > 0),
      "even slots below trend, odd above")
  }

  test("hbos: rarity ordering and hand-computed score on a planted grid") {
    import graft.operators.Anomaly
    // 90 common events (value 10, hour 1, type a) + 10 rare (900, 23, b)
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 23:00:00")
    val rows = Seq.fill(90)((ts0, 10.0, "a")) ++ Seq.fill(10)((ts1, 900.0, "b"))
    val r = Anomaly.hbos(rows.toDF("ts", "v", "k"), "ts", "v", "k", bandWidth = 50.0)
      .select("etype", "n_events", "score").as[(String, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("a")._2 == 90 && r("b")._2 == 10)
    assert(r("b")._3 > r("a")._3, "rare combination must outscore the common one")
    // all three features share the same 90/10 marginals here:
    // score(common) = 3·(−ln 0.9), score(rare) = 3·(−ln 0.1)
    assert(math.abs(r("a")._3 - 3 * -math.log(0.9)) < 1e-12)
    assert(math.abs(r("b")._3 - 3 * -math.log(0.1)) < 1e-12)
  }

  test("splitConformal: noise-free line recovered exactly, full coverage, zero width") {
    import graft.operators.Eval
    val d = (1 to 400).map(i => (i.toLong, i.toLong % 97, 3 * (i % 97) + 7)).toDF("id", "x", "y")
    val r = Eval.splitConformal(d, "id", "x", "y", quantile = 0.9)
      .select("n_fit", "n_calib", "n_test", "slope", "intercept", "q_hat", "coverage")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 + r._2 + r._3 == 400, "hash slices partition the data")
    assert(math.abs(r._4 - 3.0) < 1e-9 && math.abs(r._5 - 7.0) < 1e-9,
      s"exact OLS must recover y = 3x + 7, got slope=${r._4} intercept=${r._5}")
    assert(r._6 < 1e-9, "noise-free: calibration quantile is zero width")
    assert(r._7 == 1.0, "noise-free: full held-out coverage")
  }

  test("splitConformal: noisy relation still covers at ~the nominal rate") {
    import graft.operators.Eval
    // deterministic pseudo-noise in [-20, 20]
    val d = (1 to 600).map { i =>
      val noise = (i * 2654435761L % 41).toInt - 20
      (i.toLong, (i % 97).toLong, 3 * (i % 97) + 7 + noise)
    }.toDF("id", "x", "y")
    val r = Eval.splitConformal(d, "id", "x", "y", quantile = 0.9)
      .select("q_hat", "coverage").as[(Double, Double)].head()
    assert(r._1 > 0, "noise produces a positive interval width")
    assert(r._2 >= 0.8 && r._2 <= 1.0, s"coverage ${r._2} should sit near the 0.9 target")
  }

  test("acf: period-4 cycle peaks at its own lag, alternates at half-period") {
    import graft.operators.Resample
    val xs = (0 until 200).map(i => (i.toLong, (i % 4 match {
      case 0 => 10L; case 1 => 2L; case 2 => 10L; case 3 => 2L
    }))).toDF("t", "x")
    // x alternates 10,2,10,2 → perfect period 2: r2 ≈ 1, r1 ≈ -1
    val r = Resample.acf(xs, "t", "x", maxLag = 4)
      .select("lag", "acf").as[(Int, Double)].collect().toMap
    assert(r(2) > 0.95 && r(4) > 0.95, s"even lags must correlate strongly: $r")
    assert(r(1) < -0.95 && r(3) < -0.95, s"odd lags must anti-correlate: $r")
  }

  test("psi: identical slices score 0; a hard shift scores large; bins partition the mass") {
    val same = (1 to 200).flatMap(i => Seq(("a", (i % 20).toDouble), ("b", (i % 20).toDouble)))
      .toDF("g", "value")
    val p0 = Drift.psi(same, "value", "g", "a", "b")
    assert(p0.select("psi").as[Double].head() == 0.0, "pa == pb per bin -> exactly 0")
    val shifted = ((1 to 200).map(i => ("a", (i % 20).toDouble)) ++
      (1 to 200).map(i => ("b", (i % 20) + 100.0))).toDF("g", "value")
    val rows = Drift.psi(shifted, "value", "g", "a", "b")
      .select("bin", "ca_bin", "cb_bin", "psi").as[(Int, Long, Long, Double)].collect()
    assert(rows.head._4 > 0.25, s"disjoint distributions must flag: ${rows.head._4}")
    assert(rows.map(_._2).sum == 200 && rows.map(_._3).sum == 200,
      "bins must partition both samples' mass")
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 10))
  }
}
