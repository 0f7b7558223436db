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
}
