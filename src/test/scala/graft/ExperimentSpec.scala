package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Experiment

class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diffInDiff: hand-computed cells — did 3, se sqrt(2)") {
    // treat pre (1,3), treat post (5,7), ctrl pre (1,1), ctrl post (2,2)
    val df = Seq(
      (true, false, 1.0), (true, false, 3.0),
      (true, true, 5.0), (true, true, 7.0),
      (false, false, 1.0), (false, false, 1.0),
      (false, true, 2.0), (false, true, 2.0)
    ).toDF("treat", "post", "value")
    val r = Experiment.diffInDiff(df, "treat", "post", "value")
      .as[(Long, Double, Double, Double, Double, Double, Double)].collect().head
    val (n, mTp, mT0, mCp, mC0, did, se) = r
    assert(n == 8L)
    assert((mTp, mT0, mCp, mC0) == ((6.0, 2.0, 2.0, 1.0)))
    assert(did == 3.0, s"did $did")
    // per-cell var/n: treat cells s²=2, n=2 -> 1 each; ctrl cells 0
    assert(math.abs(se - math.sqrt(2.0)) < 1e-12, s"se $se")
  }

  test("cuped: a perfect covariate (y = 2x) zeroes the residual variance and " +
    "equalizes the adjusted means across arms") {
    val units = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0),
      ("b", 3.0, 6.0), ("b", 4.0, 8.0)
    ).toDF("arm", "pre", "post")
    val r = Experiment.cuped(units, "arm", "pre", "post")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("a")._3 == 3.0 && r("b")._3 == 7.0, "raw means")
    assert(math.abs(r("a")._4 - 5.0) < 1e-9 && math.abs(r("b")._4 - 5.0) < 1e-9,
      s"adjusted means must meet at the grand trend: ${r.values.toSeq}")
    assert(r("a")._5 == 2.0, s"theta ${r("a")._5}")
    assert(r("a")._6 == 0.0, s"var_ratio ${r("a")._6}")
  }

  test("cuped: an uninformative (constant) covariate leaves the metric untouched") {
    val units = Seq(
      ("a", 5.0, 2.0), ("a", 5.0, 4.0),
      ("b", 5.0, 6.0), ("b", 5.0, 8.0)
    ).toDF("arm", "pre", "post")
    val r = Experiment.cuped(units, "arm", "pre", "post")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("a")._4 == r("a")._3 && r("b")._4 == r("b")._3,
      "zero-variance covariate: adjusted = raw")
    assert(r("a")._5 == 0.0 && r("a")._6 == 1.0)
  }
}
