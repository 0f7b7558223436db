package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HypothesisTests

/** HypothesisTests invariants: Welch t against a hand-computed case
  * and its symmetry/zero properties; Mann–Whitney against the exact
  * small-sample U and the U_a + U_b = n_a·n_b identity under ties. */
class HypothesisTestsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, Double)]) = rows.toDF("g", "v")

  test("welch: identical groups give t = 0, not significant") {
    val d = df(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 1.0, "b" -> 2.0, "b" -> 3.0))
    val r = HypothesisTests.welchPairs(d, "g", "v")
      .select("t_stat", "significant_05").as[(Double, Boolean)].head()
    assert(r._1 == 0.0 && !r._2, s"identical-group welch $r")
  }

  test("welch: hand-computed two-sample case") {
    // a = (1,2,3): mean 2, var 1; b = (2,4,6): mean 4, var 4
    // t = (2-4)/sqrt(1/3 + 4/3) = -2/sqrt(5/3) = -1.5491933...
    // df = (5/3)^2 / ((1/3)^2/2 + (4/3)^2/2) = (25/9)/(17/18) = 50/17
    val d = df(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 2.0, "b" -> 4.0, "b" -> 6.0))
    val r = HypothesisTests.welchPairs(d, "g", "v")
      .select("t_stat", "df_welch", "mean_diff").as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - (-2.0 / math.sqrt(5.0 / 3.0))) < 1e-9, s"t ${r._1}")
    assert(math.abs(r._2 - 50.0 / 17.0) < 1e-9, s"df ${r._2}")
    assert(math.abs(r._3 - (-2.0)) < 1e-12, s"mean_diff ${r._3}")
  }

  test("welch: all group pairs appear exactly once, lexicographically") {
    val d = df(Seq("a" -> 1.0, "a" -> 2.0, "b" -> 1.0, "b" -> 3.0,
      "c" -> 2.0, "c" -> 5.0))
    val pairs = HypothesisTests.welchPairs(d, "g", "v")
      .select("grp_a", "grp_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")), s"pairs $pairs")
  }

  test("mann-whitney: exact U on a small untied sample") {
    // a = (1,2,5), b = (3,4): pairs where a > b: (5>3),(5>4) → U_a = 2
    val d = df(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 5.0, "b" -> 3.0, "b" -> 4.0))
    val r = HypothesisTests.mannWhitney(d, "g", "v", "a", "b")
      .select("n_a", "n_b", "u_stat").as[(Long, Long, Double)].head()
    assert(r == ((3L, 2L, 2.0)), s"mw $r")
  }

  test("mann-whitney: ties count half, U_a + U_b = n_a*n_b") {
    // a = (1,2,2), b = (2,3): a-vs-b wins: 0; ties: (2,2),(2,2) → U_a = 1
    val d = df(Seq("a" -> 1.0, "a" -> 2.0, "a" -> 2.0, "b" -> 2.0, "b" -> 3.0))
    val ua = HypothesisTests.mannWhitney(d, "g", "v", "a", "b")
      .select("u_stat").as[Double].head()
    val ub = HypothesisTests.mannWhitney(d, "g", "v", "b", "a")
      .select("u_stat").as[Double].head()
    assert(ua == 1.0, s"U_a $ua")
    assert(ua + ub == 3.0 * 2.0, s"U_a + U_b = ${ua + ub}")
  }

  test("mann-whitney: identical distributions give z = 0") {
    val d = df(Seq("a" -> 1.0, "a" -> 2.0, "b" -> 1.0, "b" -> 2.0))
    val r = HypothesisTests.mannWhitney(d, "g", "v", "a", "b")
      .select("z", "significant_05").as[(Double, Boolean)].head()
    assert(r._1 == 0.0 && !r._2, s"identical mw $r")
  }

  test("bucketed ranks are bucket-size invariant") {
    val d = df((1 to 200).map(i => (if (i % 3 == 0) "a" else "b", (i % 17).toDouble)))
    val r1 = HypothesisTests.mannWhitney(d, "g", "v", "a", "b", bucketCents = 2048L)
      .select("u_stat", "z").as[(Double, Double)].head()
    val r2 = HypothesisTests.mannWhitney(d, "g", "v", "a", "b", bucketCents = 3L)
      .select("u_stat", "z").as[(Double, Double)].head()
    assert(r1 == r2, s"bucket variance $r1 vs $r2")
  }
}
