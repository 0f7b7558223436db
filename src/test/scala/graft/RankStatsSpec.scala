package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RankStats

/** RankStats invariants: Spearman on monotone/tied data, Gini at the
  * extremes, Theil's between/within decomposition identity. */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spearman: any monotone transform gives rho = 1, anti-monotone -1") {
    // y = x^2-ish growth — non-linear but strictly monotone
    val up = Seq((1.0, 2.0), (2.0, 8.0), (3.0, 9.0), (4.0, 20.0), (5.0, 100.0))
      .toDF("x", "y")
    val r1 = RankStats.spearman(up, "x", "y").select("rho").as[Double].head()
    assert(math.abs(r1 - 1.0) < 1e-12, s"monotone rho $r1")
    val down = up.selectExpr("x", "-y AS y")
    val r2 = RankStats.spearman(down, "x", "y").select("rho").as[Double].head()
    assert(math.abs(r2 + 1.0) < 1e-12, s"anti-monotone rho $r2")
  }

  test("spearman: tied values get average ranks (hand-computed case)") {
    // x = (1,1,2), y = (10,20,30): rank_x = (1.5, 1.5, 3), rank_y = (1,2,3)
    // corr((1.5,1.5,3),(1,2,3)) = cov/σxσy = (0.5·1)/ (√0.75·√2)·... hand:
    // mean rx = 2, ry = 2; cov = (−.5·−1 + −.5·0 + 1·1)/2 = 0.75
    // var rx = (.25+.25+1)/2 = 0.75, var ry = (1+0+1)/2 = 1 → rho = 0.75/√0.75 ≈ 0.8660
    val df = Seq((1.0, 10.0), (1.0, 20.0), (2.0, 30.0)).toDF("x", "y")
    val r = RankStats.spearman(df, "x", "y").select("rho").as[Double].head()
    assert(math.abs(r - 0.75 / math.sqrt(0.75)) < 1e-12, s"tied rho $r")
  }

  test("gini: uniform mass -> 0, single-item mass -> (n-1)/n") {
    val even = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L), ("a", 5L, 4L))
      .toDF("g", "v", "id")
    val g0 = RankStats.giniByGroup(even, "g", "v", "id")
      .select("gini").as[Double].head()
    assert(math.abs(g0) < 1e-12, s"uniform gini $g0")
    val spike = Seq(("a", 0L, 1L), ("a", 0L, 2L), ("a", 0L, 3L), ("a", 100L, 4L))
      .toDF("g", "v", "id")
    val g1 = RankStats.giniByGroup(spike, "g", "v", "id")
      .select("gini").as[Double].head()
    assert(math.abs(g1 - 0.75) < 1e-12, s"spike gini $g1 (expect (n-1)/n = 0.75)")
  }

  test("theil: equal values -> 0 everywhere; decomposition identity holds") {
    val eq = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L)).toDF("g", "v")
    val t0 = RankStats.theilByGroup(eq, "g", "v")
      .select("t_total").as[Double].head()
    assert(math.abs(t0) < 1e-12, s"equal-values theil $t0")
    // skewed: decomposition t_total = Σ t_between_k + Σ share·t_within
    val sk = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 50L))
      .toDF("g", "v")
    val rows = RankStats.theilByGroup(sk, "g", "v")
      .select("share", "t_within", "t_total", "t_between_k")
      .as[(Double, Double, Double, Double)].collect()
    val total = rows.head._3
    val recomposed = rows.map(_._4).sum + rows.map(r => r._1 * r._2).sum
    assert(math.abs(total - recomposed) < 1e-12,
      s"decomposition: total $total vs between+within $recomposed")
    assert(total > 0, "skewed corpus must have positive Theil")
  }
}
