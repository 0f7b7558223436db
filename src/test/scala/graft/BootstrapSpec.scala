package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bootstrap

/** Poisson-bootstrap invariants. */
class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PoissonCdf ladder is increasing and nearly total") {
    val cdf = Bootstrap.PoissonCdf
    assert(cdf.length == 7)
    assert(cdf.sliding(2).forall { case Seq(a, b) => b > a })
    assert(math.abs(cdf.head - math.exp(-1.0)) < 1e-15)
    assert(cdf.last > 0.9999 && cdf.last < 1.0) // P(X <= 6) ≈ 0.999917
  }

  test("CI brackets the point estimate, deterministic, sane width") {
    val d = (1 to 400).map(i => (i.toLong, 10.0 + (i % 7))).toDF("id", "v")
    val r1 = Bootstrap.poissonBootstrapMean(d, "id", "v")
      .select("n", "mean", "b", "ci_lo", "ci_hi")
      .as[(Long, Double, Int, Double, Double)].head()
    assert(r1._1 == 400 && r1._3 == 50)
    assert(r1._4 < r1._5, "lo < hi")
    assert(r1._4 <= r1._2 && r1._2 <= r1._5, "CI must bracket the point estimate")
    // SE of the mean ≈ sd/√n ≈ 2/20 = .1 → CI width well under 1
    assert(r1._5 - r1._4 < 1.0, s"CI implausibly wide: $r1")
    val r2 = Bootstrap.poissonBootstrapMean(d, "id", "v")
      .select("ci_lo", "ci_hi").as[(Double, Double)].head()
    assert(r2 == ((r1._4, r1._5)), "hash-derived draws are reproducible")
  }

  test("replicate multiplicities resample ~n rows on average") {
    // mean Poisson(1) multiplicity is 1: total resampled mass over all
    // replicates should sit near B·n
    val d = (1 to 500).map(i => (i.toLong, 1.0)).toDF("id", "v")
    val r = Bootstrap.poissonBootstrapMean(d, "id", "v", b = 20, loRank = 1, hiRank = 20)
      .select("mean").as[Double].head()
    assert(r == 1.0, "constant metric: every replicate mean is exactly the constant")
  }

  test("jackknifeMean: two-group closed form; G=1 and empty-complement are NULL") {
    // groups: A = {1.00, 3.00}, B = {2.00}; S=600c N=3 G=2
    // theta_-A = 2.00, theta_-B = (600-200)/100/2 = 2.00 -> SS = 0 -> se 0
    val df = Seq(("A", 1.00), ("A", 3.00), ("B", 2.00)).toDF("grp", "v")
    val r = operators.Bootstrap.jackknifeMean(df, "grp", "v")
      .as[(Long, Double, Option[Double])].head()
    assert(r._1 == 2L && math.abs(r._2 - 2.0) < 1e-12 && r._3.contains(0.0), s"got $r")

    // asymmetric: A = {0.00}, B = {4.00}: theta_-A = 4, theta_-B = 0,
    // bar = 2, SS = 8, se = sqrt(1/2 * 8) = 2
    val df2 = Seq(("A", 0.00), ("B", 4.00)).toDF("grp", "v")
    val r2 = operators.Bootstrap.jackknifeMean(df2, "grp", "v")
      .as[(Long, Double, Option[Double])].head()
    assert(math.abs(r2._3.get - 2.0) < 1e-9, s"got $r2")

    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("grp", "v")
    val r1 = operators.Bootstrap.jackknifeMean(one, "grp", "v")
      .as[(Long, Double, Option[Double])].head()
    assert(r1._1 == 1L && r1._3.isEmpty, "G=1 must emit NULL se")
  }
}
