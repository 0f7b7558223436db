package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GeoMedian

/** Weiszfeld geometric-median invariants. */
class GeoMedianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 60 points tightly around (2, -1, 0.5, 3) plus one gross outlier
  private def corpus(withOutlier: Boolean) = {
    val base = (1 to 60).map { i =>
      val j = (i % 5 - 2) / 100.0 // deterministic +-0.02 jitter
      (i.toLong, Seq(2.0 + j, -1.0 + j, 0.5 - j, 3.0 + j))
    }
    val rows = if (withOutlier) base :+ (99L, Seq(500.0, 500.0, 500.0, 500.0)) else base
    rows.toDF("id", "vec")
  }

  test("median shrugs off the outlier that drags the mean") {
    val r = GeoMedian.geometricMedian(corpus(withOutlier = true), "id", "vec", iters = 3)
      .select("pos", "mean", "median").as[(Int, Double, Double)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    val truth = Seq(2.0, -1.0, 0.5, 3.0)
    truth.zipWithIndex.foreach { case (t, p) =>
      assert(math.abs(r(p)._1 - t) > 5.0, s"dim $p: mean should be dragged far from $t")
      assert(math.abs(r(p)._2 - t) < 0.5, s"dim $p: median ${r(p)._2} must stay near $t")
    }
  }

  test("clean corpus: mean is the exact average and median converges to it") {
    val r = GeoMedian.geometricMedian(corpus(withOutlier = false), "id", "vec", iters = 3)
      .select("pos", "mean", "median").as[(Int, Double, Double)].collect()
    r.foreach { case (_, mean, med) =>
      assert(math.abs(mean - med) < 0.05, "symmetric cloud: median ≈ mean")
    }
    // dim 0 exact average check: mean of 2.0 + jitter pattern
    val exp = (1 to 60).map(i => 2.0 + (i % 5 - 2) / 100.0).sum / 60
    val got = r.find(_._1 == 0).get._2
    assert(math.abs(got - exp) < 1e-9)
  }

  test("deterministic across invocations") {
    def run() = GeoMedian.geometricMedian(corpus(withOutlier = true), "id", "vec")
      .select("pos", "median").as[(Int, Double)].collect().toSeq.sortBy(_._1)
    assert(run() == run())
  }
}
