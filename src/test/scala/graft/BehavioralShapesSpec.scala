package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the behavioral-model queries (markov / rfm /
  * benford) on the sf0.001 feed — the oracle gate pins exact values,
  * these pin the algebra that must hold at any scale. */
class BehavioralShapesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("markov: transition rows are a probability distribution per source state") {
    val rows = graft.queries.Behavioral.markov(spark, dir)
      .select("cur", "n", "p").as[(String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (cur, rs) =>
      val total = rs.map(_._3).sum
      assert(math.abs(total - 1.0) < 1e-6, s"P(·|$cur) sums to $total")
      rs.foreach(r => assert(r._3 > 0 && r._3 <= 1.0))
    }
  }

  test("rfm: quintile scores are 1..5 and near-balanced; segment echoes the scores") {
    val rows = graft.queries.Behavioral.rfm(spark, dir)
      .select("r_score", "f_score", "m_score", "segment")
      .as[(Int, Int, Int, String)].collect()
    rows.foreach { case (r, f, m, seg) =>
      assert(Seq(r, f, m).forall(x => x >= 1 && x <= 5))
      assert(seg == s"$r$f$m")
    }
    val byBucket = rows.groupBy(_._1).view.mapValues(_.length).values
    assert(byBucket.max - byBucket.min <= 1, "ntile buckets differ by at most one")
  }

  test("benford: observed and expected shares each total 1") {
    val rows = graft.queries.Behavioral.benford(spark, dir)
      .select("digit", "frac", "expected").as[(Int, Double, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "observed shares total 1")
    // full Benford support sums to 1 by construction
    val expTotal = (1 to 9).map(d => math.log10(1 + 1.0 / d)).sum
    assert(math.abs(expTotal - 1.0) < 1e-12)
  }
}
