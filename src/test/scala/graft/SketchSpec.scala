package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_hll_sketch has no DuckDB oracle (no HLL surface there); this pins
  * its accuracy contract instead: per-group estimates within 2% of the
  * exact distinct counts carried in the same row, and the sketch-UNION
  * total consistent with the exact global distinct — the merge algebra
  * that makes the operator shard at scale. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q_hll_sketch: per-type and unioned estimates within 2% of exact") {
    val rows = SparkEntry.queries("q_hll_sketch")(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val all = rows.filter(_._1 == "__ALL__")
    assert(all.length == 1, "exactly one sketch-union total row")
    rows.foreach { case (t, approx, exact) =>
      assert(exact > 0, s"$t exact must be positive")
      assert(math.abs(approx - exact).toDouble / exact <= 0.02,
        s"$t: approx $approx vs exact $exact beyond 2%")
    }
    // union total must cover at least the largest per-type group and at
    // most the sum (set algebra sanity on the merged sketch)
    val perType = rows.filterNot(_._1 == "__ALL__")
    assert(all.head._3 >= perType.map(_._3).max)
    assert(all.head._3 <= perType.map(_._3).sum)
  }
}
