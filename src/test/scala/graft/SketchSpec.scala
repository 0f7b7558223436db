package graft

import org.scalatest.funsuite.AnyFunSuite

/** DuckDB has no HLL surface, so q_hll_sketch's oracle only sees the
  * folded within-2% boolean; this pins the underlying accuracy contract
  * on the detailed output: per-group estimates within 2% of the exact
  * distinct counts carried in the same row, and the sketch-UNION total
  * consistent with the exact global distinct — the merge algebra that
  * makes the operator shard at scale. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hll sketch detail: per-type and unioned estimates within 2% of exact") {
    val rows = graft.queries.Relational.hllSketchDetail(spark, "/root/testdata/sf0.01")
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
