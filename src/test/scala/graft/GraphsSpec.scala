package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Symmetric path a—b—c: b is the hub. Hand-unrolled 1 iteration:
    * r0 = 1/3 each; deg a=1, b=2, c=1.
    * r1(a) = 0.05 + 0.85·(r0(b)/2) = 0.05 + 0.85/6
    * r1(b) = 0.05 + 0.85·(r0(a)+r0(c)) = 0.05 + 0.85·2/3
    * r1(c) = r1(a). */
  private val path = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")

  test("pageRank: hand-computed ranks on a 3-node path, mass conserved") {
    val r = Graphs.pageRank(path, "src", "dst", iters = 1)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(r("c") - r("a")) < 1e-15)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "rank mass must be conserved")
    assert(r("b") > r("a"), "hub must outrank leaves")
  }

  test("pageRank: parallel edges don't double-count (distinct contract)") {
    val dup = path.union(path) // every edge twice
    val r1 = Graphs.pageRank(path, "src", "dst", iters = 2).as[(String, Double)].collect().toMap
    val r2 = Graphs.pageRank(dup, "src", "dst", iters = 2).as[(String, Double)].collect().toMap
    assert(r1 == r2)
  }

  test("pageRank: dangling node fails fast") {
    val dangling = Seq(("a", "b")).toDF("src", "dst") // b has no out-edge
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRank(dangling, "src", "dst", iters = 1)
    }
    assert(e.getMessage.contains("out-edge"))
  }
}
