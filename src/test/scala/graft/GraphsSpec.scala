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

  test("triangleStats: K4 has 4 triangles, 4 wedges under a<b<c; path has 1 open wedge") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles; under the a<b<c
    // orientation every ordered triple is exactly one wedge, all closed
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("s", "d")
    val r = Graphs.triangleStats(k4, "s", "d")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((4L, 6L, 4L, 4L)), s"K4 census wrong: $r")

    // 3-node path 1-2-3: one wedge, zero triangles
    val p = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val rp = Graphs.triangleStats(p, "s", "d").as[(Long, Long, Long, Long)].head()
    assert(rp == ((3L, 2L, 1L, 0L)), s"path census wrong: $rp")
  }

  test("triangleStats: reversed duplicates and self-loops collapse to the canonical edge") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (2L, 2L))
      .toDF("s", "d")
    val r = Graphs.triangleStats(messy, "s", "d").as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 3L, 1L, 1L)), s"canonicalization wrong: $r")
  }

  test("labelPropagation: disjoint cliques converge to their min label, deterministically") {
    val edges = Seq( // two disjoint triangles
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("s", "d")
    val got = Graphs.labelPropagation(edges, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L), "every node keeps a label")
    assert(Set(1L, 2L, 3L).forall(got(_) == 1L), s"clique A must converge to 1: $got")
    assert(Set(10L, 11L, 12L).forall(got(_) == 10L), s"clique B must converge to 10: $got")
    val again = Graphs.labelPropagation(edges, "s", "d", iters = 2).as[(Long, Long)].collect().toMap
    assert(again == got, "synchronous LPA must be deterministic")
  }

  test("labelPropagation: min-label tie-break and direction-insensitivity") {
    // path 1-2-3 given with mixed edge directions: node 2 sees labels
    // {1, 3} (tie) -> must take 1
    val path = Seq((2L, 1L), (3L, 2L)).toDF("s", "d")
    val got = Graphs.labelPropagation(path, "s", "d", iters = 1).as[(Long, Long)].collect().toMap
    assert(got(2L) == 1L, "tie must break toward the smallest label")
    assert(got(1L) == 2L && got(3L) == 2L, "endpoints adopt their only neighbor")
  }
}
