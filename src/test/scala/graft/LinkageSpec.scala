package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Linkage

/** Fellegi-Sunter linkage invariants on small synthetic frames. */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10 records, two fields: city (3 values, skewed), tier (2 values)
  private lazy val recs = Seq(
    (1L, "nyc", "a"), (2L, "nyc", "a"), (3L, "nyc", "a"), (4L, "nyc", "b"),
    (5L, "sf", "a"), (6L, "sf", "b"), (7L, "sf", "b"),
    (8L, "la", "a"), (9L, "la", "b"), (10L, "la", "a"))
    .toDF("id", "city", "tier")

  private lazy val pairs = Seq(
    (1L, 2L, true), (1L, 3L, true), (2L, 3L, true), // same city+tier, pseudo-matches
    (4L, 5L, false), (6L, 8L, false), (9L, 10L, false))
    .toDF("id_a", "id_b", "pseudo")

  test("agreement raises the score; flags are correct") {
    val r = Linkage.fellegiSunter(recs, "id", pairs, Seq("city", "tier"), "pseudo")
      .select("id_a", "id_b", "agree_city", "agree_tier", "score", "decision")
      .as[(Long, Long, Int, Int, Double, String)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    // (1,2): same city, same tier
    assert(r(1L -> 2L)._3 == 1 && r(1L -> 2L)._4 == 1)
    // (4,5): nyc vs sf, b vs a — full disagreement
    assert(r(4L -> 5L)._3 == 0 && r(4L -> 5L)._4 == 0)
    // more agreement ⇒ strictly higher score
    assert(r(1L -> 2L)._5 > r(6L -> 8L)._5, "full agree must outscore partial")
    assert(r(6L -> 8L)._5 > r(4L -> 5L)._5 || r(9L -> 10L)._5 > r(4L -> 5L)._5,
      "partial agree must outscore full disagree")
    r.values.foreach { x =>
      assert(Set("match", "possible", "non_match")(x._6))
      assert(Set(0, 1)(x._3) && Set(0, 1)(x._4))
    }
  }

  test("u is the exact without-replacement collision probability") {
    // city marginals 4/3/3 over N=10: u = (4*3 + 3*2 + 3*2) / (10*9) = 24/90
    // tier marginals 6/4: u = (6*5 + 4*3) / 90 = 42/90. Verify through the
    // score of a fully-disagreeing pair with forced m (all pseudo agree).
    val onlyAgree = Seq((1L, 2L, true)).toDF("id_a", "id_b", "pseudo")
    val allPairs = onlyAgree.union(Seq((4L, 5L, false)).toDF("id_a", "id_b", "pseudo"))
    val r = Linkage.fellegiSunter(recs, "id", allPairs, Seq("city", "tier"), "pseudo")
      .select("id_a", "id_b", "score").as[(Long, Long, Double)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    val (uCity, uTier) = (24.0 / 90, 42.0 / 90)
    val m = 0.999 // all pseudo-truth pairs agree -> clamped
    val expAgree = math.log(m / uCity) + math.log(m / uTier)
    val expDis = math.log((1 - m) / (1 - uCity)) + math.log((1 - m) / (1 - uTier))
    assert(math.abs(r(1L -> 2L) - expAgree) < 1e-12)
    assert(math.abs(r(4L -> 5L) - expDis) < 1e-12)
  }

  test("clamping keeps scores finite when a field is constant") {
    val const = recs.withColumn("city", lit("same"))
    val r = Linkage.fellegiSunter(const, "id", pairs, Seq("city", "tier"), "pseudo")
      .select("score").as[Double].collect()
    r.foreach(s => assert(!s.isInfinite && !s.isNaN))
  }

  test("sortedNeighborhood: w successors in key order within a block, never across blocks") {
    // block 'a': keys aaa < aab < aac < aad; block 'b': bzz
    val df = Seq((1L, "aab"), (2L, "aaa"), (3L, "aad"), (4L, "aac"), (5L, "bzz"))
      .toDF("id", "k")
    val got = Linkage.sortedNeighborhood(df, "id", "k", w = 2, blockLen = 1)
      .select("id_a", "id_b", "w_dist").as[(Long, Long, Int)].collect().toSet
    // sorted block a: (2,aaa) (1,aab) (4,aac) (3,aad)
    val expect = Set(
      (2L, 1L, 1), (2L, 4L, 2),
      (1L, 4L, 1), (1L, 3L, 2),
      (4L, 3L, 1))
    assert(got == expect, s"got $got")
    // 5 (block b) pairs with nothing — boundary pairs are out of scope by design
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("sortedNeighborhood: equal keys fall back to id order (deterministic)") {
    val df = Seq((9L, "xx"), (3L, "xx"), (7L, "xx")).toDF("id", "k")
    val got = Linkage.sortedNeighborhood(df, "id", "k", w = 1, blockLen = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 7L), (7L, 9L)), s"got $got")
  }
}
