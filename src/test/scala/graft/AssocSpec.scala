package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Assoc

class AssocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Baskets: 1:{a,b,c}, 2:{a,b}, 3:{a}. N=3, n_a=3, n_b=2, n_c=1,
    * n_ab=2, n_ac=1, n_bc=1. */
  private def baskets = Seq(
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"),
    (2, "a") // duplicate row: basket membership is distinct
  ).toDF("b", "item")

  test("associationRules: hand-computed support / confidence / lift") {
    val r = Assoc.associationRules(baskets, "b", "item", minPairSupport = 1)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(x => (x._1, x._2) -> x).toMap
    assert(r.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = r(("a", "b"))
    assert(ab._3 == 2L && ab._4 == 3L && ab._5 == 2L) // n_ab, n_a, n_b
    assert(ab._6 == 2.0 / 3) // support
    assert(ab._7 == 2.0 / 3) // conf a->b
    assert(ab._8 == 1.0) // conf b->a
    assert(ab._9 == (2.0 * 3) / (3 * 2)) // lift = 1 (independence)
    val bc = r(("b", "c"))
    assert(bc._9 == (1.0 * 3) / (2 * 1), "b,c co-occur more than independence predicts")
  }

  test("associationRules: minPairSupport prunes pairs, not marginals") {
    val r = Assoc.associationRules(baskets, "b", "item", minPairSupport = 2)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect()
    assert(r.map(x => (x._1, x._2)).toSet == Set(("a", "b")))
    assert(r.head._4 == 3L, "n_a must still count all baskets containing a")
  }

  test("associationRules: per-basket cap keeps the lexicographically-first items " +
    "and leaves marginals uncapped") {
    val r = Assoc.associationRules(baskets, "b", "item",
      minPairSupport = 1, maxBasketItems = 2)
      .as[(String, String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(x => (x._1, x._2) -> x).toMap
    // basket 1 capped to {a, b} -> the (a,c)/(b,c) candidates vanish
    assert(r.keySet == Set(("a", "b")))
    // but n_c-style marginals would still see c; check via n_a unchanged
    assert(r(("a", "b"))._4 == 3L)
  }

  test("itemItemCosine: hand-computed two-user cosine; minCommon prunes") {
    // ratings: u1 {a:2, b:1}, u2 {a:1, b:3}
    val df = Seq(
      (1, "a"), (1, "a"), (1, "b"),
      (2, "a"), (2, "b"), (2, "b"), (2, "b")
    ).toDF("u", "item")
    val r = Assoc.itemItemCosine(df, "u", "item", minCommon = 2)
      .as[(String, String, Long, Long, Double)].collect()
    assert(r.length == 1)
    val (a, b, nCommon, dot, cos) = r.head
    assert((a, b) == ("a", "b") && nCommon == 2L && dot == 5L) // 2·1 + 1·3
    assert(cos == 5.0 / (math.sqrt(5.0) * math.sqrt(10.0)))
    // minCommon = 3 kills the pair
    assert(Assoc.itemItemCosine(df, "u", "item", minCommon = 3).count() == 0L)
  }
}
