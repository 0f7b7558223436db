package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Eval

class NdcgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = Eval.ndcgDiscountsFp(3) // 1e9, round(1e9/log2 3), 5e8
  private def run(rows: Seq[(Int, Int, Boolean, Long)]): Map[Int, (Long, Long, Long, Double)] =
    Eval.ndcgBinaryAtK(rows.toDF("q", "rank", "rel", "total_rel"),
        "q", "rank", "rel", "total_rel", k = 3)
      .as[(Int, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("discount table: exact fixed-point values") {
    assert(d == Seq(1000000000L, 630929754L, 500000000L))
  }

  test("hand-computed: hits at ranks 1+3 with plentiful relevance") {
    val r = run(Seq((1, 1, true, 5L), (1, 2, false, 5L), (1, 3, true, 5L)))
    val (nHits, totalRel, nRet, ndcg) = r(1)
    assert((nHits, totalRel, nRet) == (2L, 5L, 3L))
    assert(ndcg == (d(0) + d(2)).toDouble / (d(0) + d(1) + d(2)))
  }

  test("IDCG truncates at total_rel: a single relevant doc found at rank 2 " +
    "is judged against the 1-doc ideal, not the 3-doc one") {
    val r = run(Seq((7, 1, false, 1L), (7, 2, true, 1L), (7, 3, false, 1L)))
    assert(r(7)._4 == d(1).toDouble / d(0))
  }

  test("perfect ranking scores exactly 1.0") {
    val r = run(Seq((2, 1, true, 2L), (2, 2, true, 2L), (2, 3, false, 2L)))
    assert(r(2)._4 == 1.0)
  }

  test("zero relevant candidates in the corpus -> ndcg 0, not NaN") {
    val r = run(Seq((3, 1, false, 0L), (3, 2, false, 0L), (3, 3, false, 0L)))
    assert(r(3)._4 == 0.0)
  }
}
