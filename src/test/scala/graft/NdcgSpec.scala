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

  private def runMap(rows: Seq[(Int, Int, Boolean, Long)]): Map[Int, (Long, Long, Double)] =
    Eval.mapBinaryAtK(rows.toDF("q", "rank", "rel", "total_rel"),
        "q", "rank", "rel", "total_rel", k = 3)
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("mapBinaryAtK: hand-computed — hits at ranks 1+3, 5 total relevant") {
    // AP = (P@1 + P@3)/min(3,5) = (1/1 + 2/3)/3 = 5/9
    val r = runMap(Seq((1, 1, true, 5L), (1, 2, false, 5L), (1, 3, true, 5L)))
    assert(r(1)._3 == (6.0 + 4.0) / 18.0, s"got ${r(1)._3}") // (1·6 + 2·2)/(6·3)
    assert(r(1)._1 == 2L && r(1)._2 == 3L)
  }

  test("mapBinaryAtK: single relevant found at rank 2 -> AP = 1/2; " +
    "perfect top-heavy ranking -> 1.0; zero relevant -> 0") {
    val r = runMap(Seq(
      (1, 1, false, 1L), (1, 2, true, 1L), (1, 3, false, 1L),
      (2, 1, true, 2L), (2, 2, true, 2L), (2, 3, false, 2L),
      (3, 1, false, 0L), (3, 2, false, 0L), (3, 3, false, 0L)))
    assert(r(1)._3 == 0.5)
    assert(r(2)._3 == 1.0)
    assert(r(3)._3 == 0.0)
  }

  /** KNN-Shapley hand case, K=1, one probe (label 1) and ranked train
    * rels (1, 0, 1): s₍₃₎ = 1/3, s₍₂₎ = 1/3 − 1/2 = −1/6,
    * s₍₁₎ = −1/6 + 1 = 5/6. */
  test("knnShapley: hand-computed 3-point recursion; efficiency " +
    "(values sum to the K-NN vote share of the full set)") {
    val train = Seq(
      (10L, Array(1.0f, 0.1f), 1),  // closest, same label
      (11L, Array(0.0f, 1.0f), 0),  // middle, other label
      (12L, Array(-1.0f, 0.5f), 1)  // farthest, same label
    ).toDF("vec_id", "embedding", "label")
    val probe = Seq((1L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val r = Eval.knnShapley(train, probe, "vec_id", "embedding", "label", k = 1)
      .as[(Long, Double, Long)].collect().map(x => x._1 -> x._2).toMap
    assert(math.abs(r(10L) - 5.0 / 6) < 1e-9, s"got $r")
    assert(math.abs(r(11L) - (-1.0 / 6)) < 1e-9, s"got $r")
    assert(math.abs(r(12L) - 1.0 / 3) < 1e-9, s"got $r")
    // efficiency: Σ s_i = v(full) = 1[1-NN correct] = 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"sum ${r.values.sum}")
  }

  test("knnShapley: efficiency holds for K=3 on a seeded corpus " +
    "(Σ values = mean top-K vote share over probes)") {
    var state = 11L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.floorMod(state >>> 16, 1000L) + 0.5) / 1000.0
    }
    val train = (100L to 140L).map(id =>
      (id, Array(next().toFloat, next().toFloat, next().toFloat), (id % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val probes = (1L to 4L).map(id =>
      (id, Array(next().toFloat, next().toFloat, next().toFloat), (id % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val vals = Eval.knnShapley(train, probes, "vec_id", "embedding", "label", k = 3)
      .as[(Long, Double, Long)].collect()
    assert(vals.forall(_._3 == 4L), "every train point valued against all probes")
    // Σ_i s_i per probe = (1/K)·Σ_{top-K} rel; averaged over probes it
    // must equal the mean top-3 vote share — recompute it naively
    val t = train.as[(Long, Array[Float], Int)].collect()
    val p = probes.as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = p.map { case (_, pv, pl) =>
      val top = t.sortBy { case (tid, tv, _) => (1.0 - cos(tv, pv), tid) }.take(3)
      top.count(_._3 == pl).toDouble / 3
    }.sum / p.length
    assert(math.abs(vals.map(_._2).sum - expect) < 1e-6,
      s"efficiency: ${vals.map(_._2).sum} vs $expect")
  }
}
