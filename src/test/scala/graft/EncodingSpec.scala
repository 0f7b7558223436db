package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Encoding

class EncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LOO excludes the row's own label; singleton category gets NULL te_loo") {
    // cat a: labels 1,1,0 -> row with y=1 sees (2-1)/2 = 0.5; row with
    // y=0 sees (2-0)/2 = 1.0. cat b: single row -> te_loo NULL.
    val df = Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 0L), (4L, "b", 1L))
      .toDF("id", "cat", "y")
    val got = Encoding.targetEncodeLoo(df, "cat", "y")
      .select("id", "te_loo").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(0.5) && got(2L).contains(0.5))
    assert(got(3L).contains(1.0))
    assert(got(4L).isEmpty, "singleton category must encode NULL, not Inf")
  }

  test("smoothing shrinks toward the global prior as alpha grows; freq is exact") {
    val df = Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "b", 0L), (4L, "b", 0L))
      .toDF("id", "cat", "y") // prior = 0.5
    val small = Encoding.targetEncodeLoo(df, "cat", "y", alpha = 0.001)
    val large = Encoding.targetEncodeLoo(df, "cat", "y", alpha = 1e6)
    val s1 = small.filter(col("id") === 1).select("te_smooth").head.getDouble(0)
    val l1 = large.filter(col("id") === 1).select("te_smooth").head.getDouble(0)
    assert(s1 > 0.99, s"alpha~0 approaches the raw LOO mean (1.0): $s1")
    assert(math.abs(l1 - 0.5) < 1e-3, s"alpha->inf approaches the prior (0.5): $l1")
    val freqs = small.select("id", "freq").as[(Long, Double)].collect().toMap
    assert(freqs.values.forall(_ == 0.5), s"each category is half the corpus: $freqs")
  }

  test("woeIv: hand-computed two-bin table; antisymmetric WOE; IV sums both contributions") {
    // bin A: 3 good / 1 bad, bin B: 1 good / 3 bad; add-half, m = 2:
    // pgA = 3.5/5 = 0.7, pbA = 1.5/5 = 0.3 → woeA = ln(7/3)
    // B mirrors → woeB = ln(3/7); IV = 0.4·ln(7/3) + (−0.4)·ln(3/7) = 0.8·ln(7/3)
    val df = Seq(("A", 1L), ("A", 1L), ("A", 1L), ("A", 0L),
      ("B", 1L), ("B", 0L), ("B", 0L), ("B", 0L)).toDF("bin", "y")
    val r = Encoding.woeIv(df, "bin", "y")
      .select("bin", "n_good", "n_bad", "woe", "contrib", "iv")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    val expWoe = math.log(7.0 / 3.0)
    assert(r("A")._2 == 3L && r("A")._3 == 1L)
    assert(math.abs(r("A")._4 - expWoe) < 1e-12, s"woeA ${r("A")._4}")
    assert(math.abs(r("B")._4 + expWoe) < 1e-12, s"woeB ${r("B")._4}")
    assert(math.abs(r("A")._6 - 0.8 * expWoe) < 2e-9, s"iv ${r("A")._6}")
    assert(r("A")._6 == r("B")._6, "iv is repeated on every row")
  }
}
