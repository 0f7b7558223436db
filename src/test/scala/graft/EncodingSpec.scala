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
}
