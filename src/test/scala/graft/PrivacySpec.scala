package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** t-closeness: EMD = 0 when a class mirrors the corpus distribution,
  * large (and flagged) when a class concentrates on one end of the
  * ordered sensitive domain. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("class matching the global distribution has emd 0; a concentrated class violates t") {
    // global sensitive values: bins {0, 9} via binWidth 5 → bins 0 and 1
    // class "mirror": one low + one high (matches global 50/50)
    // class "skew": both high (cum gap 0.5 at bin 0 → emd = 0.5)
    val df = Seq(
      ("mirror", 1L), ("mirror", 9L),
      ("skew", 9L), ("skew", 8L))
      .toDF("grp", "sens")
    val r = Privacy.tCloseness(df, Seq("grp"), "sens", binWidth = 5L, t = 0.2)
      .select("grp", "class_size", "emd", "violates_t")
      .as[(String, Long, Double, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    // global per-bin: bin0 = 1 (the 1L), bin1 = 3 → cum_q(bin0) = 1/4
    // mirror: cum_p(bin0) = 1/2 → |1/2 − 1/4| / (m−1 = 1) = 0.25 > 0.2
    // skew:   cum_p(bin0) = 0  → |0 − 1/4| = 0.25
    assert(r("skew")._3 == 0.25 && r("skew")._4, s"skew ${r("skew")}")
    assert(r("mirror")._3 == 0.25 && r("mirror")._4, s"mirror ${r("mirror")}")
    // and a corpus where a class IS the global mix: emd must be 0
    val even = Seq(("a", 1L), ("a", 9L), ("b", 2L), ("b", 8L)).toDF("grp", "sens")
    val r2 = Privacy.tCloseness(even, Seq("grp"), "sens", binWidth = 5L, t = 0.2)
      .select("grp", "emd", "violates_t").as[(String, Double, Boolean)].collect()
    r2.foreach { case (g, emd, v) =>
      assert(emd == 0.0 && !v, s"balanced class $g: emd $emd")
    }
  }

  test("emd is normalized by the bin range: spreading the domain does not inflate it") {
    // same 2-class split but sensitive values spanning 4 bins: the
    // /(m−1) normalization keeps a full-concentration class at ≤ 1
    val df = Seq(("lo", 0L), ("lo", 1L), ("hi", 30L), ("hi", 39L)).toDF("grp", "sens")
    val r = Privacy.tCloseness(df, Seq("grp"), "sens", binWidth = 10L, t = 0.2)
      .select("emd").as[Double].collect()
    r.foreach(e => assert(e >= 0.0 && e <= 1.0, s"emd $e out of [0,1]"))
  }

  test("parameter contracts") {
    val df = Seq(("a", 1L)).toDF("grp", "sens")
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(df, Seq.empty, "sens", binWidth = 5L)
    }
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(df, Seq("grp"), "sens", binWidth = 0L)
    }
  }
}
