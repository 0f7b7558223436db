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

  test("lDiversity: entropy gate catches the skew distinct-count passes") {
    // both classes hold 2 distinct values (distinct-count l=2 passes
    // both); 'skewed' is 9-vs-1 → H = 0.325 < ln 2 → entropy_ok false
    val df = (Seq.fill(9)(("skewed", "flu")) ++ Seq(("skewed", "hiv")) ++
      Seq(("even", "flu"), ("even", "hiv"), ("even", "flu"), ("even", "hiv")))
      .toDF("grp", "diag")
    val r = Privacy.lDiversity(df, Seq("grp"), "diag", l = 2, c = 2.0)
      .select("grp", "class_size", "distinct_l", "entropy", "entropy_ok",
        "top_count", "recursive_ok")
      .as[(String, Long, Long, Double, Boolean, Long, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("skewed")._3 == 2L && !r("skewed")._5, s"skewed ${r("skewed")}")
    // recursive (2,2): r1=9 < 2·(tail=1)=2 is false
    assert(r("skewed")._6 == 9L && !r("skewed")._7)
    // even 50/50: H = ln 2 exactly → ok at the boundary; r1=2 < 2·2=4 ok
    assert(r("even")._4 == 0.693147 && r("even")._5 && r("even")._7,
      s"even ${r("even")}")
  }

  test("lDiversity: single-value class fails both gates; contracts hold") {
    val df = Seq(("mono", "flu"), ("mono", "flu"), ("mono", "flu")).toDF("grp", "diag")
    val r = Privacy.lDiversity(df, Seq("grp"), "diag", l = 2, c = 2.0)
      .select("distinct_l", "entropy", "entropy_ok", "recursive_ok")
      .as[(Long, Double, Boolean, Boolean)].collect().head
    assert(r._1 == 1L && r._2 == 0.0 && !r._3 && !r._4)
    intercept[IllegalArgumentException] {
      Privacy.lDiversity(df, Seq.empty, "diag")
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversity(df, Seq("grp"), "diag", l = 1)
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

  test("dpCounts: reproducible release — identical noise across runs, " +
    "n_dp = n_true + noise, finite noise on every group") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"g${i % 7}", i)).toDF("grp", "x")
    val r1 = Privacy.dpCounts(df, Seq("grp"), epsilon = 1.0, seed = "dp")
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    val r2 = Privacy.dpCounts(df, Seq("grp"), epsilon = 1.0, seed = "dp")
      .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(r1.toSeq == r2.toSeq, "same (seed, statistic) must release the same noise")
    r1.foreach { case (g, nTrue, nDp, noise, eps) =>
      assert(nDp == nTrue + noise, s"$g")
      assert(!noise.isNaN && !noise.isInfinite, s"$g noise=$noise")
      assert(eps == 1.0)
    }
    assert(r1.map(_._4).distinct.length == r1.length,
      "distinct groups must draw distinct noise (hash-keyed)")
  }

  test("dpCounts: noise scale tracks sensitivity/epsilon; seed changes the draw") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"g${i % 5}", i)).toDF("grp", "x")
    val tight = Privacy.dpCounts(df, Seq("grp"), epsilon = 10.0, seed = "dp")
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    val loose = Privacy.dpCounts(df, Seq("grp"), epsilon = 0.1, seed = "dp")
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    // same seed → same uniform → noise scales exactly by b2/b1 = 100
    tight.foreach { case (g, n) =>
      assert(math.abs(loose(g) - 100.0 * n) < 1e-9, s"$g: ${loose(g)} vs ${100 * n}")
    }
    val other = Privacy.dpCounts(df, Seq("grp"), epsilon = 10.0, seed = "dp2")
      .as[(String, Long, Double, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(other != tight, "a different seed must draw different noise")
    intercept[IllegalArgumentException] { Privacy.dpCounts(df, Seq("grp"), epsilon = 0.0, seed = "dp") }
  }
}
