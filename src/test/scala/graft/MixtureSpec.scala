package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.operators.{Drift, Eval, Raking, Sampling}

/** Invariants for the corpus-mix design operators: temperature
  * weights, IPF raking, token-distribution divergence, calibration. */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private lazy val docs = Tables(spark, "/root/testdata/sf0.01", "documents")

  // ---- temperatureWeights ---------------------------------------------------

  private def tempMix(alpha: Double) =
    Sampling.temperatureWeights(
      docs.withColumn("nt", col("n_chars")), "source", "nt", alpha, budget = 100000L)

  test("temperatureWeights: weights sum to 1; alpha=1 keeps raw proportions") {
    val rows = tempMix(1.0)
      .select("source", "p_raw", "weight").as[(String, Double, Double)].collect()
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    rows.foreach { case (s, p, w) =>
      assert(math.abs(p - w) < 1e-9, s"alpha=1 must keep p_raw for $s")
    }
  }

  test("temperatureWeights: alpha=0.5 flattens toward uniform") {
    val raw = tempMix(1.0).select("source", "weight").as[(String, Double)].collect().toMap
    val smo = tempMix(0.5).select("source", "weight").as[(String, Double)].collect().toMap
    assert(math.abs(smo.values.sum - 1.0) < 1e-9)
    val biggest = raw.maxBy(_._2)._1
    val smallest = raw.minBy(_._2)._1
    assert(smo(biggest) < raw(biggest), "head source must be downsampled")
    assert(smo(smallest) > raw(smallest), "tail source must be upsampled")
    // order is preserved — smoothing rescales, never reranks
    assert(raw.toSeq.sortBy(_._2).map(_._1) == smo.toSeq.sortBy(_._2).map(_._1))
  }

  test("temperatureWeights: epochs = expected/available; rejects bad alpha") {
    val r = tempMix(0.5)
      .select("n_tokens", "expected_tokens", "epochs").as[(Long, Double, Double)].collect()
    r.foreach { case (nt, exp, ep) => assert(math.abs(ep - exp / nt) < 1e-12) }
    intercept[IllegalArgumentException](tempMix(0.0).collect())
    intercept[IllegalArgumentException](tempMix(1.5).collect())
  }

  // ---- Raking.rake ----------------------------------------------------------

  private val langT = Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)
  private val srcT = (0 to 9).map(i => s"src$i" -> 0.1).toMap

  test("rake: column marginals match exactly after the closing column pass") {
    val cells = Raking.rake(docs, "lang", "source", langT, srcT, iters = 2)
    val colMass = cells.groupBy("source").agg(sum("mass").as("m"))
      .as[(String, Double)].collect().toMap
    // "exact" up to the 1e-9 fixed-point quantum the masses are summed in
    colMass.foreach { case (s, m) =>
      assert(math.abs(m - srcT(s)) < 1e-7, s"source $s mass $m != ${srcT(s)}")
    }
    // row marginals converge toward targets (exactness only at the limit)
    val rowMass = cells.groupBy("lang").agg(sum("mass").as("m"))
      .as[(String, Double)].collect().toMap
    rowMass.foreach { case (l, m) =>
      assert(math.abs(m - langT(l)) < 0.05, s"lang $l mass $m far from ${langT(l)}")
    }
    assert(math.abs(colMass.values.sum - 1.0) < 1e-7, "total mass = target total")
  }

  test("rake: more iterations tighten the row marginals") {
    def rowErr(iters: Int): Double =
      Raking.rake(docs, "lang", "source", langT, srcT, iters)
        .groupBy("lang").agg(sum("mass").as("m")).as[(String, Double)].collect()
        .map { case (l, m) => math.abs(m - langT(l)) }.max
    assert(rowErr(4) <= rowErr(1), "row-marginal error must not grow with rounds")
  }

  test("rake: deterministic and strictly positive weights") {
    val a = Raking.rake(docs, "lang", "source", langT, srcT, iters = 2)
      .select("lang", "source", "weight").as[(String, String, Double)].collect().toSet
    val b = Raking.rake(docs, "lang", "source", langT, srcT, iters = 2)
      .select("lang", "source", "weight").as[(String, String, Double)].collect().toSet
    assert(a == b)
    a.foreach { case (_, _, w) => assert(w > 0) }
  }

  // ---- Drift.tokenJsDivergence ---------------------------------------------

  test("tokenJsDivergence: bounded, symmetric, zero on identical slices") {
    val en = docs.filter($"lang" === "en")
    val rest = docs.filter($"lang" =!= "en")
    val ab = Drift.tokenJsDivergence(en, rest, "text")
      .select("kl_ab", "kl_ba", "jsd").as[(Double, Double, Double)].head()
    val ba = Drift.tokenJsDivergence(rest, en, "text")
      .select("kl_ab", "kl_ba", "jsd").as[(Double, Double, Double)].head()
    assert(ab._3 > 0 && ab._3 <= math.log(2) + 1e-9, s"JSD ${ab._3} out of (0, ln 2]")
    assert(ab._1 > 0 && ab._2 > 0, "smoothed KLs are positive for distinct slices")
    assert(math.abs(ab._3 - ba._3) < 1e-6, "JSD is symmetric")
    assert(math.abs(ab._1 - ba._2) < 1e-6 && math.abs(ab._2 - ba._1) < 1e-6,
      "KLs swap under argument swap")
    val same = Drift.tokenJsDivergence(en, en, "text")
      .select("kl_ab", "kl_ba", "jsd").as[(Double, Double, Double)].head()
    assert(same._1 == 0.0 && same._2 == 0.0 && same._3 == 0.0)
  }

  test("tokenJsDivergence: vocab accounting is the union") {
    val r = Drift.tokenJsDivergence(
      docs.filter($"lang" === "en"), docs.filter($"lang" =!= "en"), "text")
      .select("vocab_union", "vocab_a", "vocab_b").as[(Long, Long, Long)].head()
    assert(r._1 >= math.max(r._2, r._3) && r._1 <= r._2 + r._3)
  }

  // ---- Eval.calibration -----------------------------------------------------

  test("calibration: bins partition the frame; gaps consistent; ECE in [0,1]") {
    val scored = docs.select(
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      (least(col("n_chars").cast("double") / 4000, lit(1.0))).as("p"))
    val cal = Eval.calibration(scored, "p", "y", bins = 10)
      .select("bin", "n", "avg_conf", "frac_pos", "abs_gap", "ece")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(cal.map(_._2).sum == docs.count(), "bins partition the corpus")
    cal.foreach { case (b, _, conf, pos, gap, ece) =>
      assert(b >= 0 && b <= 9)
      assert(math.abs(gap - math.abs(conf - pos)) < 1e-12)
      assert(ece >= 0 && ece <= 1)
    }
    assert(cal.map(_._6).distinct.length == 1, "ECE is the same scalar on every row")
    // ECE is the n-weighted mean gap
    val n = cal.map(_._2).sum.toDouble
    val expected = cal.map { c => c._2 * c._5 }.sum / n
    assert(math.abs(cal.head._6 - expected) < 1e-9)
  }

  // ---- Diversity.growthCurve -----------------------------------------------

  test("growthCurve: slices partition the corpus; curve is a monotone exact count") {
    val r = graft.operators.Diversity.growthCurve(docs, "doc_id", "text", n = 3, buckets = 10)
      .orderBy("bucket")
      .select("bucket", "n_docs", "slice_tokens", "new_types", "cum_tokens", "cum_types")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(r.map(_._1).toSeq == (0 until 10), "every slice present")
    assert(r.map(_._2).sum == docs.count(), "slices partition the docs")
    assert(r.last._5 == r.map(_._3).sum && r.last._6 == r.map(_._4).sum,
      "cumulative columns are running sums")
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 >= a._5 && b._6 >= a._6, "cumulative curve must be monotone")
    }
    // the final type count is the corpus's exact distinct-trigram count
    val distinctGrams = docs
      .withColumn("t", graft.functions.TextAnalysis.tokens("text"))
      .select(explode(graft.functions.TextAnalysis.shinglesMulti("t", 3)).as("g"))
      .agg(countDistinct($"g")).as[Long].head()
    assert(r.last._6 == distinctGrams)
  }

  // ---- Curation.blocklistHits ----------------------------------------------

  test("blocklistHits: token-exact matches with counts, mixed lengths, no false hits") {
    val d = Seq(
      (1L, "the Quick, BROWN fox! jumps the quick brown dog"),
      (2L, "quick brown things and a quick brownie"),
      (3L, "nothing to see here")).toDF("id", "body")
    val ph = Seq((10L, "quick brown"), (20L, "jumps the quick")).toDF("pid", "p")
    val hits = graft.operators.Curation.blocklistHits(d, "id", "body", ph, "pid", "p")
      .as[(Long, Long, Long)].collect().map(x => (x._1, x._2) -> x._3).toMap
    // doc 1: "Quick, BROWN" normalizes to a hit + "quick brown dog" = 2 hits
    assert(hits(1L -> 10L) == 2L)
    assert(hits(1L -> 20L) == 1L, "3-token phrase found across punctuation")
    // doc 2: "quick brownie" must NOT match "quick brown" (token-exact)
    assert(hits(2L -> 10L) == 1L)
    assert(!hits.contains(2L -> 20L) && !hits.keys.exists(_._1 == 3L), "no false hits")
  }

  // ---- Privacy.kAnonymity --------------------------------------------------

  test("kAnonymity: classes partition rows; flags and rates are consistent") {
    val r = graft.operators.Privacy.kAnonymity(
      docs.withColumn("len_band", floor(col("n_chars") / 500)),
      Seq("source", "len_band"), "lang", k = 5, l = 2)
      .select("class_size", "l_diversity", "risk", "violates_k", "violates_l",
        "n_rows", "frac_rows_at_risk", "min_class_size")
      .as[(Long, Long, Double, Boolean, Boolean, Long, Double, Long)].collect()
    val n = docs.count()
    assert(r.map(_._1).sum == n, "classes partition the corpus")
    assert(r.forall(_._6 == n))
    r.foreach { x =>
      assert(x._4 == (x._1 < 5) && x._5 == (x._2 < 2))
      assert(math.abs(x._3 - 1.0 / x._1) < 1e-15)
      assert(x._2 <= x._1, "l-diversity cannot exceed class size")
    }
    val atRisk = r.filter(_._4).map(_._1).sum.toDouble / n
    assert(math.abs(r.head._7 - atRisk) < 1e-12)
    assert(r.head._8 == r.map(_._1).min)
  }

  test("kAnonymity: a unique quasi-identifier is flagged at maximum risk") {
    val d = Seq((1L, "x", "s1"), (2L, "x", "s2"), (3L, "x", "s1"), (4L, "y", "s1"))
      .toDF("id", "qid", "sens")
    val r = graft.operators.Privacy.kAnonymity(d, Seq("qid"), "sens", k = 2, l = 2)
      .select("qid", "class_size", "l_diversity", "risk", "violates_k", "violates_l")
      .as[(String, Long, Long, Double, Boolean, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("y")._5 && r("y")._4 == 1.0, "singleton class is fully linkable")
    assert(!r("x")._5 && !r("x")._6, "3-row 2-diverse class passes at k=2,l=2")
  }

  // ---- Eval.groupFairness / brierDecomposition -----------------------------

  test("groupFairness: hand-counted rates, gaps, and undefined-rate NULLs") {
    val d = Seq(
      // group g1: 2 pos (1 predicted), 2 neg (1 predicted) -> tpr .5, fpr .5
      ("g1", 1.0, 1.0), ("g1", 1.0, 0.0), ("g1", 0.0, 1.0), ("g1", 0.0, 0.0),
      // group g2: all positive, all selected -> tpr 1, fpr NULL
      ("g2", 1.0, 1.0), ("g2", 1.0, 1.0))
      .toDF("grp", "y", "pred")
    val r = graft.operators.Eval.groupFairness(d, "grp", "y", "pred")
      .select("grp", "n", "base_rate", "sel_rate", "tpr", "fpr", "dp_gap", "eo_gap")
      .as[(String, Long, Double, Double, Option[Double], Option[Double], Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    val g1 = r("g1"); val g2 = r("g2")
    assert(g1._3 == 0.5 && g1._4 == 0.5 && g1._5.contains(0.5) && g1._6.contains(0.5))
    assert(g2._3 == 1.0 && g2._4 == 1.0 && g2._5.contains(1.0) && g2._6.isEmpty,
      "FPR over zero negatives must be NULL, not 0")
    assert(g1._7 == 0.5 && g1._8 == 0.5, "gaps are max-min over groups")
  }

  test("brierDecomposition: Murphy identity holds; perfect scorer decomposes to 0/unc/unc") {
    val scored = docs.select(
      when($"lang" === "en", 1.0).otherwise(0.0).as("y"),
      (least(col("n_chars").cast("double") / 4000, lit(1.0))).as("p"))
    val r = graft.operators.Eval.brierDecomposition(scored, "p", "y", bins = 10)
      .select("n", "brier", "reliability", "resolution", "uncertainty")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == docs.count())
    // binned decomposition: identity holds up to the within-bin
    // forecast variance, bounded by (bin width / 2)² = 0.0025
    assert(math.abs(r._2 - (r._3 - r._4 + r._5)) < 0.0025,
      s"brier ${r._2} != rel-res+unc ${r._3 - r._4 + r._5}")
    assert(r._2 >= 0 && r._3 >= 0 && r._4 >= 0 && r._5 >= 0 && r._5 <= 0.25)
    val perfect = docs.select(when($"doc_id" % 2 === 0, 1.0).otherwise(0.0).as("y"))
      .withColumn("p", col("y"))
    val pr = graft.operators.Eval.brierDecomposition(perfect, "p", "y", bins = 10)
      .select("brier", "reliability", "resolution", "uncertainty")
      .as[(Double, Double, Double, Double)].head()
    assert(pr._1 == 0.0 && pr._2 == 0.0)
    assert(math.abs(pr._3 - pr._4) < 1e-9, "perfect scorer: resolution equals uncertainty")
  }

  test("calibration: a perfect probability scorer has ECE 0") {
    val perfect = docs.select(
      when($"doc_id" % 2 === 0, 1.0).otherwise(0.0).as("y"))
      .withColumn("p", col("y"))
    val cal = Eval.calibration(perfect, "p", "y", bins = 10)
      .select("bin", "abs_gap", "ece").as[(Int, Double, Double)].collect()
    assert(cal.map(_._1).toSet == Set(0, 9), "mass sits in the extreme bins")
    cal.foreach { case (_, gap, ece) => assert(gap == 0.0 && ece == 0.0) }
  }

  test("isotonicFit: PAV pools violators to the range mean; monotone output; exact on clean input") {
    // bins 0 and 1 violate (0.8 then 0.2 with equal n) -> both pool to 0.5
    val viol = Seq((0.05, 1.0), (0.05, 1.0), (0.05, 1.0), (0.05, 1.0), (0.05, 0.0),
                   (0.15, 1.0), (0.15, 0.0), (0.15, 0.0), (0.15, 0.0), (0.15, 0.0))
      .toDF("p", "y")
    val r = operators.Eval.isotonicFit(viol, "p", "y", bins = 10)
      .as[(Int, Long, Double, Double)].collect().map(x => x._1 -> x._4).toMap
    assert(r == Map(0 -> 0.5, 1 -> 0.5), s"violators must pool to the joint mean: $r")

    // already-monotone rates pass through unchanged
    val clean = Seq((0.05, 0.0), (0.05, 0.0), (0.15, 1.0), (0.15, 0.0), (0.25, 1.0))
      .toDF("p", "y")
    val rc = operators.Eval.isotonicFit(clean, "p", "y", bins = 10)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rc.map(_._4).toSeq == Seq(0.0, 0.5, 1.0), s"got ${rc.toSeq}")
    assert(rc.map(_._4).toSeq.sliding(2).forall(w => w.head <= w.last),
      "isotonic output must be non-decreasing")
  }

  test("cohensKappa: perfect=1, constant-rater chance agreement=0, degenerate NULL") {
    val perfect = Seq(("A","A"),("B","B")).toDF("a", "b")
    val r1 = operators.Eval.cohensKappa(perfect, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(r1._4.contains(1.0), s"got $r1")

    // rater a is constant: any agreement is pure chance -> kappa 0
    val const = Seq(("A","A"),("A","B")).toDF("a", "b")
    val r2 = operators.Eval.cohensKappa(const, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(r2._4.contains(0.0), s"got $r2")

    // both constant and equal: p_e = 1, kappa undefined -> NULL
    val degen = Seq(("A","A"),("A","A")).toDF("a", "b")
    val r3 = operators.Eval.cohensKappa(degen, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(r3._4.isEmpty, s"got $r3")
  }

  test("cohensKappa: multi-class hand computation survives the decimal(38,0) product path") {
    // 2x2 confusion: AA=20, AB=5, BA=10, BB=15 -> N=50, D=35
    // sab = rA*cA + rB*cB = 25*30 + 25*20 = 1250
    // kappa = (35*50 - 1250) / (50*50 - 1250) = 500/1250 = 0.4
    val rows = Seq.fill(20)(("A","A")) ++ Seq.fill(5)(("A","B")) ++
      Seq.fill(10)(("B","A")) ++ Seq.fill(15)(("B","B"))
    val r = operators.Eval.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(r._1 == 50L && r._2 == 35L, s"got $r")
    assert(r._4.contains(0.4), s"got $r")
  }
}
