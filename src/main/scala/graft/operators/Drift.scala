package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distribution-drift detection between two samples — the
  * training-data monitoring gate ("did this batch's feature
  * distribution move?"). The statistic is two-sample
  * Kolmogorov-Smirnov: KS = max over v of |F_a(v) − F_b(v)|, which is
  * log-free (unlike PSI/KL) — ECDF values are ratios of exact integer
  * counts, their difference and the max are order-independent, so the
  * whole statistic is bit-identical on any engine with NO tolerance.
  *
  * Scale design — the interesting part is the distributed ECDF. A
  * naive cumulative sum is a single unpartitioned window (one reducer
  * sorts every distinct value). Here the prefix sum is TWO-LEVEL:
  * fixed-width value buckets give per-bucket partial counts; a window
  * over the tiny bucket-totals frame (≤ thousands of rows at any data
  * scale) computes bucket offsets; a within-bucket window (partitioned
  * by bucket — parallel) adds local prefixes. Exactly the
  * scan-then-propagate parallel prefix-sum, expressed declaratively.
  */
object Drift {

  /** Two-sample KS over `valueCol` (2-decimal metric; exact cents
    * internally) between rows where `groupCol` = a and = b. Returns a
    * 1-row frame: n_a, n_b, ks_stat, ks_at (the smallest value
    * attaining the max gap). `bucketCents` is the fixed bucket width
    * of the two-level prefix sum (scale knob only — any value yields
    * identical results). */
  /** Shared two-level distributed ECDF over cent-scaled values: one
    * row per distinct cent value c with per-group counts (ca, cb),
    * inclusive cumulatives (cuma, cumb), and the group totals
    * (n_a, n_b) attached — the frame KS, Wasserstein-1, and PSI all
    * read. ≤ |distinct cents| rows at any corpus size. */
  private def ecdfCents(df: DataFrame, valueCol: String, groupCol: String,
                        a: String, b: String, bucketCents: Long): DataFrame = {
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val tagged = df
      .filter(col(groupCol).isin(a, b))
      .select(cents.as("c"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
    // per distinct value: group counts, keyed into fixed-width buckets
    val perValue = tagged.groupBy(col("c"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
      .withColumn("bkt", floor(col("c") / lit(bucketCents)).cast("long"))
    // level 1: bucket totals + exclusive running offsets (tiny frame)
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perValue.groupBy(col("bkt"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      .withColumn("offa", coalesce(sum(col("ta")).over(wBkt), lit(0L)))
      .withColumn("offb", coalesce(sum(col("tb")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("offa"), col("offb"))
    // level 2: local prefix within each bucket (parallel) + offset
    val wLoc = Window.partitionBy(col("bkt")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ecdf = perValue.join(broadcast(offsets), "bkt")
      .withColumn("cuma", col("offa") + sum(col("ca")).over(wLoc))
      .withColumn("cumb", col("offb") + sum(col("cb")).over(wLoc))
    val totals = tagged.agg(sum(col("ia")).as("n_a"), sum(col("ib")).as("n_b"))
    ecdf.crossJoin(broadcast(totals))
  }

  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
                  a: String, b: String, bucketCents: Long = 2048L): DataFrame = {
    val gaps = ecdfCents(df, valueCol, groupCol, a, b, bucketCents)
      .withColumn("gap", abs(col("cuma").cast("double") / col("n_a")
        - col("cumb").cast("double") / col("n_b")))
    // ks_at = smallest value attaining the max gap (gap doubles are
    // exact, so the equality filter is deterministic cross-engine)
    val wAll = Window.partitionBy()
    gaps.withColumn("mx", max(col("gap")).over(wAll))
      .filter(col("gap") === col("mx"))
      .groupBy(col("n_a"), col("n_b"), col("mx"))
      .agg((min(col("c")).cast("double") / 100).as("ks_at"))
      .select(col("n_a"), col("n_b"), col("mx").as("ks_stat"), col("ks_at"))
  }

  /** Wasserstein-1 (earth-mover) distance between the two samples'
    * value distributions — drift in the METRIC'S OWN UNITS ("the
    * purchase-value distribution moved by $0.42 of mass-transport"),
    * where KS only reports the worst single-point CDF gap. Computed as
    * the exact ECDF-area integral: between consecutive distinct cent
    * values both ECDFs are constant, so
    * W1 = Σ |F_a(c) − F_b(c)| · (next(c) − c) / 100.
    *
    * Exactness: ECDF values are ratios of exact integer counts, gap
    * widths are integer cents; per-interval areas are rounded to 1e-9
    * fixed point and summed as BIGINTs. The `lead` window runs on the
    * ≤ |distinct cents| ECDF frame, never on corpus rows. */
  def wasserstein1(df: DataFrame, valueCol: String, groupCol: String,
                   a: String, b: String, bucketCents: Long = 2048L): DataFrame = {
    val fx = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val wAll = Window.orderBy(col("c"))
    ecdfCents(df, valueCol, groupCol, a, b, bucketCents)
      .withColumn("__next", lead(col("c"), 1).over(wAll))
      .withColumn("__gap", abs(col("cuma").cast("double") / col("n_a")
        - col("cumb").cast("double") / col("n_b")))
      .withColumn("__area", when(col("__next").isNotNull,
        col("__gap") * ((col("__next") - col("c")).cast("double") / 100)).otherwise(lit(0.0)))
      .groupBy(col("n_a"), col("n_b"))
      .agg((sum(fx(col("__area"))).cast("double") / lit(1e9)).as("w1"))
  }

  /** Population stability index between the two samples — the
    * industry-standard "has the score distribution shifted?" gate:
    * bins are slice A's deciles (realized on the discrete value grid:
    * a value's bin is ⌊F_a(c⁻)·B⌋+1 over A's LEFT-limit CDF, capped at
    * B — ties that swallow a decile leave that bin unrealized), and
    *
    *   PSI = Σ_k (p_a,k − p_b,k) · ln(p_a,k / p_b,k)
    *
    * with add-half smoothing (count + 0.5) / (n + B/2) so an empty
    * side keeps a finite log. PSI < 0.1 is conventionally stable,
    * > 0.25 action-worthy. Per-bin contributions are 1e-9 fixed-point
    * summed; the `ln` calls are B per result, not per row.
    *
    * Scale shape: everything downstream of the shared ECDF frame —
    * one keyed aggregate to B rows, one 1-row reduce. */
  def psi(df: DataFrame, valueCol: String, groupCol: String,
          a: String, b: String, bins: Int = 10,
          bucketCents: Long = 2048L): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val fx = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val binned = ecdfCents(df, valueCol, groupCol, a, b, bucketCents)
      .withColumn("bin", least(
        floor(((col("cuma") - col("ca")).cast("double") / col("n_a")) * bins) + 1,
        lit(bins)).cast("int"))
    val per = binned.groupBy(col("bin"), col("n_a"), col("n_b"))
      .agg(sum(col("ca")).as("ca_bin"), sum(col("cb")).as("cb_bin"))
      .withColumn("pa", (col("ca_bin").cast("double") + 0.5)
        / (col("n_a").cast("double") + lit(bins / 2.0)))
      .withColumn("pb", (col("cb_bin").cast("double") + 0.5)
        / (col("n_b").cast("double") + lit(bins / 2.0)))
      .withColumn("contrib", (col("pa") - col("pb")) * log(col("pa") / col("pb")))
    val total = per.agg(
      (sum(fx(col("contrib"))).cast("double") / lit(1e9)).as("psi"))
    per.crossJoin(broadcast(total))
      .select(col("bin"), col("ca_bin"), col("cb_bin"),
        col("pa"), col("pb"), col("contrib"), col("psi"))
  }

  /** Chi-square test of independence between two categorical columns —
    * the "did the label mix shift across sources?" gate. Returns one
    * row: n, r_levels, c_levels, dof, chi2. The p-value needs the
    * incomplete gamma function (libm, not cross-engine exact) — look
    * it up downstream against dof; chi2 itself is reported exactly.
    *
    * Textbook-correct on the FULL r×c grid: absent (zero-observed)
    * cells still contribute their expected mass, so the grid is the
    * cross join of the level frames (tiny: r·c rows) left-joined to
    * observed counts. Per-cell terms are rounded to 1e-9 fixed point
    * and summed as BIGINTs — exact under any partitioning, which is
    * what makes a float test statistic hash-gateable at all. */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val colTot = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val grid = rowTot.crossJoin(colTot)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("obs", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("e", (col("ra") * col("cb")).cast("double") / col("n"))
      .withColumn("term",
        ((col("obs").cast("double") - col("e")) * (col("obs").cast("double") - col("e"))) / col("e"))
      .withColumn("fx", floor(col("term") * lit(1e9) + lit(0.5)).cast("long"))
    grid.groupBy(col("n"))
      .agg(
        countDistinct(col("a")).as("r_levels"),
        countDistinct(col("b")).as("c_levels"),
        sum(col("fx")).as("__s"))
      .select(col("n"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("dof"),
        (col("__s").cast("double") / lit(1e9)).as("chi2"))
  }

  /** Token-distribution divergence between two corpus slices — the
    * corpus-mix monitoring gate ("how far has slice B's language
    * drifted from slice A's?"). Returns ONE row: token totals, vocab
    * sizes (per-slice + union), KL(A‖B), KL(B‖A) and the bounded
    * symmetric Jensen-Shannon divergence, all in nats over
    * Laplace-smoothed unigram distributions (+1 over the UNION vocab,
    * so zero-count terms are well-defined on both sides and the KLs
    * are finite by construction).
    *
    * Exactness: smoothed probabilities are single IEEE divisions of
    * exact integer counts (identical cross-engine); each term's
    * contribution is one `ln` of such a ratio, then rounded to 1e-9
    * fixed point and summed as BIGINTs — order-independent under any
    * partitioning (the [[chiSquareIndependence]] pattern). The one
    * libm call per term (`ln`) is shared with the lm_xent family.
    *
    * Scale shape: explode → per-term hash aggregate (map-side
    * combine) per slice, one full-outer equi-join on the term, a
    * broadcast 1-row totals frame, and a final 1-row aggregate — no
    * window, no sort, shuffle keys are the term hash. */
  def tokenJsDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame =
    tokenJsDivergenceFromCounts(
      a.select(explode(graft.functions.TextAnalysis.tokens(textCol)).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("ca")),
      b, textCol)

  /** [[tokenJsDivergence]] with side A's (term, ca) counts precomputed —
    * the streaming-monitor entry point (DriftMonitor computes the
    * baseline counts once and scores every micro-batch against the
    * cached frame). */
  def tokenJsDivergenceFromCounts(aCounts: DataFrame, b: DataFrame,
                                  textCol: String): DataFrame = {
    val fx = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    def termCounts(df: DataFrame, out: String) = df
      .select(explode(graft.functions.TextAnalysis.tokens(textCol)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as(out))
    val joined = aCounts.join(termCounts(b, "cb"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("ca"), lit(0L)).as("ca"), coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(
      sum(col("ca")).as("n_tok_a"), sum(col("cb")).as("n_tok_b"),
      count(lit(1)).as("vocab_union"),
      sum((col("ca") > 0).cast("long")).as("vocab_a"),
      sum((col("cb") > 0).cast("long")).as("vocab_b"))
    joined.crossJoin(broadcast(tot))
      .withColumn("p", (col("ca") + 1).cast("double") /
        (col("n_tok_a") + col("vocab_union")).cast("double"))
      .withColumn("q", (col("cb") + 1).cast("double") /
        (col("n_tok_b") + col("vocab_union")).cast("double"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .groupBy(col("n_tok_a"), col("n_tok_b"),
        col("vocab_union"), col("vocab_a"), col("vocab_b"))
      .agg(
        sum(fx(col("p") * log(col("p") / col("q")))).as("__kab"),
        sum(fx(col("q") * log(col("q") / col("p")))).as("__kba"),
        sum(fx(lit(0.5) * (col("p") * log(col("p") / col("m"))
          + col("q") * log(col("q") / col("m"))))).as("__js"))
      .select(col("n_tok_a"), col("n_tok_b"),
        col("vocab_union"), col("vocab_a"), col("vocab_b"),
        (col("__kab").cast("double") / lit(1e9)).as("kl_ab"),
        (col("__kba").cast("double") / lit(1e9)).as("kl_ba"),
        (col("__js").cast("double") / lit(1e9)).as("jsd"))
  }
}
