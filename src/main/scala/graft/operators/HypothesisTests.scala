package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-sample hypothesis tests — the A/B-experimentation readout the
  * serving stack's drift gates (KS / PSI / W1) stop short of: those
  * measure HOW FAR two slices diverge, these answer IS THE DIFFERENCE
  * REAL given the sample sizes.
  *
  *  - [[welchPairs]]: Welch's unequal-variance t-test on the mean, for
  *    every unordered pair of groups — the default parametric test
  *    (never assumes equal variances, so it is safe under the unequal
  *    traffic splits real experiments have).
  *  - [[mannWhitney]]: Mann–Whitney U (Wilcoxon rank-sum) with the tie
  *    correction — the rank-based twin that survives outliers and any
  *    monotone transform, sharing q_spearman's average-tie ranks.
  *
  * Determinism contract (the repo-wide q_moments pattern): inputs are
  * 2-decimal, so all sums run in exact cent-scaled LONG arithmetic;
  * the handful of closing double ops (mean, variance, t, z) are
  * written in the same order on both engines, so results are
  * bit-identical and 6-decimal rounding can never straddle.
  *
  * Scale shape: one scan + one map-side-combinable aggregate each.
  * welchPairs keeps G rows (one per group) and broadcast-NL-joins the
  * G·(G−1)/2 pairs — G is a handful of experiment arms, never data.
  * mannWhitney ranks via the two-level bucketed prefix sum (same as
  * RankStats.spearman / Drift.ecdfCents): per-distinct-cent counts →
  * tiny bucket-offset frame → within-bucket prefix — no global row
  * sort at any step, and the rank-sum Σ ct_a·(2·below+ct+1) stays in
  * exact longs (twice the tie-averaged rank is an integer).
  */
object HypothesisTests {

  private val Z95 = 1.96 // two-sided 5% normal critical value

  /** Welch's t-test for every unordered pair of groups in `groupCol`
    * over 2-decimal `valueCol`. Returns one row per pair (grp_a <
    * grp_b): sizes, mean difference (value units), t statistic,
    * Welch–Satterthwaite degrees of freedom, and the two-sided 5%
    * verdict (normal approximation — exact at these n; the t vs z gap
    * is < 1e-3 beyond df ≈ 1000 and both engines apply the identical
    * cut, so the boolean can only flip if |t| sits within float-ulp of
    * 1.96, which 6-decimal-stable inputs cannot produce). */
  def welchPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val c = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val stats = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(c).as("s1"), sum(c * c).as("s2"))
      .withColumn("mean_c", col("s1").cast("double") / col("n"))
      .withColumn("ex2", col("s2").cast("double") / col("n"))
      // population → sample variance in one mirrored op chain
      .withColumn("var_c",
        (col("ex2") - col("mean_c") * col("mean_c")) * col("n") / (col("n") - lit(1.0)))
      .select(col("g"), col("n"), col("mean_c"), (col("var_c") / col("n")).as("q"))
    val a = stats.select(col("g").as("grp_a"), col("n").as("n_a"),
      col("mean_c").as("ma"), col("q").as("qa"))
    val b = stats.select(col("g").as("grp_b"), col("n").as("n_b"),
      col("mean_c").as("mb"), col("q").as("qb"))
    val tStat = (col("ma") - col("mb")) / sqrt(col("qa") + col("qb"))
    a.join(broadcast(b), col("grp_a") < col("grp_b")) // G-row NL join, never data-scale
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        ((col("ma") - col("mb")) / lit(100.0)).as("mean_diff"),
        tStat.as("t_stat"),
        ((col("qa") + col("qb")) * (col("qa") + col("qb")) /
          (col("qa") * col("qa") / (col("n_a") - lit(1.0)) +
           col("qb") * col("qb") / (col("n_b") - lit(1.0)))).as("df_welch"),
        (abs(tStat) > lit(Z95)).as("significant_05"))
  }

  /** Mann–Whitney U between groups `a` and `b` of `groupCol` over
    * 2-decimal `valueCol`, tie-corrected normal approximation.
    * Returns 1 row: n_a, n_b, u_stat (U of group a, exact
    * half-integer), z, significant_05. */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
                  a: String, b: String, bucketCents: Long = 2048L): DataFrame = {
    val perValue = df
      .filter(col(groupCol).isin(a, b))
      .select(floor(col(valueCol) * lit(100) + lit(0.5)).cast("long").as("c"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("is_a"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("ct"), sum(col("is_a")).as("ct_a"))
      .withColumn("bkt", floor(col("c") / lit(bucketCents)).cast("long"))
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perValue.groupBy(col("bkt"))
      .agg(sum(col("ct")).as("t"))
      .withColumn("off", coalesce(sum(col("t")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("off"))
    val wLoc = Window.partitionBy(col("bkt")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = perValue.join(broadcast(offsets), "bkt")
      .withColumn("below", col("off") + coalesce(sum(col("ct")).over(wLoc), lit(0L)))
      .agg(
        sum(col("ct_a")).as("n_a"),
        sum(col("ct")).as("n"),
        // 2·Σ ct_a·rank_avg — exact in longs (rank_avg is a half-integer)
        sum(col("ct_a") * (lit(2L) * col("below") + col("ct") + lit(1L))).as("r2_a"),
        sum(col("ct") * col("ct") * col("ct") - col("ct")).as("ties"))
      .withColumn("n_b", col("n") - col("n_a"))
    val u = (col("r2_a") - col("n_a") * (col("n_a") + lit(1L))).cast("double") / lit(2.0)
    val mu = (col("n_a") * col("n_b")) / lit(2.0)
    val varU = (col("n_a") * col("n_b")).cast("double") / lit(12.0) *
      ((col("n") + lit(1.0)) -
        col("ties").cast("double") / (col("n").cast("double") * (col("n") - lit(1.0))))
    val z = (u - mu) / sqrt(varU)
    agg.select(col("n_a"), col("n_b"), u.as("u_stat"), z.as("z"),
      (abs(z) > lit(Z95)).as("significant_05"))
  }
}
