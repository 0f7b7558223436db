package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rank-based and concentration statistics — the monotone-robust
  * complements to the Pearson/moment battery (q_corr): Spearman's ρ
  * for association that survives any monotone transform and outliers,
  * Gini for "how concentrated is this corpus on few heavy items",
  * Theil's T for a decomposable entropy view of the same question.
  *
  * Scale design: ranks are where naive implementations die — a global
  * `rank()` window is a single-reducer sort of the whole corpus. Here
  * average ranks come from the same two-level distributed prefix sum
  * as Drift's ECDF (per-distinct-value counts → tiny bucket-offset
  * frame → parallel within-bucket prefix), then rows pick up their
  * rank via an equi-join on the value — no global row sort at any
  * step. Gini is per-GROUP (windows partition by the group key, so
  * sorts are group-bounded and parallel); Theil needs no ranks at all
  * (one pass of map-side-combinable aggregates).
  */
object RankStats {

  /** Average fractional ranks (ties → mean of tied positions) for the
    * cent-scaled value in `valueCol`: returns (c, rank_avg) with one
    * row per DISTINCT cent value. rank_avg = (#values below) +
    * (tie_count + 1)/2 — an exact multiple of 0.5, bit-stable on any
    * engine. Two-level prefix sum, same shape as Drift.ecdfCents. */
  private def avgRanks(df: DataFrame, valueCol: String,
                       bucketCents: Long): DataFrame = {
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val perValue = df.select(cents.as("c")).groupBy(col("c"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("bkt", floor(col("c") / lit(bucketCents)).cast("long"))
    val wBkt = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perValue.groupBy(col("bkt"))
      .agg(sum(col("ct")).as("t"))
      .withColumn("off", coalesce(sum(col("t")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("off"))
    val wLoc = Window.partitionBy(col("bkt")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perValue.join(broadcast(offsets), "bkt")
      .withColumn("below", col("off") + coalesce(sum(col("ct")).over(wLoc), lit(0L)))
      .select(col("c"),
        (col("below").cast("double") + (col("ct").cast("double") + lit(1.0)) / 2)
          .as("rank_avg"))
  }

  /** Spearman rank correlation between two 2-decimal numeric columns:
    * Pearson correlation of the average-tie ranks. Returns a 1-row
    * frame (n, rho). Ranks are exact half-integers (see [[avgRanks]]);
    * only the final corr is summation-order sensitive — round it at
    * the consumer (the oracle battery uses 6 decimals, same as
    * q_corr). Shape: two rank maps (distinct values each), two
    * equi-joins keyed on the value to attach ranks to rows, one corr
    * aggregate — no global row-level sort or window anywhere. */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               bucketCents: Long = 2048L): DataFrame = {
    val rows = df.select(
      floor(col(xCol) * lit(100) + lit(0.5)).cast("long").as("cx"),
      floor(col(yCol) * lit(100) + lit(0.5)).cast("long").as("cy"))
    val rx = avgRanks(df, xCol, bucketCents)
      .select(col("c").as("cx"), col("rank_avg").as("rank_x"))
    val ry = avgRanks(df, yCol, bucketCents)
      .select(col("c").as("cy"), col("rank_avg").as("rank_y"))
    rows.join(rx, "cx").join(ry, "cy")
      .agg(count(lit(1)).as("n"), corr(col("rank_x"), col("rank_y")).as("rho"))
  }

  /** Per-group Gini coefficient of `valueCol` (non-negative weights —
    * e.g. doc sizes, token counts): 0 = perfectly even, →1 = all mass
    * on one item. G = (2·Σ rᵢxᵢ)/(n·Σx) − (n+1)/n with x ascending and
    * r = 1..n; equal values share a consecutive rank block, and the
    * block's Σ rᵢxᵢ is permutation-invariant, so the id tie-break only
    * fixes determinism, never the value. Both Σ rᵢxᵢ and Σx stay in
    * exact LONG arithmetic for integer-valued inputs — the single
    * division at the end is the only float op.
    *
    * Scale: windows partition by the GROUP key — each group sorts
    * independently in parallel (a group is one source/shard, bounded);
    * there is no corpus-wide ordering. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("x"), col(idCol))
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("long").as("x"), col(idCol))
      .withColumn("r", row_number().over(w))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"),
        sum(col("r") * col("x")).as("rx"))
      .withColumn("gini",
        lit(2.0) * col("rx").cast("double")
          / (col("n").cast("double") * col("total").cast("double"))
          - (col("n").cast("double") + 1.0) / col("n").cast("double"))
      .select(col(groupCol), col("n"), col("total"), col("gini"))
  }

  /** Theil T index of `valueCol` overall plus its between/within-group
    * decomposition over `groupCol` — the property Gini lacks:
    * T = T_between + Σ sₖ·T_within(k), so "is the skew across sources
    * or inside them" is answerable from one frame. Returns one row per
    * group (share sₖ = group mass / total, t_within) plus the overall
    * scalars repeated: t_total, t_between. Pure aggregation — two
    * keyed passes and a broadcast totals frame; no sort, no window,
    * no rank. ln() ULP drift across engines is below 1e-12 relative;
    * consumers round at 6 decimals. */
  def theilByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    // per-group: count, mass, and Σ x·ln(x) (exact inputs, one pass)
    val grp = df.filter(x > 0)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_k"), sum(x).as("mass_k"),
        sum(x * log(x)).as("xlnx_k"))
    val tot = grp.agg(sum(col("n_k")).as("n"), sum(col("mass_k")).as("mass"),
      sum(col("xlnx_k")).as("xlnx"))
    val j = grp.crossJoin(broadcast(tot))
    val mu = col("mass") / col("n")
    val muK = col("mass_k") / col("n_k")
    // T_total = (1/n)Σ(x/μ)ln(x/μ) = [Σx·ln(x)/mass] − ln(μ) scaled:
    //   (1/(n·μ))·Σ x·ln(x) − ln(μ)  with μ = mass/n
    j.withColumn("share", col("mass_k") / col("mass"))
      .withColumn("t_within",
        col("xlnx_k") / col("mass_k") - log(muK))
      .withColumn("t_total", col("xlnx") / col("mass") - log(mu))
      .withColumn("t_between_k", col("share") * log(muK / mu))
      .select(col(groupCol), col("n_k"), col("mass_k"), col("share"),
        col("t_within"), col("t_total"), col("t_between_k"))
  }
}
