package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seasonal-baseline anomaly detection: learn a per-(key, season)
  * mean/σ baseline from the feed itself, then flag rows whose z-score
  * exceeds `sigma` — the batch analog of the reference's rule-baseline
  * pattern (per-grain historical quantiles driving anomaly decisions,
  * rt_rule_quantile_baselines_sql.py) with moments instead of
  * quantiles so the baseline is a single exact aggregation.
  *
  * Exactness: the metric is 2-decimal, so baseline sums run on
  * fixed-point cents (BIGINT — exact under any row order/partitioning)
  * and every derived double (mean, σ, z) is a fixed-order expression
  * over those exact sums: bit-identical on any engine, which is what
  * lets a threshold filter `|z| ≥ sigma` hash-gate without tolerance.
  *
  * 100 TB shape: one groupBy (shuffle on (key, season) — tiny result:
  * keys × 24) and one join of the feed against that broadcast-size
  * baseline. No window over the full feed, no second full shuffle.
  */
object Anomaly {

  /** Flag rows whose `valueCol` is ≥ `sigma` population standard
    * deviations from their (keyCols, season) baseline. Returns the
    * flagged rows with `season`, `mean`, `sd`, `z` appended. Groups
    * with σ = 0 (constant value) produce no flags. */
  def seasonalZ(events: DataFrame, keyCols: Seq[String], season: Column,
                valueCol: String, sigma: Double): DataFrame = {
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val keyed = events.withColumn("season", season).withColumn("__c", cents)
    val groupCols = keyCols.map(col) :+ col("season")
    val base = keyed
      .groupBy(groupCols: _*)
      .agg(sum(col("__c")).as("__s1"),
        sum(col("__c") * col("__c")).as("__s2"),
        count(lit(1)).as("__n"))
      .withColumn("mean", (col("__s1").cast("double") / lit(100)) / col("__n"))
      .withColumn("sd", sqrt(((col("__s2").cast("double") / lit(10000)) / col("__n"))
        - col("mean") * col("mean")))
      .filter(col("sd") > 0)
      .select((keyCols.map(col) :+ col("season") :+ col("mean") :+ col("sd")): _*)
    keyed.drop("__c")
      .join(base, keyCols :+ "season")
      .withColumn("z", (col(valueCol) - col("mean")) / col("sd"))
      .filter(abs(col("z")) >= sigma)
  }

  /** CUSUM change-point detection over an ordered series — the
    * monitoring gate that catches a sustained small SHIFT the
    * seasonal-z per-point test misses (z flags spikes; CUSUM
    * accumulates drift). The textbook recursion
    *
    *   C⁺_t = max(0, C⁺_{t−1} + (x_t − target − slack))
    *
    * is not a window aggregate, but its closed form is: with
    * S_t = Σ_{j≤t}(x_j − target − slack), C⁺_t = S_t − min(0, min_{j≤t} S_j)
    * — two plain cumulative windows. Same trick mirrored for C⁻. A row
    * alarms when either side crosses `h`.
    *
    * Determinism: engines may evaluate window cumulatives with
    * different association (running scan vs segment tree), so for a
    * cross-engine-exact ledger feed values whose deviations are exact
    * binary fractions — integer counts with half-integer
    * target/slack make every running sum a multiple of 0.5, bit-exact
    * under ANY summation order (the q_cusum recipe). Arbitrary
    * doubles work fine for a single engine; round the output then.
    *
    * Scale contract: `series` is an ALREADY-AGGREGATED frame (e.g.
    * per-minute counts — thousands of rows at any corpus size); the
    * unpartitioned windows run on that frame, never on raw events.
    * `target` is typically the in-control mean, `slack` the half-shift
    * you want to detect, `h` the decision interval (4-5 σ). */
  /** HBOS — histogram-based outlier score (Goldstein & Dengel 2012),
    * the linear-time unsupervised outlier detector: per feature, the
    * event's bin density d_f; score = Σ_f −ln(d_f) — rare feature
    * combinations score high. Emitted as the aggregated SCORING TABLE
    * (one row per realized bin combination with its event count and
    * score), not per-event ranks: the combo frame is deterministic and
    * tiny, while a per-event top-k would tie-break on ulp-level score
    * differences across engines.
    *
    * Features here: the fixed-width value band (`bandWidth` in value
    * units over exact cents), hour-of-day, and the categorical
    * `typeCol`. Densities are exact integer ratios; the ln calls are
    * per-DISTINCT-bin, not per row.
    *
    * Scale shape: three tiny marginal aggregates + one combo
    * aggregate, broadcast-joined — the corpus is scanned once. */
  def hbos(events: DataFrame, tsCol: String, valueCol: String, typeCol: String,
           bandWidth: Double = 50.0): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val banded = events.select(
      floor(cents / lit((bandWidth * 100).toLong)).cast("long").as("value_band"),
      hour(col(tsCol)).as("hr"),
      col(typeCol).as("etype"))
    val n = banded.agg(count(lit(1)).as("__n"))
    def marginal(c: String) = banded.groupBy(col(c))
      .agg(count(lit(1)).as(s"__n_$c"))
    val combos = banded.groupBy(col("value_band"), col("hr"), col("etype"))
      .agg(count(lit(1)).as("n_events"))
      .join(broadcast(marginal("value_band")), "value_band")
      .join(broadcast(marginal("hr")), "hr")
      .join(broadcast(marginal("etype")), "etype")
      .crossJoin(broadcast(n))
    val dens = (c: String) =>
      col(s"__n_$c").cast("double") / col("__n")
    combos.withColumn("score",
        -log(dens("value_band")) - log(dens("hr")) - log(dens("etype")))
      .select(col("value_band"), col("hr"), col("etype"), col("n_events"),
        col("score"))
  }

  def cusum(series: DataFrame, orderCol: String, valueCol: String,
            target: Double, slack: Double, h: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(h > 0, s"decision interval h must be positive, got $h")
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    series
      .withColumn("__dp", col(valueCol) - lit(target) - lit(slack))
      .withColumn("__dn", col(valueCol) - lit(target) + lit(slack))
      .withColumn("__sp", sum(col("__dp")).over(w))
      .withColumn("__sn", sum(col("__dn")).over(w))
      .withColumn("cusum_pos", col("__sp") - least(min(col("__sp")).over(w), lit(0.0)))
      .withColumn("cusum_neg", greatest(max(col("__sn")).over(w), lit(0.0)) - col("__sn"))
      .withColumn("alarm", col("cusum_pos") > h || col("cusum_neg") > h)
      .drop("__dp", "__dn", "__sp", "__sn")
  }
}
