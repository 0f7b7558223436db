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
}
