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
  def ksTwoSample(df: DataFrame, valueCol: String, groupCol: String,
                  a: String, b: String, bucketCents: Long = 2048L): DataFrame = {
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
    val gaps = ecdf.crossJoin(broadcast(totals))
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
}
