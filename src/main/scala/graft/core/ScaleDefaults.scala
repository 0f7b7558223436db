package graft.core

import org.apache.spark.sql.SparkSession

/** The single source of the engine's scale-oriented session settings —
  * what a 1000-executor deployment submits as `--conf`, applied
  * identically by the local mains (Verify/Bench) so the tested plans
  * are the production plans.
  *
  * Why each one:
  *  - AQE on, with skew-join splitting and partition coalescing: the
  *    runtime re-plan that absorbs the skew/misestimation a 100 TB
  *    input always carries (the salting operators in operators/Skew
  *    cover only the shapes AQE can't split).
  *  - Runtime bloom-filter join pruning: a selective dimension-side
  *    predicate builds a bloom filter that prunes the fact side at the
  *    scan — the biggest single lever on fact⋈fact joins whose join
  *    input Spark cannot broadcast (PlanQualitySpec asserts injection).
  *  - maxPartitionBytes 256m: fewer, fuller input splits — at 100 TB
  *    the default 128m doubles task count for scan-bound stages.
  *  - shuffle partitions from the caller: local[N] wants N, a cluster
  *    wants ~2-3x total cores; there is no one right constant, so it
  *    stays a parameter (AQE coalescing trims the excess at runtime).
  */
object ScaleDefaults {
  def configs(shufflePartitions: String): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> shufflePartitions,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // parallelismFirst stays at its default (true): the tuning-guide
    // suggestion of false (coalesce to the advisory byte size) was
    // MEASURED here and rejected — byte-sized coalescing collapses
    // compute-dense stages whose rows are small but expensive (the
    // per-pair array-intersection stage of containmentPairs doubled,
    // 7.2 s → 14.2 s at sf0.1; label propagation and k-core regressed
    // ~20%). Bytes are the wrong proxy for CPU-bound shuffle stages.
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> "256m",
    "spark.sql.session.timeZone" -> "UTC")

  /** Apply to a builder (local mains and tests). */
  def apply(b: SparkSession.Builder, shufflePartitions: String): SparkSession.Builder =
    configs(shufflePartitions).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
