package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometric median of a vector corpus by fixed-round Weiszfeld
  * iteration — the robust centroid ("what does this cluster look
  * like, ignoring the outliers?"): unlike the mean, a single
  * corrupted embedding moves the geometric median only O(1/n). Each
  * round reweights every point by 1/distance-to-estimate and takes
  * the weighted mean:
  *
  *   y ← Σ x_i/‖x_i − y‖ / Σ 1/‖x_i − y‖
  *
  * seeded from the per-dimension mean (deterministic — no random
  * init). Points inside `eps` of the estimate drop out of the round
  * (the standard Weiszfeld singularity guard).
  *
  * Exactness: distances are IEEE sqrt over 1e-12 fixed-point squared
  * sums; the weight and weighted-coordinate sums use 1e-6 fixed point
  * (weights are O(1/dist) — the coarser scale keeps n·w·1e6 far from
  * int64 while the quantization is identical cross-engine); every
  * division is over identical doubles. The oracle unrolls the rounds
  * (the Pca.powerIteration recipe).
  *
  * Scale shape: one n×d explode cut to a checkpoint leaf, then per
  * round one broadcast join on the d-row estimate, one per-row-id
  * aggregate (distances), one per-dimension aggregate (the update) —
  * O(d) state, no collect. */
object GeoMedian {

  private def fx12(c: Column): Column = floor(c * lit(1e12) + lit(0.5)).cast("long")
  private def fx6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)).cast("long")

  /** Returns the d-row frame (pos, mean, median) — the L2 centroid and
    * the Weiszfeld estimate side by side (their gap IS the outlier
    * signal). */
  def geometricMedian(corpus: DataFrame, idCol: String, vecCol: String,
                      iters: Int = 2, eps: Double = 1e-6): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val ex = graft.core.Lineage.truncate(corpus.select(col(idCol).as("__id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x"))))
    val mean = ex.groupBy(col("pos"))
      .agg(((sum(fx12(col("x"))).cast("double") / lit(1e12)) / count(lit(1))).as("mean"))
    var y = mean.select(col("pos"), col("mean").as("y"))
    for (_ <- 0 until iters) {
      val weights = ex.join(broadcast(y), "pos")
        .groupBy(col("__id"))
        .agg(sqrt(sum(fx12((col("x") - col("y")) * (col("x") - col("y"))))
          .cast("double") / lit(1e12)).as("__dist"))
        .filter(col("__dist") > eps)
        .withColumn("__w", lit(1.0) / col("__dist"))
      val wsum = weights.agg(
        (sum(fx6(col("__w"))).cast("double") / lit(1e6)).as("__ws"))
      y = ex.join(weights.select(col("__id"), col("__w")), "__id")
        .groupBy(col("pos"))
        .agg((sum(fx6(col("x") * col("__w"))).cast("double") / lit(1e6)).as("__sxw"))
        .crossJoin(broadcast(wsum))
        .select(col("pos"), (col("__sxw") / col("__ws")).as("y"))
    }
    mean.join(y, "pos").select(col("pos"), col("mean"), col("y").as("median"))
  }
}
