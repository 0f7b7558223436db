package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative proportional fitting (raking / RAS balancing) — reweight a
  * dataset so its (row, col) marginal totals match prescribed targets,
  * the classic survey-statistics move applied to training-data curation
  * ("reweight the corpus so the lang × source mix matches the target
  * blend without dropping documents").
  *
  * Each cell (r, c) starts at weight 1; a round rescales every row
  * stratum to its row target, then every column stratum to its column
  * target: w ← w · T_r / Σ_c(w·n), then w ← w · T_c / Σ_r(w·n).
  * Fixed `iters` (the factors converge geometrically when the targets
  * are feasible) so batch runs unroll for the oracle, like
  * Graphs.pageRank.
  *
  * Exactness: the per-stratum weighted masses Σ(w·n) are summed in
  * 1e-9 fixed point (order-independent BIGINT sums — the
  * Drift.chiSquareIndependence pattern), so every scaling factor is a
  * division of cross-engine-identical doubles and the whole iteration
  * is tolerance-free.
  *
  * Scale shape: the corpus collapses to the |rows|×|cols| cell grid in
  * one partial+final aggregate; every subsequent round is two
  * aggregates + two broadcast joins on that tiny grid — iteration cost
  * is independent of corpus size. The returned per-cell weight joins
  * back to the corpus as a broadcast.
  */
object Raking {

  private def fx(c: Column): Column = floor(c * lit(1e9) + lit(0.5)).cast("long")

  private def ladder(keyCol: Column, targets: Map[String, Double]): Column =
    targets.foldLeft(lit(Double.NaN)) { case (els, (k, v)) =>
      when(keyCol === k, lit(v)).otherwise(els)
    }

  /** Rake the (rowCol, colCol) contingency grid of `df` to the given
    * marginal targets (same mass units on both maps — e.g. fractions
    * summing to 1, or absolute document counts). Only levels present
    * in BOTH target maps participate. Returns one row per cell:
    * (rowCol, colCol, n, weight, mass = weight·n). */
  def rake(df: DataFrame, rowCol: String, colCol: String,
           rowTargets: Map[String, Double], colTargets: Map[String, Double],
           iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(rowTargets.nonEmpty && colTargets.nonEmpty, "targets must be non-empty")
    var cells = df
      .filter(col(rowCol).isin(rowTargets.keys.toSeq: _*) &&
        col(colCol).isin(colTargets.keys.toSeq: _*))
      .groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", lit(1.0))
    for (_ <- 0 until iters) {
      val rowMass = cells.groupBy(col("r"))
        .agg((sum(fx(col("w") * col("n"))).cast("double") / lit(1e9)).as("__rm"))
      cells = cells.join(broadcast(rowMass), "r")
        .withColumn("w", col("w") * ladder(col("r"), rowTargets) / col("__rm"))
        .drop("__rm")
      val colMass = cells.groupBy(col("c"))
        .agg((sum(fx(col("w") * col("n"))).cast("double") / lit(1e9)).as("__cm"))
      cells = cells.join(broadcast(colMass), "c")
        .withColumn("w", col("w") * ladder(col("c"), colTargets) / col("__cm"))
        .drop("__cm")
    }
    cells.select(col("r").as(rowCol), col("c").as(colCol), col("n"),
      col("w").as("weight"), (col("w") * col("n")).as("mass"))
  }
}
