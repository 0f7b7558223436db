package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA by fixed-round power iteration — the dominant
  * principal direction of a vector corpus (embedding-space
  * diagnostics: "is one axis eating the variance?", anisotropy
  * checks, whitening decisions), computed without any driver-side
  * linear algebra.
  *
  * Per round, with the centered exploded corpus xc and the current
  * unit direction v: s_i = xc_i·v (per-row projection), u = (1/n)·Σ_i
  * s_i·xc_i = Cv (the covariance matrix-vector product as one keyed
  * aggregate — normalized by n immediately so u stays
  * eigenvalue-sized and its fixed-point square can't overflow),
  * v ← u/‖u‖. The eigenvalue estimate is the standard power-iteration
  * one, λ = ‖Cv‖ (v entering the round is unit), and
  * var_frac = λ / tr(C) = ‖Cv‖ / (Σ‖xc‖²/n) is the top component's
  * share of total variance. Starting from the all-positive 1/√d
  * vector makes the sign convention deterministic (no random init —
  * reproducible on any engine/partitioning).
  *
  * Exactness: every cross-row sum (means, projections, u, norms,
  * total variance) is a 1e-12 fixed-point BIGINT sum — order-
  * independent — and the only libm call is IEEE-exact `sqrt`, so the
  * whole fit is cross-engine bit-identical and the oracle unrolls it
  * round by round (the LogReg.fit recipe applied to linear algebra).
  * Coordinate magnitudes ≤ ~1 and corpora ≤ ~1e6 rows keep scaled
  * sums inside int64; at larger n drop the scale to 1e9 (same int64
  * headroom note as embedDimStats).
  *
  * Scale shape: one n×d explode persisted for the whole fit (the
  * projection and u aggregates both consume it), then per round one
  * broadcast join on the d-row direction, one shuffle each keyed by
  * row id and by dimension, and 1-row/d-row reduces — per-round state
  * is O(d), never a collect. Plan depth grows linearly with rounds;
  * beyond ~10 truncate lineage between rounds (the Graphs loop
  * pattern).
  */
object Pca {

  private def fx(c: Column): Column = floor(c * lit(1e12) + lit(0.5)).cast("long")
  private def unfx(c: Column): Column = c.cast("double") / lit(1e12)

  /** Top principal component of `vecCol` (array column, any numeric
    * element type) after centering. Returns the d-row frame
    * (pos, loading, eigenvalue, var_frac) — eigenvalue and var_frac
    * repeated on every row; materialized, with the corpus-sized
    * intermediate released before returning. */
  def powerIteration(corpus: DataFrame, idCol: String, vecCol: String,
                     iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val ex = corpus.select(col(idCol).as("__id"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "__x")))
    val mu = ex.groupBy(col("pos"))
      .agg(count(lit(1)).as("__n"), unfx(sum(fx(col("__x")))).as("__sx"))
      .select(col("pos"), (col("__sx") / col("__n")).as("__mu"), col("__n"))
    val exc = ex.join(broadcast(mu.select(col("pos"), col("__mu"))), "pos")
      .select(col("__id"), col("pos"), (col("__x") - col("__mu")).as("xc"))
      .persist()
    exc.count() // eager barrier — multi-consumer cache contract
    val dims = mu.agg(count(lit(1)).as("d"), max(col("__n")).as("n"))
    var v = mu.select(col("pos")).crossJoin(broadcast(dims))
      .select(col("pos"), (lit(1.0) / sqrt(col("d").cast("double"))).as("v"))
    var lastNorm: DataFrame = null
    for (_ <- 0 until iters) {
      val s = exc.join(broadcast(v), "pos")
        .groupBy(col("__id")).agg(unfx(sum(fx(col("xc") * col("v")))).as("__s"))
      val u = exc.join(s, "__id")
        .groupBy(col("pos")).agg(unfx(sum(fx(col("xc") * col("__s")))).as("__su"))
        .crossJoin(broadcast(dims))
        .select(col("pos"), (col("__su") / col("n")).as("u"))
      lastNorm = u.agg(sqrt(unfx(sum(fx(col("u") * col("u"))))).as("__nrm"))
      v = u.crossJoin(broadcast(lastNorm))
        .select(col("pos"), (col("u") / col("__nrm")).as("v"))
    }
    val tot = exc.agg(unfx(sum(fx(col("xc") * col("xc")))).as("__tv"))
    val out = v.crossJoin(broadcast(lastNorm))
      .crossJoin(broadcast(dims)).crossJoin(broadcast(tot))
      .select(col("pos"), col("v").as("loading"),
        col("__nrm").as("eigenvalue"),
        (col("__nrm") / (col("__tv") / col("n"))).as("var_frac"))
      .persist()
    out.count()
    exc.unpersist()
    out
  }
}
