package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA by fixed-round power iteration — the dominant
  * principal direction of a vector corpus (embedding-space
  * diagnostics: "is one axis eating the variance?", anisotropy
  * checks, whitening decisions), with only O(d) driver-side state.
  *
  * Per round, with the centered corpus xc and the current unit
  * direction v: s_i = xc_i·v (per-row projection), u = (1/n)·Σ_i
  * s_i·xc_i = Cv (the covariance matrix-vector product), v ← u/‖u‖.
  * The eigenvalue estimate is the standard power-iteration one,
  * λ = ‖Cv‖ (v entering the round is unit), and var_frac = λ / tr(C)
  * = ‖Cv‖ / (Σ‖xc‖²/n) is the top component's share of total
  * variance. Starting from the all-positive 1/√d vector makes the
  * sign convention deterministic (no random init — reproducible on
  * any engine/partitioning).
  *
  * Exactness: every cross-row sum (means, the Cv product, norms,
  * total variance) is a 1e-12 fixed-point BIGINT sum — order-
  * independent — and the only libm call is IEEE-exact `sqrt`, so the
  * whole fit is cross-engine bit-identical and the oracle unrolls it
  * round by round (the LogReg.fit recipe applied to linear algebra).
  * Coordinate magnitudes ≤ ~1 and corpora ≤ ~1e6 rows keep scaled
  * sums inside int64; at larger n drop the scale to 1e9 (same int64
  * headroom note as embedDimStats).
  *
  * Scale shape (the broadcast-ML loop, kMeansFit's stance): NO n×d
  * explode, NO per-row keyed joins — pass 1 is one un-keyed aggregate
  * for the per-dim means (plans.VectorSumAggregate folds each row's
  * d quantized cells into a long vector; map-side combine ships one
  * d-cell array per partition), then each round is ONE corpus pass
  * through plans.PowerStepAggregate (the per-row projection and the
  * Σ s_i·xc_i cells in a single O(d)-per-row update). Driver state is
  * the d-vector between rounds (O(d) doubles, same stance as Align's
  * d² cells — never data-sized); the corpus is re-scanned once per
  * round instead of persisting an n×d explode that is larger than the
  * input. Contract: vectors must share one length (clear error on
  * ragged input); NULL/empty vectors are skipped.
  */
object Pca {

  private def fx(c: Column): Column = floor(c * lit(1e12) + lit(0.5)).cast("long")

  /** Top principal component of `vecCol` (array column, any numeric
    * element type) after centering. Returns the d-row frame
    * (pos, loading, eigenvalue, var_frac) — eigenvalue and var_frac
    * repeated on every row. */
  def powerIteration(corpus: DataFrame, idCol: String, vecCol: String,
                     iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val spark = corpus.sparkSession
    val vecs = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(vecCol).cast("array<double>").as("__v"))

    // pass 1: per-dim fixed-point sums + row count — one job, no explode
    val r0 = vecs.agg(
      graft.plans.VectorSumAggregate.longVectorSumAgg(
        transform(col("__v"), x => fx(x))).as("sx"),
      count(lit(1)).as("n")).head()
    require(!r0.isNullAt(0), "powerIteration needs at least one non-empty vector")
    val sx = r0.getSeq[Long](0)
    val n = r0.getLong(1)
    val d = sx.length
    val mu = sx.map(sv => (sv.toDouble / 1e12) / n).toArray

    // centered row, computed on the fly each pass (cheaper than
    // persisting an n×d explode at any scale)
    val xcCol = zip_with(col("__v"), typedLit(mu.toSeq), (x, m) => x - m).as("__xc")

    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var nrm = 0.0
    var tv = 0.0
    for (r <- 1 to iters) {
      // one corpus pass: Σ_i fx(xc·s_i) cells (+ total variance, round 1)
      val aggs =
        if (r == 1) Seq(
          graft.plans.VectorSumAggregate.powerStepAgg(col("__xc"), v).as("su"),
          sum(aggregate(col("__xc"), lit(0L), (acc, x) => acc + fx(x * x))).as("tv9"))
        else Seq(graft.plans.VectorSumAggregate.powerStepAgg(col("__xc"), v).as("su"))
      val row = vecs.select(xcCol).agg(aggs.head, aggs.tail: _*).head()
      val su = row.getSeq[Long](0)
      if (r == 1) tv = row.getLong(1).toDouble / 1e12
      val u = su.map(l => (l.toDouble / 1e12) / n).toArray
      var nrm9 = 0L
      var j = 0
      while (j < d) { nrm9 += math.floor(u(j) * u(j) * 1e12 + 0.5).toLong; j += 1 }
      nrm = math.sqrt(nrm9.toDouble / 1e12)
      v = u.map(_ / nrm)
    }

    import spark.implicits._
    val varFrac = nrm / (tv / n)
    (0 until d).map(j => (j, v(j), nrm, varFrac))
      .toDF("pos", "loading", "eigenvalue", "var_frac")
  }
}
