package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orthogonal-Procrustes embedding-space alignment (Schönemann 1966;
  * the MUSE/vecmap recipe for mapping one embedding space onto
  * another given anchor pairs): W = argmin ‖XW − Y‖_F over orthogonal
  * W, solved as W = UVᵀ from the SVD of the cross-covariance
  * M = XᵀY. The supervised half of cross-lingual alignment —
  * [[Similarity.marginBitext]] mines the anchor pairs, this solves
  * the rotation that maps space X onto space Y (rotation-only, so the
  * map can't collapse or distort the source space — the property that
  * makes Procrustes the published standard over unconstrained least
  * squares, which overfits anchors).
  *
  * Scale shape (the Pca.powerIteration recipe): M accumulates as ONE
  * un-keyed aggregate pass — each row folds its d² outer-product
  * cells into an element-wise long-vector sum
  * (plans.VectorSumAggregate; no n·d² explode is ever materialized,
  * map-side combine ships one d²-cell array per partition), 1e-12
  * fixed-point BIGINT sums (order-independent, engine-exact; drop to
  * 1e9 scale beyond ~1e6 anchor rows, same int64 headroom
  * note as Pca) — then the d×d SVD runs on the driver (one-sided
  * Jacobi, ~60 LoC, deterministic sweep order): scale-correct for
  * d ≪ n, the same "driver solves only O(d²)" stance the PCA
  * operator takes. No per-row driver work, no collect of anything
  * data-sized.
  *
  * Output: the d² cells of W as (j, k, w) — x-dim j contributes to
  * y-dim k — plus, repeated on every row, the alignment diagnostics a
  * mapping pipeline gates on: `sum_sigma` (Σ singular values = the
  * optimal trace), `resid_before` (‖X − Y‖²_F, the cost of NOT
  * rotating) and `resid_after` (‖XW − Y‖²_F = ‖X‖² + ‖Y‖² − 2Σσ,
  * closed form — no second data pass).
  *
  * Rank caveat: W is unique iff M has full rank; zero singular
  * directions get an identity-completed U column (deterministic, and
  * irrelevant to the residual). */
object Align {

  private def fx(c: Column): Column = floor(c * lit(1e12) + lit(0.5)).cast("long")
  private def unfx(c: Column): Column = c.cast("double") / lit(1e12)

  def procrustes(pairs: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = pairs.sparkSession
    val base = pairs.select(col(xCol).cast("array<double>").as("__x"),
      col(yCol).cast("array<double>").as("__y"))
    // ONE pass: each row folds its d² outer-product cells (row-major
    // j·d + k, 1e-12 fixed point) into the element-wise long-vector
    // sum — no n·d² posexplode materialization, no keyed exchange; the
    // anchor norms and the pair count ride the same aggregate job. The
    // cell values are bit-identical to the exploded groupBy(j,k)
    // formulation (same quantized terms, order-free integer adds).
    val cellsCol = flatten(transform(col("__x"), xv =>
      transform(col("__y"), yv => fx(xv * yv))))
    val r0 = base.agg(
      graft.plans.VectorSumAggregate.longVectorSumAgg(cellsCol).as("cells"),
      max(size(col("__y"))).as("dy"),
      max(size(col("__x"))).as("dx"),
      unfx(sum(aggregate(col("__x"), lit(0L), (acc, x) => acc + fx(x * x)))).as("nx"),
      unfx(sum(aggregate(col("__y"), lit(0L), (acc, y) => acc + fx(y * y)))).as("ny"))
      .collect()(0) // d² cells + 4 scalars — the driver-solve input, never data-sized
    require(!r0.isNullAt(0), "procrustes needs at least one non-empty anchor pair")
    val cells = r0.getSeq[Long](0)
    val d = r0.getInt(1)
    require(r0.getInt(2) == d && cells.length == d * d,
      s"ragged vectors: expected ${d * d} cross-covariance cells " +
        s"(dx=${r0.getInt(2)}, dy=$d), got ${cells.length}")
    val m = Array.tabulate(d, d)((j, k) => cells(j * d + k).toDouble / 1e12)

    val (u, sig, v) = jacobiSvd(m)
    val w = Array.tabulate(d, d)((j, k) =>
      (0 until d).map(r => u(j)(r) * v(k)(r)).sum)
    val sumSigma = sig.sum
    val (nx, ny) = (r0.getDouble(3), r0.getDouble(4))
    val trM = (0 until d).map(i => m(i)(i)).sum
    def rd4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    def rd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

    import spark.implicits._
    val rows = for (j <- 0 until d; k <- 0 until d)
      yield (j, k, rd6(w(j)(k)), rd4(sumSigma),
        rd4(nx + ny - 2.0 * trM), rd4(nx + ny - 2.0 * sumSigma))
    rows.toDF("j", "k", "w", "sum_sigma", "resid_before", "resid_after")
  }

  /** One-sided (Hestenes) Jacobi SVD of a small dense matrix:
    * A = U·diag(σ)·Vᵀ. Fixed sweep order → deterministic; zero-σ
    * columns of U complete to identity. Public textbook algorithm
    * (Golub & Van Loan §8.6). */
  private[graft] def jacobiSvd(m: Array[Array[Double]])
      : (Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var rotated = true
    var sweeps = 0
    while (rotated && sweeps < 60) {
      rotated = false
      for (p <- 0 until d; q <- (p + 1) until d) {
        var app = 0.0; var aqq = 0.0; var apq = 0.0
        var i = 0
        while (i < d) {
          app += a(i)(p) * a(i)(p); aqq += a(i)(q) * a(i)(q)
          apq += a(i)(p) * a(i)(q); i += 1
        }
        if (apq != 0.0 && math.abs(apq) > 1e-14 * math.sqrt(app * aqq)) {
          rotated = true
          val zeta = (aqq - app) / (2.0 * apq)
          val t =
            if (zeta == 0.0) 1.0
            else math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
          val cs = 1.0 / math.sqrt(1.0 + t * t)
          val sn = cs * t
          i = 0
          while (i < d) {
            val tp = a(i)(p)
            a(i)(p) = cs * tp - sn * a(i)(q); a(i)(q) = sn * tp + cs * a(i)(q)
            val vp = v(i)(p)
            v(i)(p) = cs * vp - sn * v(i)(q); v(i)(q) = sn * vp + cs * v(i)(q)
            i += 1
          }
        }
      }
      sweeps += 1
    }
    val sig = Array.tabulate(d) { j =>
      math.sqrt((0 until d).map(i => a(i)(j) * a(i)(j)).sum)
    }
    val u = Array.tabulate(d, d) { (i, j) =>
      if (sig(j) > 1e-12) a(i)(j) / sig(j) else if (i == j) 1.0 else 0.0
    }
    (u, sig, v)
  }
}
