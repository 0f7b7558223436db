package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Align

/** Orthogonal Procrustes: exact rotation recovery, orthogonality of
  * the solved map under noise, and the Jacobi SVD's invariants. */
class AlignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wMatrix(rows: Array[org.apache.spark.sql.Row], d: Int): Array[Array[Double]] = {
    val w = Array.ofDim[Double](d, d)
    rows.foreach(r => w(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    w
  }

  test("recovers an exact 2-D rotation; after-residual 0, before-residual positive") {
    val th = math.toRadians(30)
    val (c, s) = (math.cos(th), math.sin(th))
    // y = x R with R = [[c, s], [-s, c]] (row-vector convention: XW ≈ Y)
    val xs = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.7, -0.3), Array(-0.2, 0.9))
    val pairs = xs.map(x => (x, Array(c * x(0) - s * x(1), s * x(0) + c * x(1))))
      .toDF("x", "y")
    val out = Align.procrustes(pairs, "x", "y").collect()
    val w = wMatrix(out, 2)
    assert(math.abs(w(0)(0) - c) < 1e-6 && math.abs(w(0)(1) - s) < 1e-6)
    assert(math.abs(w(1)(0) + s) < 1e-6 && math.abs(w(1)(1) - c) < 1e-6)
    assert(out.head.getDouble(5) === 0.0, s"resid_after ${out.head.getDouble(5)}")
    assert(out.head.getDouble(4) > 0.1, "resid_before must show the unrotated cost")
  }

  test("solved map is orthogonal even when pairs are noisy") {
    val rnd = new scala.util.Random(7)
    val th = 1.1
    val (c, s) = (math.cos(th), math.sin(th))
    val pairs = (0 until 50).map { _ =>
      val x = Array(rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1, rnd.nextDouble() * 2 - 1)
      // rotate in the (0,1) plane + noise on every y coordinate
      val y = Array(c * x(0) - s * x(1) + rnd.nextGaussian() * 0.05,
        s * x(0) + c * x(1) + rnd.nextGaussian() * 0.05,
        x(2) + rnd.nextGaussian() * 0.05)
      (x, y)
    }.toDF("x", "y")
    val out = Align.procrustes(pairs, "x", "y").collect()
    val w = wMatrix(out, 3)
    // W^T W = I to solver precision (rounding at 1e-6 in the output)
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 3).map(r => w(r)(a) * w(r)(b)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-4, s"W'W[$a][$b] = $dot")
    }
    // rotation ≈ the true one despite noise
    assert(math.abs(w(0)(0) - c) < 0.05 && math.abs(w(0)(1) - s) < 0.05)
    // aligning must beat not aligning
    assert(out.head.getDouble(5) < out.head.getDouble(4))
  }

  test("jacobiSvd: exact singular values on a hand matrix; U/V orthogonal") {
    // M = [[3, 0], [0, -2]] → σ = {3, 2}
    val (u, sig, v) = Align.jacobiSvd(Array(Array(3.0, 0.0), Array(0.0, -2.0)))
    assert(sig.sorted.reverse.zip(Seq(3.0, 2.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    for (m <- Seq(u, v); a <- 0 until 2; b <- 0 until 2) {
      val dot = (0 until 2).map(r => m(r)(a) * m(r)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-12)
    }
    // reconstruction: U Σ V^T = M
    val rec = Array.tabulate(2, 2)((i, j) =>
      (0 until 2).map(r => u(i)(r) * sig(r) * v(j)(r)).sum)
    assert(math.abs(rec(0)(0) - 3.0) < 1e-12 && math.abs(rec(1)(1) + 2.0) < 1e-12)
    assert(math.abs(rec(0)(1)) < 1e-12 && math.abs(rec(1)(0)) < 1e-12)
  }
}
