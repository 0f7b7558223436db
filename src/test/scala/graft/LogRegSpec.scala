package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LogReg

class LogRegSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val feats = Seq("x1")

  test("fit separates a linearly separable 1-d problem") {
    // y = 1 iff x1 > 0; symmetric cloud -> weight moves positive, bias ~0
    val data = Seq(
      (1.0, 1.0), (1.0, 2.0), (1.0, 0.5), (0.0, -1.0), (0.0, -2.0), (0.0, -0.5))
      .toDF("y", "x1")
    val w = LogReg.fit(data, feats, "y", lr = 1.0, iters = 8)
    val scored = LogReg.score(data, feats, w)
    val acc = scored.agg(avg((col("pred") === col("y")).cast("double"))).head.getDouble(0)
    assert(acc == 1.0, s"separable data must reach train accuracy 1.0: $acc")
    val wx = w.head.getAs[Double]("w_x1")
    assert(wx > 0, s"weight sign must follow the class direction: $wx")
  }

  test("each iteration moves the weight monotonically on one-sided data") {
    val data = Seq((1.0, 1.0), (1.0, 2.0), (0.0, -1.0), (0.0, -1.5)).toDF("y", "x1")
    val w1 = LogReg.fit(data, feats, "y", iters = 1).head.getAs[Double]("w_x1")
    val w2 = LogReg.fit(data, feats, "y", iters = 2).head.getAs[Double]("w_x1")
    assert(w1 > 0 && w2 > w1, s"gradient ascent must keep climbing: $w1 -> $w2")
  }

  test("squash is the algebraic sigmoid: exact at 0, symmetric, bounded") {
    val got = spark.range(1).select(
      LogReg.squash(lit(0.0)).as("p0"),
      LogReg.squash(lit(3.0)).as("pp"),
      LogReg.squash(lit(-3.0)).as("pn"),
      LogReg.squash(lit(1e300)).as("pinf")).head
    assert(got.getAs[Double]("p0") == 0.5, "squash(0) must be exactly 0.5 (no libm)")
    assert(math.abs(got.getAs[Double]("pp") + got.getAs[Double]("pn") - 1.0) < 1e-15)
    assert(got.getAs[Double]("pp") > 0.5 && got.getAs[Double]("pn") < 0.5)
    assert(got.getAs[Double]("pinf") <= 1.0, "squash must stay bounded, never overflow")
  }

  test("fit is invariant to row order and partitioning (fixed-point gradient sums)") {
    val rows = (0 until 64).map(i => (if (i % 3 == 0) 1.0 else 0.0, i / 64.0 - 0.3))
    val a = LogReg.fit(rows.toDF("y", "x1").repartition(1), feats, "y", iters = 3).head
    val b = LogReg.fit(scala.util.Random.shuffle(rows).toDF("y", "x1").repartition(7),
      feats, "y", iters = 3).head
    assert(a.getAs[Double]("w_bias") == b.getAs[Double]("w_bias") &&
      a.getAs[Double]("w_x1") == b.getAs[Double]("w_x1"),
      s"weights must be bit-identical under reorder: $a vs $b")
  }
}
