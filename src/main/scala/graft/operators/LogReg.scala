package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed trainer for a linear classifier — batch gradient descent
  * where each iteration is ONE map-side-combinable aggregation over the
  * feature frame and the weight vector stays a 1-row frame that
  * broadcast-cross-joins into the next pass (the MLlib-style
  * broadcast-ML loop: per-iteration state is O(d), never a driver
  * collect, never a per-row UDF).
  *
  * Two deliberate exactness choices make the whole fit cross-engine
  * hash-gateable (the same reasoning as TfIdf's ratio IDF):
  *
  *  - the squashing function is the ALGEBRAIC sigmoid
  *    p = 0.5 + 0.5·m/(1+|m|), pure rational arithmetic — `exp` is not
  *    correctly-rounded-guaranteed across libm implementations, so a
  *    logistic sigmoid would drift between engines in the last ulp and
  *    the drift compounds through iterations. Same monotone S-shape,
  *    same decision boundary (p ≥ 0.5 ⟺ m ≥ 0); swap `exp` in for
  *    production if calibrated probabilities matter.
  *  - gradient components are summed as FIXED-POINT integers
  *    (floor(term·1e12 + 0.5) per row, BIGINT sum, divide back after) —
  *    float sums are summation-order-dependent, integer sums are exact
  *    under any partitioning/order.
  *
  * 100 TB shape: per iteration one scan + one partial/final aggregate
  * producing d+1 longs; the weight frame re-broadcasts each round. Plan
  * depth grows linearly with iters — callers beyond ~10 iterations
  * should truncate lineage between rounds (core.Lineage.truncate, the
  * Graphs/Dedup loop pattern).
  */
object LogReg {

  private val Scale = 1e12

  private def fixed(c: Column): Column = floor(c * lit(Scale) + lit(0.5)).cast("long")

  /** Margin m = w_bias + Σ w_f·x_f, folded in declared feature order
    * (fixed association so every engine evaluates identically). */
  def margin(features: Seq[String]): Column =
    features.foldLeft(col("w_bias")) { (acc, f) => acc + col(s"w_$f") * col(f) }

  /** Algebraic sigmoid of the margin (see class note). */
  def squash(m: Column): Column = lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m)))

  /** Fit weights: `iters` rounds of w += lr·avg((y−p)·x). Returns the
    * 1-row weight frame (w_bias, w_<feature>…). `labelCol` must be
    * 0.0/1.0 doubles. */
  def fit(data: DataFrame, features: Seq[String], labelCol: String,
          lr: Double = 1.0, iters: Int = 2): DataFrame = {
    var w: DataFrame = data.sparkSession.range(1).select(
      lit(0.0).as("w_bias") +: features.map(f => lit(0.0).as(s"w_$f")): _*)
    for (_ <- 0 until iters) {
      val err = col(labelCol) - squash(margin(features))
      val g = data.crossJoin(broadcast(w))
        .agg(
          sum(fixed(err)).as("g_bias"),
          features.map(f => sum(fixed(err * col(f))).as(s"g_$f")) :+
            count(lit(1)).as("__n"): _*)
      def step(wc: String, gc: String): Column =
        (col(wc) + lit(lr) * ((col(gc).cast("double") / lit(Scale)) / col("__n"))).as(wc)
      w = w.crossJoin(broadcast(g)).select(
        step("w_bias", "g_bias") +: features.map(f => step(s"w_$f", s"g_$f")): _*)
    }
    // the fitted 1-row weight frame is cut to a checkpoint leaf: left
    // lazy, every consumer (score's broadcast, a metrics crossJoin, a
    // fairness report) re-executes the whole gradient chain — 2·iters
    // corpus passes PER CONSUMER (q_logreg measured 2 full re-fits)
    graft.core.Lineage.truncate(w)
  }

  /** Score a frame with a fitted weight row: adds `margin`, `p`, and
    * the decision `pred` (p ≥ 0.5 ⟺ margin ≥ 0 — evaluated on the
    * margin so the threshold is exact). */
  def score(data: DataFrame, features: Seq[String], weights: DataFrame): DataFrame =
    data.crossJoin(broadcast(weights))
      .withColumn("margin", margin(features))
      .withColumn("p", squash(col("margin")))
      .withColumn("pred", (col("margin") >= 0).cast("double"))
}
