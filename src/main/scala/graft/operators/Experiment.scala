package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment-analysis operators beyond the per-arm hypothesis tests
  * (HypothesisTests): difference-in-differences for observational
  * pre/post designs and CUPED variance reduction for randomized ones.
  * Both run on exact 1e-2 fixed-point moment sums (the Welch recipe),
  * so every statistic is a short chain of IEEE ops over exact integers
  * — engine-reproducible and oracle-mirrorable.
  */
object Experiment {

  private def fx(c: org.apache.spark.sql.Column) =
    floor(c * 100 + lit(0.5)).cast("long")

  /** Difference-in-differences: for each (arm, period) cell the exact
    * cent-sum mean, then DiD = (treat_post − treat_pre) −
    * (ctrl_post − ctrl_pre) — the causal effect estimate under the
    * parallel-trends assumption, with the classic unpooled SE
    * √(Σ s²_cell/n_cell) over the four cells (large-sample normal).
    * Input: one row per observation with a boolean treat flag and a
    * boolean post flag. One keyed aggregate (4 groups) + a 4-row
    * pivot — nothing scales with data size after the scan. */
  def diffInDiff(df: DataFrame, treatCol: String, postCol: String,
                 valueCol: String): DataFrame = {
    val cells = df.groupBy(col(treatCol).as("treat"), col(postCol).as("post"))
      .agg(count(lit(1)).as("n"), sum(fx(col(valueCol))).as("s1"),
        sum(fx(col(valueCol)) * fx(col(valueCol))).as("s2"))
      .withColumn("mean", (col("s1").cast("double") / 100) / col("n"))
      // unbiased per-cell variance from exact moments:
      // s² = (Σx² − (Σx)²/n) / (n−1), in value units (cents² / 1e4)
      .withColumn("var",
        when(col("n") > 1,
          ((col("s2").cast("double") / 10000)
            - (col("s1").cast("double") / 100) * (col("s1").cast("double") / 100) / col("n"))
            / (col("n") - 1)))
    val wide = cells.groupBy()
      .agg(
        max(when(col("treat") && col("post"), col("mean"))).as("m_tp"),
        max(when(col("treat") && !col("post"), col("mean"))).as("m_t0"),
        max(when(!col("treat") && col("post"), col("mean"))).as("m_cp"),
        max(when(!col("treat") && !col("post"), col("mean"))).as("m_c0"),
        max(when(col("treat") && col("post"), col("var") / col("n"))).as("v_tp"),
        max(when(col("treat") && !col("post"), col("var") / col("n"))).as("v_t0"),
        max(when(!col("treat") && col("post"), col("var") / col("n"))).as("v_cp"),
        max(when(!col("treat") && !col("post"), col("var") / col("n"))).as("v_c0"),
        sum(col("n")).as("n_total"))
    wide.select(col("n_total"), col("m_tp"), col("m_t0"), col("m_cp"), col("m_c0"),
      ((col("m_tp") - col("m_t0")) - (col("m_cp") - col("m_c0"))).as("did"),
      sqrt(col("v_tp") + col("v_t0") + col("v_cp") + col("v_c0")).as("se"))
  }

  /** CUPED (controlled-experiment using pre-experiment data, Deng et
    * al. WSDM 2013): per-unit post metric Y adjusted by the pre-period
    * covariate X, Yadj = Y − θ·(X − mean X) with θ = cov(X,Y)/var(X)
    * pooled across arms — removes the between-unit variance X explains
    * (often 30–50%+) without biasing the treatment contrast, because
    * X predates assignment. Emits per-arm raw and adjusted means plus
    * θ and the variance-reduction ratio var(Yadj)/var(Y).
    *
    * Input: ONE ROW PER UNIT (pre-aggregate first — that is what makes
    * the unit the randomization unit). Two keyed aggregates over the
    * unit frame (global moments, then per-arm) — both broadcastable
    * summaries; exact cent moments throughout, the only floats are the
    * closing divisions. */
  def cuped(units: DataFrame, armCol: String, preCol: String,
            postCol: String): DataFrame = {
    val u = units.select(col(armCol).as("arm"),
      fx(col(preCol)).as("x"), fx(col(postCol)).as("y"))
    val g = u.groupBy().agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sx2"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("sy2"),
      sum(col("x") * col("y")).as("sxy"))
      // θ in (value-unit) space is scale-free: cents cancel in the ratio
      .withColumn("cov", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx", col("n") * col("sx2") - col("sx") * col("sx"))
      .withColumn("vary", col("n") * col("sy2") - col("sy") * col("sy"))
      .withColumn("theta",
        when(col("varx") > 0, col("cov").cast("double") / col("varx")).otherwise(lit(0.0)))
      .withColumn("mean_x", (col("sx").cast("double") / 100) / col("n"))
      // var(Yadj) = var(Y) − cov²/var(X) (the OLS residual identity);
      // ratio from the same exact integer moments
      .withColumn("var_ratio",
        when(col("varx") > 0 && col("vary") > 0,
          (col("vary").cast("double")
            - col("cov").cast("double") * col("cov").cast("double") / col("varx"))
            / col("vary")).otherwise(lit(1.0)))
    val arms = u.groupBy(col("arm")).agg(
      count(lit(1)).as("n_arm"), sum(col("y")).as("asy"), sum(col("x")).as("asx"))
    arms.crossJoin(broadcast(g.select(col("theta"), col("mean_x"), col("var_ratio"))))
      .select(col("arm"), col("n_arm"),
        ((col("asy").cast("double") / 100) / col("n_arm")).as("mean_y"),
        // mean(Yadj) = mean(Y) − θ·(mean(X)_arm − mean(X))
        (((col("asy").cast("double") / 100) / col("n_arm"))
          - col("theta") * (((col("asx").cast("double") / 100) / col("n_arm")) - col("mean_x")))
          .as("mean_y_adj"),
        col("theta"), col("var_ratio"))
  }
}
