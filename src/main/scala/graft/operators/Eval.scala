package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classifier/score evaluation over DataFrames — metrics an LLM-data
  * pipeline runs on its quality/filter models. */
object Eval {

  /** ROC AUC of `scoreCol` as a ranker of the boolean `labelCol`,
    * computed WITHOUT a global row sort: group to per-score
    * (n_pos, n_neg) counts, then apply the Mann-Whitney identity
    *
    *   AUC = Σ_s n_pos(s) · (N_neg(<s) + n_neg(s)/2) / (P·N),
    *
    * i.e. the probability a random positive outranks a random negative
    * with ties counted half. The running negative count is a window
    * over the per-score frame — ≤ 10^grain rows for fixed-decimal
    * scores (the 4-dp curation convention), never corpus-sized.
    *
    * All internals are exact integers (the ½ tie term is kept as a
    * ×2-scaled numerator), so the single final division is the only
    * IEEE op — AUC hash-gates with no tolerance. Returns one row:
    * (n_pos, n_neg, auc) with auc rounded to 4 decimals; NULL auc when
    * either class is empty (AUC undefined).
    *
    * Scale shape: one keyed aggregation to the per-score frame, one
    * tiny window, one 1-row reduce. For scores too fine-grained to
    * bucket, round them first — AUC over 4-dp scores differs
    * negligibly and keeps the frame bounded. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).as("__s"))
      .agg(
        count(when(col(labelCol), 1)).as("__np"),
        count(when(!col(labelCol), 1)).as("__nn"))
    val wAsc = Window.orderBy(col("__s")).rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("__cum_neg", coalesce(sum(col("__nn")).over(wAsc), lit(0L)))
      // 2x-scaled per-score contribution: pos·(2·neg_below + neg_here)
      .withColumn("__num2x", col("__np") * (lit(2) * col("__cum_neg") + col("__nn")))
      .agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"),
        sum(col("__num2x")).as("__num"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          graft.queries.rd(col("__num").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 4)).as("auc"))
  }
}
