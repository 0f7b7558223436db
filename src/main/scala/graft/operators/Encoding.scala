package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical feature encodings for training pipelines. The workhorse
  * is leave-one-out target encoding: replace a high-cardinality
  * category with the mean label of the OTHER rows in its category —
  * the standard trick that injects target signal without the
  * self-leakage of a plain group mean (each row's own label is
  * subtracted from the numerator), plus the smoothed variant that
  * shrinks small categories toward the global prior.
  *
  * Exactness: the label must be integral (0/1 flags or integer
  * targets), so every per-category sum is a BIGINT — exact under any
  * partitioning — and each encoding is a fixed-order chain of IEEE
  * ops over exact integers: bit-identical on any engine.
  *
  * 100 TB shape: one groupBy(category) producing a category-count
  * frame (≤ cardinality rows — broadcast side), one 1-row global
  * aggregate riding the same broadcast pattern, one join back to the
  * feed. No window over the feed, no per-row state.
  */
object Encoding {

  /** Append `te_loo`, `te_smooth`, and `freq` for `catCol` against the
    * integral `labelCol`. Categories of size 1 get NULL te_loo (no
    * other rows to average — emitting ±Inf would poison downstream
    * aggregates); te_smooth is always defined for alpha > 0. */
  def targetEncodeLoo(df: DataFrame, catCol: String, labelCol: String,
                      alpha: Double = 10.0): DataFrame = {
    val perCat = df.groupBy(col(catCol))
      .agg(sum(col(labelCol)).as("__s"), count(lit(1)).as("__n"))
    val global = df.agg(
      (sum(col(labelCol)).cast("double") / count(lit(1))).as("__prior"),
      count(lit(1)).as("__total"))
    df.join(broadcast(perCat), catCol)
      .crossJoin(broadcast(global))
      .withColumn("te_loo",
        when(col("__n") > 1,
          (col("__s") - col(labelCol)).cast("double") / (col("__n") - 1)))
      .withColumn("te_smooth",
        ((col("__s") - col(labelCol)).cast("double") + lit(alpha) * col("__prior")) /
          ((col("__n") - 1).cast("double") + lit(alpha)))
      .withColumn("freq", col("__n").cast("double") / col("__total"))
      .drop("__s", "__n", "__prior", "__total")
  }
}
