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

  /** Weight-of-evidence table + information value for a BINNED feature
    * against a binary label — the credit-scoring-lineage feature
    * screen: WOEᵢ = ln(pgᵢ/pbᵢ) with add-half smoothing (the PSI
    * recipe, so empty cells stay finite), IV = Σ (pgᵢ − pbᵢ)·WOEᵢ.
    * IV < 0.02 ⇒ the feature is useless; > 0.5 ⇒ suspiciously strong
    * (leakage check). Complements [[targetEncodeLoo]]: WOE/IV judge a
    * binned feature, target encoding consumes a categorical one.
    *
    * Exactness: counts are exact longs; pg/pb are single divisions;
    * one `ln` per bin rounded into the output at the consumer; IV sums
    * the per-bin contributions in 1e-9 fixed point — engine-exact.
    * Shape: one groupBy(bin) + two broadcast 1-row frames (totals,
    * IV); no window over the feed. Returns one row per bin:
    * (bin, n_good, n_bad, woe, contrib, iv repeated). */
  def woeIv(df: DataFrame, binCol: String, labelCol: String): DataFrame = {
    val bins = df.groupBy(col(binCol).as("bin"))
      .agg(sum(col(labelCol).cast("long")).as("n_good"),
        sum(lit(1L) - col(labelCol).cast("long")).as("n_bad"))
    val tot = bins.agg(sum(col("n_good")).as("tg"), sum(col("n_bad")).as("tb"),
      count(lit(1)).as("m"))
    val p = (n: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =>
      (n.cast("double") + lit(0.5)) /
        (t.cast("double") + lit(0.5) * col("m").cast("double"))
    val scored = bins.crossJoin(broadcast(tot))
      .withColumn("pg", p(col("n_good"), col("tg")))
      .withColumn("pb", p(col("n_bad"), col("tb")))
      .withColumn("woe", log(col("pg") / col("pb")))
      .withColumn("contrib", (col("pg") - col("pb")) * col("woe"))
    val iv = scored.agg((sum(floor(col("contrib") * lit(1e9) + lit(0.5))
      .cast("long")).cast("double") / lit(1e9)).as("iv"))
    scored.crossJoin(broadcast(iv))
      .select(col("bin"), col("n_good"), col("n_bad"), col("woe"),
        col("contrib"), col("iv"))
  }

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
