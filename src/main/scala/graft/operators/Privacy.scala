package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audit for a release candidate — k-anonymity and
  * l-diversity (Sweeney 2002; Machanavajjhala et al. 2007) over a
  * chosen quasi-identifier set: every row whose quasi-identifier
  * combination is shared by fewer than k rows is linkable, and a
  * class whose sensitive attribute is (near-)constant leaks the
  * attribute even at k. The report is the per-class frame a
  * de-identification pass consumes (suppress or generalize the
  * violating classes) plus the headline rates.
  *
  * Scale shape: one hash aggregate keyed by the quasi-identifier
  * tuple (map-side combinable count + distinct-sensitive), then a
  * broadcast 1-row totals frame for the corpus-level rates — the data
  * is scanned once, nothing is sorted. `countDistinct` per class is
  * exact (classes are small by definition of the audit); swap in
  * `approx_count_distinct` only for the corpus-level diagnostics,
  * never for the l-diversity gate itself.
  */
object Privacy {

  /** Per-equivalence-class report: (quasi cols…, class_size,
    * l_diversity, risk = 1/class_size, violates_k, violates_l) plus
    * corpus-level columns repeated on every row: n_rows,
    * frac_rows_at_risk (share of ROWS in sub-k classes — the number
    * that matters, classes are not rows), min_class_size. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int = 5, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2 && l >= 1, s"need k >= 2 and l >= 1, got k=$k l=$l")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("risk", lit(1.0) / col("class_size"))
      .withColumn("violates_k", col("class_size") < k)
      .withColumn("violates_l", col("l_diversity") < l)
    val totals = classes.agg(
      sum(col("class_size")).as("n_rows"),
      sum(when(col("violates_k"), col("class_size")).otherwise(0L)).as("__at_risk"),
      min(col("class_size")).as("min_class_size"))
      .select(col("n_rows"),
        (col("__at_risk").cast("double") / col("n_rows").cast("double"))
          .as("frac_rows_at_risk"),
        col("min_class_size"))
    classes.crossJoin(broadcast(totals))
  }
}
