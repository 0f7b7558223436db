package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Lineage

/** 2-D Pareto frontier (skyline) — the multi-objective selection
  * primitive: keep every row for which no other row is at least as
  * good on both axes and strictly better on one (minimize `minCol`,
  * maximize `maxCol`). Curation uses it to pick the quality/cost
  * frontier (e.g. max engagement at min error rate) without inventing
  * a scalarization weight.
  */
object Skyline {

  /** Sort-scan skyline, DISTRIBUTED: the textbook algorithm sorts all
    * points by `minCol` and keeps a running max of `maxCol` — a global
    * sort, i.e. a single-partition window at scale. This instead runs
    * the scan at two levels (the KS-drift prefix-sum recipe):
    *
    *  1. collapse rows to one row per distinct `minCol` value with the
    *     group max of `maxCol` (one keyed shuffle — the key frame is
    *     |distinct minCol|, usually ≪ |rows|);
    *  2. range-bucket the key frame on `minCol` (bounds from a 1-row
    *     broadcast anchor, no collect); per-bucket running max runs as
    *     a PARTITIONED window (parallel), and the cross-bucket carry-in
    *     is a window over the nBuckets-row bucket summary (trivially
    *     single-partition);
    *  3. join the strict-below max back onto the rows (keyed on
    *     `minCol`): a row survives iff no strictly-smaller `minCol` has
    *     maxCol ≥ its own AND no equal-`minCol` peer has maxCol > its
    *     own.
    *
    * Ties on both axes survive together (neither dominates — the
    * strictness clause of the standard definition). Comparisons only —
    * no arithmetic on the axis values — so any ordered column types
    * work and engine float-sum drift cannot flip membership as long as
    * the inputs are exact (feed fixed-point/cent sums, not float
    * aggregates).
    *
    * NULL contract: dominance is undefined for a NULL axis value, and
    * the join-back key (`minCol`) would silently DROP null-key rows —
    * so a NULL in either axis column fails fast per-row (raise_error,
    * the weightedSample guard pattern — no extra validation action).
    * Filter or impute nulls upstream. */
  def skyline2D(df0: DataFrame, minCol: String, maxCol: String,
                nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    def nullGuard(name: String) =
      when(col(name).isNotNull, col(name)).otherwise(raise_error(lit(
        s"skyline2D: NULL $name — dominance is undefined for null axis " +
          "values; filter or impute upstream")))
    val df = df0.withColumn(minCol, nullGuard(minCol))
      .withColumn(maxCol, nullGuard(maxCol))
    val keys = Lineage.truncate(
      df.groupBy(col(minCol).as("k"))
        .agg(max(col(maxCol)).as("kmax")))
    val anchor = keys.groupBy()
      .agg(min(col("k").cast("double")).as("lo"), max(col("k").cast("double")).as("hi"))
    val bk = keys.crossJoin(broadcast(anchor))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(
            floor((col("k").cast("double") - col("lo")) / ((col("hi") - col("lo")) / nBuckets)),
            lit(nBuckets - 1))).cast("int"))
      .select(col("k"), col("kmax"), col("bucket"))
    val carryIn = bk.groupBy(col("bucket")).agg(max(col("kmax")).as("bmax"))
      .withColumn("prev_bmax",
        max(col("bmax")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("prev_bmax"))
    val withinPrev = max(col("kmax")).over(
      Window.partitionBy(col("bucket")).orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val scored = bk.join(broadcast(carryIn), "bucket")
      .withColumn("strict_below_max", greatest(withinPrev, col("prev_bmax")))
      .select(col("k"), col("kmax"), col("strict_below_max"))
    df.join(scored, df(minCol) === scored("k"))
      .filter(
        (col("strict_below_max").isNull || col("strict_below_max") < col(maxCol)) &&
          col("kmax") <= col(maxCol))
      .drop("k", "kmax", "strict_below_max")
  }
}
