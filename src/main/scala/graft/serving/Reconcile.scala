package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RT-vs-batch reconciliation helpers (reference reconciliation-and-slo
  * contract + verify_rt_content_events_aggregator.py:216-232).
  */
object Reconcile {

  /** Derived watermark-drop ratio: max(unique_raw − gold_total, 0) /
    * unique_raw — the portable fallback when StreamingQueryProgress
    * isn't retained (the reference's formula verbatim). Both scalar
    * aggregates run in ONE action (cross join of the 1-row frames), so
    * the check costs a single job regardless of table sizes. */
  def watermarkDropRatio(bronze: DataFrame, gold: DataFrame): Double = {
    val row = bronze.agg(countDistinct(col("event_id")).as("unique_raw"))
      .crossJoin(gold.agg(
        coalesce(sum(coalesce(col("views"), lit(0L)) + coalesce(col("clicks"), lit(0L)) +
          coalesce(col("purchases"), lit(0L)) + coalesce(col("signups"), lit(0L)) +
          coalesce(col("errors"), lit(0L))), lit(0L)).as("gold_total")))
      .collect()(0)
    val uniqueRaw = row.getLong(0)
    if (uniqueRaw == 0L) 0.0
    else math.max(uniqueRaw - row.getLong(1), 0L).toDouble / uniqueRaw
  }

  /** Minute-level count reconciliation between an RT aggregate and a
    * batch recompute: p95 of abs(rt−batch)/max(batch, floor). FULL outer
    * join: a key present only on the RT side (RT overcounting a grain
    * batch says shouldn't exist) must inflate the ratio, not vanish.
    * Empty inputs → 0.0 (percentile over zero rows is null). */
  def countDiffP95(rt: DataFrame, batch: DataFrame, keyCols: Seq[String],
                   rtCount: String, batchCount: String, floor: Long = 100L): Double = {
    val p = batch.join(rt, keyCols, "full_outer")
      .select((abs(coalesce(col(rtCount), lit(0L)) - coalesce(col(batchCount), lit(0L))).cast("double") /
        greatest(coalesce(col(batchCount), lit(0L)), lit(floor))).as("ratio"))
      .agg(expr("percentile(ratio, 0.95)")).collect()(0)
    if (p.isNullAt(0)) 0.0 else p.getDouble(0)
  }
}
