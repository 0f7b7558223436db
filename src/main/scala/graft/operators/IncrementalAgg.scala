package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-rollup refresh
  * path. A per-key aggregate over an append-only fact stream is kept as
  * an ALGEBRAIC STATE table (count / sum / min / max are all
  * commutative monoids, avg derives from sum÷count), so refreshing
  * after a new batch merges two state tables instead of rescanning the
  * facts:
  *
  *   merge(partials(A), partials(B)) ≡ partials(A ∪ B)
  *
  * 100 TB shape: the whole point. A day's delta is GBs while the base
  * fact table is the full 100 TB — recomputing the rollup rescans
  * everything, merging shuffles only `keys × state` rows (one row per
  * key per side). This is exactly Spark's own partial-aggregation
  * algebra lifted to table granularity, and the same state layout
  * `transformWithState` keeps per key on the streaming path
  * (streaming/Accumulate.scala) — batch and stream maintain the same
  * rollup.
  *
  * Deletes/updates are out of scope by design: min/max are not
  * invertible monoids (subtracting a row can expose a new minimum only
  * a rescan of the group can find). Feed retractions through
  * [[MergeOps.applyCdc]] into the base table and rebuild the affected
  * keys instead.
  */
object IncrementalAgg {

  /** Per-key algebraic state of one batch: n / sum_v / min_v / max_v. */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold state tables into one — associative and commutative, so any
    * number of deltas (or a tree of them) merge in any order. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Derived metrics on a state table (avg = sum ÷ count). */
  def finalized(state: DataFrame): DataFrame =
    state.withColumn("avg_v", col("sum_v") / col("n"))
}
