package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed upsert (MERGE) semantics without a table format — the reference's
  * MERGE INTO contracts (rt_content_events_aggregator_sql.py:128-172,
  * rt_video_cdc_upsert_sql.py:113-172) re-expressed as pure dataflow:
  * MERGE = dedup-latest(source) ∪ (target ⟕̸ source-keys).
  *
  * Scale notes: the anti-join and the window dedup both shuffle on the
  * merge key only; with the target bucketed/partitioned by the same key a
  * real deployment (Delta/Iceberg merge-on-read) avoids rewriting
  * untouched files — this emulation keeps identical *semantics* so query
  * results are storage-format independent.
  */
object MergeOps {

  /** Latest row per key: ROW_NUMBER() OVER (PARTITION BY keys ORDER BY
    * orderBy DESC...) = 1 — the reference's CDC pre-dedup (W1), with the
    * caller supplying the full deterministic tiebreak ordering. */
  def dedupLatest(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Latest row per key via aggregation instead of a window sort:
    * max_by(payload, ordering-struct) with structs comparing
    * lexicographically. Equivalent to [[dedupLatest]] when `ordAsc` is
    * the ascending version of the same (total) ordering, but runs as a
    * hash aggregate with map-side partial combine — no per-partition
    * full sort, and the shuffle carries one row per (partition, key)
    * instead of every row. Preferred at scale whenever the ordering is
    * expressible ascending (the common ts/offset case). */
  def dedupLatestBy(df: DataFrame, keys: Seq[String], ordAsc: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col).toSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(ordAsc: _*)).as("__r"))
      .select(col("__r.*"))
  }

  /** [[upsert]] with the aggregate dedup (see [[dedupLatestBy]]). */
  def upsertBy(target: DataFrame, source: DataFrame, keys: Seq[String],
               ordAsc: Seq[Column]): DataFrame = {
    val latest = dedupLatestBy(source, keys, ordAsc)
    val cols = target.columns.map(col).toSeq
    latest.select(cols: _*)
      .unionByName(target.join(latest, keys, "left_anti").select(cols: _*))
  }

  /** MERGE target←source ON keys: WHEN MATCHED UPDATE (source row wins)
    * WHEN NOT MATCHED INSERT. Source is pre-deduped latest-wins. Both
    * sides must share the same schema. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             orderBy: Seq[Column]): DataFrame = {
    val latest = dedupLatest(source, keys, orderBy)
    val cols = target.columns.map(col).toSeq
    latest.select(cols: _*)
      .unionByName(target.join(latest, keys, "left_anti").select(cols: _*))
  }

  /** Idempotent seed insert (reference S9/J6: INSERT ... WHERE NOT EXISTS):
    * append only rows whose key is absent from the target. */
  def insertIfAbsent(target: DataFrame, rows: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(rows.join(target, keys, "left_anti").select(target.columns.map(col).toSeq: _*))

  /** SCD Type-2 history from a change log: collapse consecutive
    * duplicate attribute values per key (change detection via lag),
    * then derive validity intervals via lead — one row per VERSION with
    * [effective_from, effective_to) bounds, effective_to null on the
    * current version. The Type-2 counterpart of the Type-1 [[upsert]]
    * (the reference's CDC dimension is Type-1; the registry lifecycle
    * contract — rule_version/effective_from/effective_to, reference
    * m1-data-model-v1.md dims — is exactly this shape applied to
    * thresholds, see serving.BaselineRegistry).
    *
    * Two window passes over the same (key × ts) partitioning — a single
    * shuffle on the key; no joins. The change log must be unique per
    * (key, tsCol) (pre-dedup with [[dedupLatestBy]] otherwise). */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val attrs = struct(attrCols.map(col): _*)
    val changed = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe struct inequality: the first row per key (null
      // __prev) always opens a version; a row attribute-equal to its
      // predecessor — null fields compare equal — is a no-op update
      // and is dropped (DuckDB mirror: rn=1 OR attr IS DISTINCT FROM lag)
      .filter(!(col("__prev") <=> attrs))
      .drop("__prev")
    changed
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop(tsCol)
  }

  /** Reconstruct the dimension AS OF an instant from [[scd2]] history —
    * time travel without a table format: the version effective at `at`
    * is `effective_from <= at AND (effective_to IS NULL OR
    * effective_to > at)` (half-open intervals, so snapshots at an
    * exact version boundary pick the NEW version). Pure filter: pushes
    * to the history scan, no shuffle. Because scd2's intervals
    * partition time per key, the result has at most one row per key
    * (MergeOpsSpec pins it at every instant of a hand-built history). */
  def snapshotAsOf(history: DataFrame, at: Column,
                   fromCol: String = "effective_from",
                   toCol: String = "effective_to"): DataFrame =
    history.filter(col(fromCol) <= at && (col(toCol).isNull || col(toCol) > at))

  /** Diff two snapshots of the same keyed table: one (keys...,
    * change_type) row per difference — 'I' key only in `after`, 'D' key
    * only in `before`, 'U' key in both with any `compareCols` value
    * changed (null-safe per column, so null→null is NOT a change).
    * Unchanged keys are absent. The change-feed generator for engines
    * without a native CDF: one full-outer equi-join on the key, nothing
    * else. Keys must be non-null (absence is detected via key
    * nullness on the unmatched side). */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val b = before.select((keys ++ compareCols).map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select((keys ++ compareCols).map(c => col(c).as(s"__a_$c")): _*)
    val joined = b.join(a, keys.map(k => col(s"__b_$k") === col(s"__a_$k")).reduce(_ && _), "full_outer")
    val changed = compareCols.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined
      .withColumn("change_type",
        when(col(s"__b_${keys.head}").isNull, "I")
          .when(col(s"__a_${keys.head}").isNull, "D")
          .when(changed, "U"))
      .filter(col("change_type").isNotNull)
      .select(keys.map(k => coalesce(col(s"__a_$k"), col(s"__b_$k")).as(k)) :+ col("change_type"): _*)
  }

  /** Apply a CDC feed WITH DELETES to a keyed target — the op-code
    * generalization of [[upsert]]: the LATEST change per key (by the
    * caller's total `orderBy`, descending-first like [[dedupLatest]])
    * decides the key's fate — op 'D' removes it, anything else replaces
    * it with the change row; an earlier delete followed by a later
    * upsert resurrects the key. Feed rows must carry the target's
    * columns (extra columns — the op, the ordering — are dropped on
    * output). Shuffles on the key only: one window dedup + one
    * anti-join. */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
               orderBy: Seq[Column], opCol: String = "op",
               deleteOp: String = "D"): DataFrame = {
    val latest = dedupLatest(changes, keys, orderBy)
    val cols = target.columns.map(col).toSeq
    val survivors = target.join(latest.select(keys.map(col): _*), keys, "left_anti")
    survivors.select(cols: _*)
      .unionByName(latest.filter(col(opCol) =!= deleteOp).select(cols: _*))
  }
}
