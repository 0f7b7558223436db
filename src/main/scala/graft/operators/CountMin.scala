package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a RELATIONAL sketch table: the depth×width
  * counter matrix is a `(row, bucket, n)` DataFrame (≤ depth·width
  * rows) instead of an opaque binary blob.
  *
  * Why relational rather than a `TypedImperativeAggregate` holding a
  * dense long array (the HeavyHitters / TopKAggregate pattern):
  *  - the build is a plain explode + groupBy — map-side partial
  *    aggregation gives each task its own partial sketch and the
  *    shuffle merges them, which IS the CMS merge algebra (cell-wise
  *    add) executed by Spark's existing hash aggregate;
  *  - the sketch stays queryable/joinable (estimate = equi-join +
  *    MIN) and unions across corpora are `UNION ALL` + re-groupBy;
  *  - the counter table is bounded by depth·width regardless of input
  *    size, so it broadcasts to probes at any corpus scale.
  *
  * The row-seeded hash is the md5→60-bit-long reduction used across
  * the dedup stack (Dedup.minhashSignatures), written so a DuckDB
  * oracle reproduces it verbatim: estimates are hash-exact
  * comparable, not tolerance-checked.
  *
  * Reference baseline: the reference keeps only exact GROUP BY
  * counters (realtime-metrics-sql-pack.sql count batteries); CMS is
  * the bounded-memory swap for 100 TB streams, paired here with the
  * standard `est ≥ exact` / `est ≤ exact + εN` guarantees (ε = e/width,
  * Cormode & Muthukrishnan 2005).
  */
object CountMin {

  /** Row-seeded bucket for one hash row: first 15 md5 hex chars of
    * `"j:term"` → non-negative 60-bit long, mod width. DuckDB mirror:
    * `CAST('0x'||substr(md5(j||':'||t),1,15) AS BIGINT) % width`. */
  def bucketOf(term: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$row:"), term)), 1, 15), 16, 10).cast("long"), lit(width))

  /** Build the sketch table from an item column: one (row, bucket)
    * cell per item per hash row, counted. Output ≤ depth·width rows. */
  def build(items: DataFrame, termCol: String, depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(j =>
      struct(lit(j).as("row"), bucketOf(col(termCol), j, width).as("bucket")))
    items
      .select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.row").as("row"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates for a probe frame: min over hash rows of the
    * matching counters. Probes absent from every cell of some row
    * estimate 0 (coalesce on the left join). The sketch side is tiny
    * (≤ depth·width) — mark it broadcast so probing never shuffles
    * the probe set. */
  def estimate(sketch: DataFrame, probes: DataFrame, termCol: String,
               depth: Int, width: Int): DataFrame = {
    val probeCells = (0 until depth).map(j =>
      struct(lit(j).as("row"), bucketOf(col(termCol), j, width).as("bucket")))
    val exploded = probes
      .withColumn("cell", explode(array(probeCells: _*)))
      .select(probes.columns.map(col) :+ col("cell.row").as("row") :+ col("cell.bucket").as("bucket"): _*)
    exploded
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }
}
