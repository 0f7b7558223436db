package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scale (the reference's hidden-partitioning
  * contracts re-expressed for plain-parquet + catalog tables):
  * date-partitioned facts, bucketed join keys, sorted-within-partition
  * files for clustering.
  */
object Layout {

  /** Write a fact date-partitioned (partition pruning for every bounded
    * time predicate) and sorted within partitions by the given cols
    * (parquet min/max page skipping — the reference's sort-before-append). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           sortCols: Seq[String] = Nil): Unit = {
    val withDate = df.withColumn("__date", to_date(col(tsCol)))
    val sorted = if (sortCols.isEmpty) withDate
      // __date must LEAD the local sort: the partitioned write requires
      // ordering on the partition column, and without it FileFormatWriter
      // inserts its own sort on top — doubled work, and a spill there
      // interleaves the sortCols clustering this function promises
      else withDate.sortWithinPartitions(("__date" +: sortCols).map(col): _*)
    sorted.write.mode(SaveMode.Overwrite).partitionBy("__date").parquet(path)
  }

  /** Save as a bucketed catalog table: joins/aggregations on the bucket
    * key become shuffle-free between co-bucketed tables (requires
    * saveAsTable — bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int = 16): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Verify bucketed join is shuffle-free (test/diagnostic helper):
    * true iff the physical plan has no Exchange above either scan. */
  def isShuffleFreeJoin(spark: SparkSession, leftTable: String, rightTable: String,
                        key: String): Boolean = {
    val plan = spark.table(leftTable).join(spark.table(rightTable), key)
      .queryExecution.executedPlan.toString()
    !plan.contains("Exchange hashpartitioning")
  }
}
