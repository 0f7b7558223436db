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

  /** Morton/Z-order interleave of two non-negative integer columns
    * (`bits` low bits each): bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1, so sorting by the result clusters BOTH dimensions at
    * once. Disjoint bit positions mean the terms sum (≡ bitwise OR) —
    * pure codegen'd integer arithmetic, reproducible on any engine.
    * Callers bucket/rank real values into the integer domain first
    * (ntile, hashBucket, epoch-day — anything monotone). */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order clustering: range-partition by the interleaved key into
    * `files` output units, sorted within each — every file then covers a
    * compact rectangle in (a, b) space, so parquet min/max stats skip on
    * EITHER predicate column. The multi-dimensional generalization of
    * sort-by-one-column layout (which gives perfect skipping on one
    * dimension and none on the other); the standard OPTIMIZE ZORDER BY
    * maintenance op re-expressed as repartitionByRange + local sort. */
  def clusterByZ(df: DataFrame, aCol: String, bCol: String,
                 files: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  final case class CompactionStats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Small-file compaction — the lakehouse OPTIMIZE/maintenance analog
    * for a plain-parquet directory. Streaming appends (e.g. the bronze
    * sink's per-micro-batch files) accumulate files far below the
    * ideal scan unit; each scan task then pays open/footer overhead per
    * tiny file and the NameNode/listing cost grows unbounded. This
    * rewrites the directory into ceil(totalBytes/targetBytes) files and
    * swaps it in with the same checked two-rename pattern as
    * ParquetUpsertSink (crash between renames leaves the old snapshot
    * parked at `<path>.compact.old`; rerunning recovers it).
    *
    * Unpartitioned directories only (compact each partition directory
    * of a partitioned table separately — that is also the unit a real
    * table service parallelizes over). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): CompactionStats = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.recoverParked(fs, dest, ".compact.old")
    if (!fs.exists(dest)) return CompactionStats(0, 0, 0L)

    def dataFiles() = fs.listStatus(dest)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // already compact (covers the empty directory too): a steady-state
    // maintenance loop must no-op, not rewrite every table every run
    if (before.length <= nOut) return CompactionStats(before.length, before.length, bytes)

    AtomicSwap.swap(fs, dest,
      tmp = new Path(path + ".compact.tmp"),
      old = new Path(path + ".compact.old")) { tmp =>
      fs.delete(tmp, true)
      spark.read.parquet(path).repartition(nOut)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    CompactionStats(before.length, dataFiles().length, bytes)
  }
}
