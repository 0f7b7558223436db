package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic
import org.apache.spark.storage.StorageLevel

/** Single-job materialize + count for iterative operators.
  *
  * A BFS-style loop needs two things at the end of every round:
  * lineage truncation (or round N's plan nests N joins) and a
  * saturation probe (is the frontier empty?). `localCheckpoint()`
  * then `isEmpty` pays TWO job submissions per round; at local-mode
  * driver-loop grain that fixed overhead dominates small-SF graph
  * queries. Here the frame is materialized once into a persisted
  * InternalRow RDD whose `count()` IS the materializing job and
  * returns the probe answer; the returned frame is an RDD-backed
  * leaf, so lineage is truncated exactly as a localCheckpoint would.
  *
  * Lives in the org.apache.spark.sql namespace because
  * `internalCreateDataFrame` is `private[sql]` (same one-file-shim
  * practice as [[ColumnBridge]]).
  */
object DatasetBridge {
  def materializeCounted(df: DataFrame): (DataFrame, Long) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    // copy(): the scan reuses UnsafeRow buffers; caching without a copy
    // would alias every row in a partition to the last one
    val rdd = ds.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count()
    (spark.internalCreateDataFrame(rdd, ds.schema), n)
  }
}
