package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.MergeOps

/** foreachBatch MERGE sink over plain parquet (reference T6: micro-batch
  * `MERGE INTO` per batch; Delta/Iceberg merge-on-read in production,
  * full-rewrite + atomic directory swap here — same SEMANTICS, so the
  * streaming contract is testable without a table format on the
  * classpath. Documented non-concurrent: one writer per table path).
  *
  * Batch emptiness is checked with `isEmpty` (one partition probe), not
  * the reference's `df.count()` which recomputes the whole batch.
  */
class ParquetUpsertSink(spark: SparkSession, tablePath: String, keys: Seq[String],
                        orderBy: Seq[String]) extends Serializable {

  private val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(tablePath))

  def read(): DataFrame = spark.read.parquet(tablePath)

  /** MERGE one micro-batch: latest-wins on `keys` ordered by `orderBy`
    * DESC — across the STORED snapshot too (union + dedup-latest), so a
    * stale row arriving in a later batch loses against what's already
    * merged (CDC "stale ts must lose" contract). Counter columns are
    * OVERWRITTEN, not incremented — replay-safe under update-mode
    * re-emission (reference T4 contract). */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val ord = orderBy.map(col(_).desc)
    val merged =
      if (!exists) MergeOps.dedupLatest(batch, keys, ord)
      else MergeOps.dedupLatest(read().unionByName(batch.select(read().columns.map(col).toSeq: _*)), keys, ord)
    val tmp = new Path(tablePath + s"__tmp_$batchId")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dest = new Path(tablePath)
    val old = new Path(tablePath + s"__old_$batchId")
    if (fs.exists(dest)) fs.rename(dest, old)
    fs.rename(tmp, dest)
    if (fs.exists(old)) fs.delete(old, true)
  }

  def foreachBatchFn: (DataFrame, Long) => Unit = (df, id) => merge(df, id)
}

/** Watermark-drop observability (reference T7): collects
  * numRowsDroppedByWatermark across progress events. */
class DropRatioListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  @volatile var rowsDropped: Long = 0L
  @volatile var inputRows: Long = 0L

  override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
    inputRows += e.progress.numInputRows
    e.progress.stateOperators.foreach(so => rowsDropped += so.numRowsDroppedByWatermark)
  }

  def dropRatio: Double = if (inputRows == 0) 0.0 else rowsDropped.toDouble / inputRows
}
