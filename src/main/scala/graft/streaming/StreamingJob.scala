package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Multi-sink fan-out job (reference T5): one parsed/annotated stream →
  * bronze append, quarantine append, gold windowed MERGE — each query
  * with its own checkpoint directory and trigger cadence, exactly the
  * reference's per-sink isolation contract (checkpoint naming
  * spark-realtime-jobs-contract-m1.md:103-119).
  */
final case class StreamingJobConfig(
    checkpointRoot: String,
    bronzePath: String,
    quarantinePath: String,
    goldPath: String,
    watermark: String = "2 minutes",
    bronzeTrigger: Trigger = Trigger.ProcessingTime("10 seconds"),
    goldTrigger: Trigger = Trigger.ProcessingTime("1 minute"),
    /** Default TRUE — dropDuplicatesWithinWatermark, so gold dedup state
      * expires with the watermark instead of growing with every event-id
      * ever seen (the only viable stance for an unbounded stream). Set
      * false for the reference's exact dropDuplicates semantics (a dup
      * arriving arbitrarily late is still dropped, at unbounded state
      * cost). */
    boundedDedupState: Boolean = true)

final case class StreamingJob(bronze: StreamingQuery, quarantine: StreamingQuery,
                              gold: StreamingQuery) {
  def all: Seq[StreamingQuery] = Seq(bronze, quarantine, gold)
  def processAllAvailable(): Unit = all.foreach(_.processAllAvailable())
  def stopAll(): Unit = all.foreach(_.stop())
}

object StreamingJob {

  /** Wire the three sinks onto a raw streaming DataFrame
    * (raw_value/source_topic/source_partition/source_offset). */
  def start(spark: SparkSession, raw: DataFrame, cfg: StreamingJobConfig): StreamingJob = {
    val annotated = EventPipeline.annotate(EventPipeline.parse(raw))

    val bronzeQ = EventPipeline.bronze(annotated).writeStream
      .format("parquet")
      .option("path", cfg.bronzePath)
      .option("checkpointLocation", s"${cfg.checkpointRoot}/bronze")
      .trigger(cfg.bronzeTrigger)
      .outputMode("append")
      .start()

    val quarantineQ = EventPipeline.quarantine(annotated).writeStream
      .format("parquet")
      .option("path", cfg.quarantinePath)
      .option("checkpointLocation", s"${cfg.checkpointRoot}/quarantine")
      .trigger(cfg.bronzeTrigger)
      .outputMode("append")
      .start()

    val goldSink = new ParquetUpsertSink(spark, cfg.goldPath,
      keys = Seq("user_id", "window_start"), orderBy = Seq("processed_at"))
    val goldQ = EventPipeline.goldAggregate(annotated, cfg.watermark, cfg.boundedDedupState).writeStream
      .foreachBatch(goldSink.foreachBatchFn)
      .option("checkpointLocation", s"${cfg.checkpointRoot}/gold")
      .trigger(cfg.goldTrigger)
      .outputMode("update")
      .start()

    StreamingJob(bronzeQ, quarantineQ, goldQ)
  }
}
