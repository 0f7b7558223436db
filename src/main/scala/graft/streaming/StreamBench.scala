package graft.streaming

import java.nio.file.{Files, Paths}
import java.time.Instant
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.generator.Generator

/** Streaming-throughput micro-bench: the generator's SLO-shaped event
  * stream (120 ev/s clock slots, 2% late events, invalid bursts —
  * Generator.RunConfig defaults mirroring BASELINE.md's generator run)
  * driven through the FULL 3-sink fan-out (parse → validate → bronze
  * append + quarantine append + windowed gold MERGE), measuring
  * events/s and per-micro-batch latency. The reference publishes
  * streaming SLOs (P95 end-to-end < 3 min at 120 ev/s) rather than
  * batch sec/query; this makes the analog measurable on this engine.
  *
  * Source is a JSONL file directory with `maxFilesPerTrigger=1` (one
  * generated chunk per micro-batch), NOT MemoryStream: a fan-out's
  * three queries each need their own source offsets, and a shared
  * MemoryStream instance tracks a single commit cursor — the faster
  * sink commits chunk N before the slower sink commits chunk 0 and the
  * source throws "offsets committed out of order". File sources give
  * every query an independent source from the same directory (the
  * production S1 shape), and the per-file batching advances the
  * watermark chunk by chunk so late-event drops behave as they would
  * live. */
final case class StreamBenchResult(
    nEvents: Long,
    elapsedSec: Double,
    eventsPerSec: Double,
    nBatches: Int,
    maxBatchSec: Double,
    bronzeRows: Long,
    quarantineRows: Long,
    goldRows: Long,
    dropRatio: Double,
    lateRatioConfigured: Double,
    /** Per stateful micro-batch, in batch order: total state-store
      * rows and bytes summed across the gold query's state operators
      * (dedup + window agg) — the state-GROWTH probe: with watermark
      * eviction these plateau at horizon content; without, they grow
      * with the whole history. */
    stateRowsPerBatch: Seq[Long] = Seq.empty,
    stateMemPerBatch: Seq[Long] = Seq.empty)

object StreamBench {

  /** Run the fan-out over `totalEvents` generated events split into
    * `chunks` JSONL files (one micro-batch each per sink). */
  def run(spark: SparkSession, totalEvents: Int = 24000, chunks: Int = 8): StreamBenchResult = {
    val cfg = Generator.RunConfig("streambench", seed = 7L, totalEvents = totalEvents,
      startAt = Instant.parse("2024-01-01T00:00:00Z"))
    val out = Generator.run(cfg)
    runRaw(spark, out.events.map(_.json), chunks, totalEvents, cfg.lateEventRatio)
  }

  /** Drive the same 3-sink fan-out over caller-built JSONL event lines
    * — the state-scale probe's entry: the caller controls key
    * cardinality and event-time span directly (the generator's
    * registry fixes one video per scenario, far too few keys to
    * exercise state growth). */
  def runRaw(spark: SparkSession, jsons: Seq[String], chunks: Int,
             totalEvents: Int, lateRatioConfigured: Double): StreamBenchResult = {
    val dir = Files.createTempDirectory("graft_streambench").toString
    val inDir = Paths.get(dir, "in")
    Files.createDirectories(inDir)
    val chunkSize = math.max(1, jsons.size / chunks)
    jsons.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(inDir.resolve(f"chunk-$i%04d.jsonl"), chunk.mkString("\n").getBytes("UTF-8"))
    }

    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(inDir.toString)
      .select(col("value").as("raw_value"))
      .withColumn("source_topic", lit("bench_topic"))
      .withColumn("source_partition", lit(0))
      .withColumn("source_offset", xxhash64(col("raw_value")))
    val jobCfg = StreamingJobConfig(
      checkpointRoot = s"$dir/ckpt", bronzePath = s"$dir/bronze",
      quarantinePath = s"$dir/quarantine", goldPath = s"$dir/gold",
      bronzeTrigger = Trigger.ProcessingTime(0),
      goldTrigger = Trigger.ProcessingTime(0))

    // metrics come from each query's OWN recentProgress ring (read
    // synchronously after processAllAvailable), not a
    // StreamingQueryListener: listener events are dispatched async on
    // the bus, so a trailing progress event — often the one recording
    // the watermark drops — could be missed at read time. Same
    // stateful-only denominator rule as DropRatioListener.
    val job = StreamingJob.start(spark, raw, jobCfg)
    try {
      val t0 = System.nanoTime()
      job.processAllAvailable()
      val elapsed = (System.nanoTime() - t0) / 1e9
      val progresses = job.all.flatMap(_.recentProgress.toSeq)
      val batchDurations = progresses
        .filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").toDouble / 1e3)
      val stateful = progresses.filter(_.stateOperators.nonEmpty)
      val statefulInput = stateful.map(_.numInputRows).sum
      val dropped = stateful.flatMap(_.stateOperators.toSeq).map(_.numRowsDroppedByWatermark).sum
      val statefulByBatch = stateful.sortBy(_.batchId)

      val bronzeRows = spark.read.parquet(s"$dir/bronze").count()
      val quarantineRows = spark.read.parquet(s"$dir/quarantine").count()
      val goldRows = spark.read.parquet(s"$dir/gold").count()
      StreamBenchResult(
        nEvents = totalEvents.toLong,
        elapsedSec = elapsed,
        eventsPerSec = totalEvents / elapsed,
        nBatches = batchDurations.size,
        maxBatchSec = if (batchDurations.nonEmpty) batchDurations.max else 0.0,
        bronzeRows = bronzeRows,
        quarantineRows = quarantineRows,
        goldRows = goldRows,
        dropRatio = if (statefulInput == 0) 0.0 else dropped.toDouble / statefulInput,
        lateRatioConfigured = lateRatioConfigured,
        stateRowsPerBatch =
          statefulByBatch.map(_.stateOperators.toSeq.map(_.numRowsTotal).sum).toSeq,
        stateMemPerBatch =
          statefulByBatch.map(_.stateOperators.toSeq.map(_.memoryUsedBytes).sum).toSeq)
    } finally {
      // a throw anywhere above must not leak three running streaming
      // queries into the caller's (shared) session
      job.stopAll()
    }
  }
}
