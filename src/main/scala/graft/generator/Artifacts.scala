package graft.generator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Run artifacts (reference S11 + qa layer, m1-data-model-v1.md:229-284):
  * `qa.run_manifest` (one audit row per simulation run) and
  * `qa.expected_actions` (the decision ground truth, joinable on
  * run_id + video_id) written as parquet.
  */
object Artifacts {

  def runManifest(spark: SparkSession, cfg: Generator.RunConfig,
                  out: Generator.RunOutput): DataFrame = {
    import spark.implicits._
    val mixJson = Generator.Scenarios
      .map(s => s""""${s.name}":${s.mix}""").mkString("{", ",", "}")
    Seq((
      cfg.runId, cfg.seed, cfg.totalEvents, cfg.eventsPerSecond,
      cfg.lateEventRatio, java.sql.Timestamp.from(cfg.startAt), mixJson,
      out.events.count(_.valid).toLong, out.events.count(!_.valid).toLong))
      .toDF("run_id", "seed", "total_events", "events_per_second",
        "late_event_ratio", "start_at", "scenario_mix_json",
        "n_valid_events", "n_invalid_events")
  }

  def expectedActions(spark: SparkSession, cfg: Generator.RunConfig,
                      out: Generator.RunOutput): DataFrame = {
    import spark.implicits._
    out.registry.map(r =>
        (cfg.runId, r.videoId, r.scenario, r.category, r.uploadAgeMinutes, r.expectedAction))
      .toDF("run_id", "video_id", "scenario", "category", "upload_age_minutes", "expected_action")
  }

  /** Write the full artifact set under `outDir` (parquet per table +
    * the raw event JSONL for replay). */
  def write(spark: SparkSession, outDir: String, cfg: Generator.RunConfig,
            out: Generator.RunOutput): Unit = {
    import spark.implicits._
    runManifest(spark, cfg, out).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/run_manifest")
    expectedActions(spark, cfg, out).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/expected_actions")
    // driver-side index, NOT monotonically_increasing_id: the latter
    // encodes the partition id, so the same seed+config would emit
    // different offsets under different parallelism — breaking the
    // generator's byte-identical-replay contract
    out.events.map(_.json).zipWithIndex.map { case (j, i) => (j, i.toLong) }
      .toDF("raw_value", "source_offset")
      .write.mode(SaveMode.Overwrite).json(s"$outDir/events_jsonl")
  }
}
