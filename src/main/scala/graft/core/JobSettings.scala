package graft.core

import org.apache.spark.sql.SparkSession

/** Env-overridable job settings (reference T9: every knob of the
  * streaming jobs is environment-driven via a frozen settings class,
  * rt_content_events_contract.py:27-85). `GRAFT_`-prefixed variables
  * override the defaults; unknown values fail fast at load.
  */
final case class JobSettings(
    watermark: String = "2 minutes",
    bronzeTriggerSeconds: Int = 10,
    goldTriggerSeconds: Int = 60,
    cdcTriggerSeconds: Int = 60,
    checkpointRoot: String = "/tmp/graft/checkpoints",
    bronzePath: String = "/tmp/graft/bronze",
    quarantinePath: String = "/tmp/graft/quarantine",
    goldPath: String = "/tmp/graft/gold",
    dimPath: String = "/tmp/graft/dim",
    shufflePartitions: Int = 32)

object JobSettings {

  def fromEnv(env: Map[String, String] = sys.env): JobSettings = {
    def str(k: String, d: String) = env.getOrElse(s"GRAFT_$k", d)
    def int(k: String, d: Int) = env.get(s"GRAFT_$k").map { v =>
      v.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"GRAFT_$k must be an int, got '$v'"))
    }.getOrElse(d)
    val d = JobSettings()
    JobSettings(
      watermark = str("WATERMARK", d.watermark),
      bronzeTriggerSeconds = int("BRONZE_TRIGGER_SECONDS", d.bronzeTriggerSeconds),
      goldTriggerSeconds = int("GOLD_TRIGGER_SECONDS", d.goldTriggerSeconds),
      cdcTriggerSeconds = int("CDC_TRIGGER_SECONDS", d.cdcTriggerSeconds),
      checkpointRoot = str("CHECKPOINT_ROOT", d.checkpointRoot),
      bronzePath = str("BRONZE_PATH", d.bronzePath),
      quarantinePath = str("QUARANTINE_PATH", d.quarantinePath),
      goldPath = str("GOLD_PATH", d.goldPath),
      dimPath = str("DIM_PATH", d.dimPath),
      shufflePartitions = int("SHUFFLE_PARTITIONS", d.shufflePartitions))
  }

  /** Table-format capability probe (survey §7.1: use Delta/Iceberg when
    * the jars are on the classpath, plain parquet + the upsert-sink
    * MERGE emulation otherwise — semantics are format-independent). */
  def detectTableFormat(spark: SparkSession): String = {
    def has(cls: String): Boolean =
      try { Class.forName(cls, false, spark.getClass.getClassLoader); true }
      catch { case _: Throwable => false }
    if (has("org.apache.iceberg.spark.SparkCatalog")) "iceberg"
    else if (has("io.delta.tables.DeltaTable")) "delta"
    else "parquet"
  }
}
