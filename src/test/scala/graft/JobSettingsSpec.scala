package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.JobSettings

class JobSettingsSpec extends AnyFunSuite {

  test("defaults when env empty") {
    val s = JobSettings.fromEnv(Map.empty)
    assert(s.watermark == "2 minutes" && s.bronzeTriggerSeconds == 10 && s.shufflePartitions == 32)
  }

  test("env overrides take effect") {
    val s = JobSettings.fromEnv(Map(
      "GRAFT_WATERMARK" -> "5 minutes",
      "GRAFT_GOLD_TRIGGER_SECONDS" -> "30",
      "GRAFT_GOLD_PATH" -> "/data/gold"))
    assert(s.watermark == "5 minutes" && s.goldTriggerSeconds == 30 && s.goldPath == "/data/gold")
    assert(s.bronzeTriggerSeconds == 10)
  }

  test("malformed int fails fast") {
    val ex = intercept[IllegalArgumentException](
      JobSettings.fromEnv(Map("GRAFT_SHUFFLE_PARTITIONS" -> "lots")))
    assert(ex.getMessage.contains("GRAFT_SHUFFLE_PARTITIONS"))
  }

  test("table format detection falls back to parquet on this classpath") {
    // neither Delta nor Iceberg jars ship in /opt/spark/jars here
    assert(JobSettings.detectTableFormat(TestSpark.spark) == "parquet")
  }
}
