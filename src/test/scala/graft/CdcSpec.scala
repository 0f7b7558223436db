package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CdcPipeline

/** CDC fixture battery (reference emit_mic43_cdc_mixed_fixture.py:36-80):
  * valid create, broken JSON, unsupported op=d, missing fields, stale
  * ts_ms — assert quarantine codes and the expected final dim state. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cdc(op: String, tsMs: Long, vid: String, category: String,
                  status: String = "active"): String =
    s"""{"op":"$op","ts_ms":$tsMs,"schema_version":"m1_v1","after":{"video_id":"$vid","category":"$category","region":"US","upload_time":"2024-01-01T00:00:00Z","status":"$status"}}"""

  test("mixed fixture: quarantine codes + latest-wins final state incl. cross-batch stale") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[String]
    val dir = Files.createTempDirectory("graft_cdc").toString
    val raw = events.toDF()
      .select(col("value").as("raw_value"))
      .withColumn("source_topic", lit("cdc.videos"))
      .withColumn("source_partition", lit(0))
      .withColumn("source_offset", xxhash64(col("raw_value")))
    val qs = CdcPipeline.start(spark, raw, s"$dir/ckpt", s"$dir/quarantine", s"$dir/dim",
      trigger = Trigger.ProcessingTime(0))

    // batch 1: bootstrap + update + invalid battery
    events.addData(
      cdc("c", 1000L, "v1", "comedy"),
      cdc("u", 2000L, "v1", "comedy_u"),          // newer update wins
      cdc("c", 1000L, "v2", "gaming"),
      "not-json-{mic43",                          // CDC_PARSE_ERROR
      """{"ts_ms":5,"schema_version":"m1_v1","after":{"video_id":"vx"}}""", // CDC_MISSING_OP
      cdc("d", 3000L, "v1", "comedy_d"),          // CDC_UNSUPPORTED_OP
      """{"op":"c","schema_version":"m1_v1","after":{"video_id":"vy"}}""",  // CDC_MISSING_TS_MS
      """{"op":"c","ts_ms":7,"after":{"video_id":"vz"}}""",                  // CDC_MISSING_SCHEMA_VERSION
      """{"op":"c","ts_ms":8,"schema_version":"m1_v1","after":{"category":"x"}}""") // CDC_MISSING_AFTER_VIDEO_ID
    qs.foreach(_.processAllAvailable())

    val dim1 = spark.read.parquet(s"$dir/dim")
      .select("video_id", "category", "ts_ms").as[(String, String, Long)].collect()
      .map { case (k, c, t) => k -> ((c, t)) }.toMap
    assert(dim1 == Map("v1" -> (("comedy_u", 2000L)), "v2" -> (("gaming", 1000L))))

    val codes = spark.read.parquet(s"$dir/quarantine")
      .select("error_code").as[String].collect().sorted.toSeq
    assert(codes == Seq("CDC_MISSING_AFTER_VIDEO_ID", "CDC_MISSING_OP", "CDC_MISSING_SCHEMA_VERSION",
      "CDC_MISSING_TS_MS", "CDC_PARSE_ERROR", "CDC_UNSUPPORTED_OP"))

    // batch 2: stale update for v1 (ts 1500 < merged 2000) must LOSE
    events.addData(cdc("u", 1500L, "v1", "comedy_stale"))
    qs.foreach(_.processAllAvailable())
    qs.foreach(_.stop())
    val dim2 = spark.read.parquet(s"$dir/dim")
      .select("video_id", "category").as[(String, String)].collect().toMap
    assert(dim2("v1") == "comedy_u", "stale cross-batch update must lose the merge")
  }
}
