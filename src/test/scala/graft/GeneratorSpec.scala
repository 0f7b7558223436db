package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.generator.Generator
import graft.generator.Generator._

/** Generator determinism + property bounds (reference tests layer 2:
  * test_deterministic_ids, test_scenario_planner, test_late_events). */
class GeneratorSpec extends AnyFunSuite {

  private val cfg = RunConfig("run_42", seed = 42L, totalEvents = 600,
    startAt = Instant.parse("2024-03-01T00:00:00Z"), eventsPerSecond = 10)

  test("same config => byte-identical output; seed change => different") {
    val a = Generator.run(cfg)
    val b = Generator.run(cfg)
    assert(a.events.map(_.json) == b.events.map(_.json))
    assert(a.registry == b.registry)
    val c = Generator.run(cfg.copy(seed = 43L))
    assert(a.events.map(_.json) != c.events.map(_.json))
    val d = Generator.run(cfg.copy(runId = "run_43"))
    assert(a.events.map(_.eventId) != d.events.map(_.eventId))
  }

  test("apportionment is exact and largest-remainder") {
    assert(apportion(600, Scenarios.map(_.mix)).sum == 600)
    assert(apportion(7, Seq(0.5, 0.5)) == Seq(4, 3))
    assert(apportion(10, Seq(0.55, 0.2, 0.1, 0.1, 0.05)).sum == 10)
    assert(apportion(0, Seq(1.0)) == Seq(0))
  }

  test("scenario counts match apportionment exactly (mix error 0)") {
    val out = Generator.run(cfg)
    val counts = out.events.groupBy(_.scenario).view.mapValues(_.size).toMap
    val expected = Scenarios.map(_.name).zip(apportion(600, Scenarios.map(_.mix))).toMap
    assert(counts == expected)
    assert(Generator.mixWithinTolerance(out))
  }

  test("late events: count = round(ratio*total), offsets in [121,210] s") {
    val out = Generator.run(cfg.copy(lateEventRatio = 0.1))
    val late = out.events.filter(_.late)
    assert(late.size == 60)
    late.foreach { e =>
      val slot = out.events.indexOf(e) // slow but fine at 600
      val base = cfg.startAt.plusSeconds(out.events.indexWhere(_.eventId == e.eventId) / 10)
      val off = java.time.Duration.between(e.eventTimestamp, base).getSeconds
      assert(off >= 121 && off <= 210, s"late offset $off out of bounds")
    }
  }

  test("ids are deterministic, prefixed, and monotone-unique") {
    val ids = (0 until 100).map(i => Generator.eventId("r", i))
    assert(ids.distinct.size == 100)
    assert(ids.forall(_.startsWith("evt_")))
    assert(Generator.videoId("r", 0).startsWith("vid_") && Generator.userId("r", 0).startsWith("usr_"))
    assert(Generator.eventId("r", 0) == Generator.eventId("r", 0))
  }

  test("invalid_burst events serialize as the malformed variant") {
    val out = Generator.run(cfg)
    val bad = out.events.filter(!_.valid)
    assert(bad.nonEmpty)
    assert(bad.forall(_.json.contains("bad-timestamp")))
    assert(bad.forall(_.json.contains("{not-valid-json")))
  }

  test("cdc messages: one create + one update per registry row, update ts +60s") {
    val out = Generator.run(cfg)
    val msgs = Generator.cdcMessages(cfg, out.registry)
    assert(msgs.size == out.registry.size * 2)
    assert(msgs.count(_.contains(""""op":"c"""")) == out.registry.size)
    assert(msgs.count(_.contains("_u")) >= out.registry.size)
  }

  test("artifacts: run manifest + expected actions + replay JSONL round-trip") {
    val spark = TestSpark.spark
    val out = Generator.run(cfg)
    val dir = java.nio.file.Files.createTempDirectory("graft_artifacts").toString
    graft.generator.Artifacts.write(spark, dir, cfg, out)
    val manifest = spark.read.parquet(s"$dir/run_manifest").collect()
    assert(manifest.length == 1 && manifest(0).getAs[String]("run_id") == cfg.runId)
    val expected = spark.read.parquet(s"$dir/expected_actions")
    assert(expected.count() == Scenarios.size.toLong)
    val replayed = spark.read.json(s"$dir/events_jsonl")
    assert(replayed.count() == cfg.totalEvents.toLong)
  }

  test("generated events flow through the streaming pipeline: invalid_burst quarantined") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Generator.run(cfg)
    val raw = out.events.map(_.json).toDF("raw_value")
      .withColumn("source_topic", org.apache.spark.sql.functions.lit("gen"))
      .withColumn("source_partition", org.apache.spark.sql.functions.lit(0))
      .withColumn("source_offset", org.apache.spark.sql.functions.monotonically_increasing_id())
    val annotated = graft.streaming.EventPipeline.annotate(graft.streaming.EventPipeline.parse(raw))
    val nInvalid = annotated.filter(org.apache.spark.sql.functions.col("error_code").isNotNull).count()
    assert(nInvalid == out.events.count(!_.valid))
  }
}
