package graft

import java.time.Instant
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Decisions.Thresholds
import graft.generator.Generator
import graft.generator.Generator.RunConfig
import graft.serving.Serving
import graft.streaming.EventPipeline

/** The survey §7.3 minimum end-to-end slice — the reference's own
  * acceptance definition: deterministic generator → validation split →
  * 1-min windowed aggregation → rolling metrics → decision preview,
  * asserted against the generator's expected-action golden registry.
  */
class GoldenE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Thresholds tuned to the scenario templates' engagement mixes
    * (the analog of the reference's published p90/p40 registry). */
  private val goldenTh = Thresholds(
    velocityP90 = 2.5, viewsP40 = 8L, minViews = 10L,
    minCompletion = 0.4, maxSkip = 0.5, minClicks = 1L)

  test("generator scenarios land on their expected decisions end-to-end") {
    import spark.implicits._
    val cfg = RunConfig("golden_run", seed = 42L, totalEvents = 600,
      startAt = Instant.parse("2024-03-01T00:00:00Z"), eventsPerSecond = 10,
      lateEventRatio = 0.0)
    val out = Generator.run(cfg)

    val raw = out.events.map(_.json).toDF("raw_value")
      .withColumn("source_topic", lit("golden"))
      .withColumn("source_partition", lit(0))
      .withColumn("source_offset", monotonically_increasing_id())
    val annotated = EventPipeline.annotate(EventPipeline.parse(raw))

    // quarantine leg: exactly the invalid_burst events
    val nInvalid = annotated.filter(col("error_code").isNotNull).count()
    assert(nInvalid == out.events.count(!_.valid).toLong)

    // decision leg: valid events → rolling context keyed by video_id
    val valid = annotated.filter(col("error_code").isNull)
      .select(col("video_id"), col("ts"), col("event_type"))
      .withColumn("value", lit(0.0))
    val ctx = Serving.decisionContextFromEvents(valid, goldenTh, key = "video_id")
    val latest = ctx.withColumn("rn",
        row_number().over(Window.partitionBy(col("video_id")).orderBy(col("minute").desc)))
      .filter(col("rn") === 1)
      .select(col("video_id"), col("decision_type_preview"))

    val got = latest.as[(String, String)].collect().toMap
    val expected = out.registry.filter(_.scenario != "invalid_burst")
      .map(r => r.videoId -> r.expectedAction).toMap

    assert(got.keySet == expected.keySet,
      s"video set mismatch: got ${got.keySet}, expected ${expected.keySet}")
    expected.foreach { case (vid, want) =>
      assert(got(vid) == want,
        s"video $vid: decided ${got(vid)}, golden expects $want " +
          s"(scenario ${out.registry.find(_.videoId == vid).get.scenario})")
    }
  }
}
