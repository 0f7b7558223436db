package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.functions.Decisions.Thresholds
import graft.serving.{BaselineRegistry, Serving}

class BaselineRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("seed resolves to the compile-time threshold defaults") {
    val th = BaselineRegistry.thresholds(BaselineRegistry.seed(spark), "graft_rules_v1", "2026-06-01")
    assert(th == Thresholds())
  }

  test("registry-driven decisions == literal-threshold decisions") {
    val events = Tables(spark, dir, "events")
    val th = BaselineRegistry.thresholds(BaselineRegistry.seed(spark), "graft_rules_v1", "2026-06-01")
    val viaRegistry = Serving.decisionContextFromEvents(events, th)
      .groupBy("decision_type_preview").agg(count(lit(1)).as("n"))
      .orderBy("decision_type_preview").collect().map(_.toSeq).toSeq
    val viaLiterals = Serving.decisionContextFromEvents(events)
      .groupBy("decision_type_preview").agg(count(lit(1)).as("n"))
      .orderBy("decision_type_preview").collect().map(_.toSeq).toSeq
    assert(viaRegistry == viaLiterals)
  }

  test("latest-effective-date resolution: a newer generation wins, a future one does not") {
    val ctx = Serving.decisionContextFromEvents(Tables(spark, dir, "events"))
    val v2 = BaselineRegistry.computeFromContext(ctx, "graft_rules_v1", "2026-02-01", "2026-02-01 00:00:00")
    val reg = BaselineRegistry.publish(BaselineRegistry.seed(spark), v2)
    val atMarch = BaselineRegistry.resolveThresholds(reg, "graft_rules_v1", "2026-03-01").head()
    assert(atMarch.getAs[java.sql.Date]("effective_from").toString == "2026-02-01")
    val atJan = BaselineRegistry.resolveThresholds(reg, "graft_rules_v1", "2026-01-15").head()
    assert(atJan.getAs[java.sql.Date]("effective_from").toString == "2026-01-01")
    assert(atJan.getAs[Double]("velocity_p90") == 0.6)
  }

  test("publish is idempotent on (rule_version, effective_from)") {
    val seed = BaselineRegistry.seed(spark)
    val twice = BaselineRegistry.publish(seed, BaselineRegistry.seed(spark))
    assert(twice.count() == seed.count())
  }

  test("publish guard rejects non-fallback rows below the sample floor") {
    val low = BaselineRegistry.seed(spark).withColumn("sample_size", lit(10L))
    val ex = intercept[IllegalStateException] {
      BaselineRegistry.publish(BaselineRegistry.seed(spark), low)
    }
    assert(ex.getMessage.contains("publish guard"))
    // the same rows marked fallback are accepted (reference fallback path)
    val fallback = low.withColumn("is_fallback", lit(true))
      .withColumn("effective_from", to_date(lit("2026-05-01")))
    assert(BaselineRegistry.publish(BaselineRegistry.seed(spark), fallback).count() == 8)
  }
}
