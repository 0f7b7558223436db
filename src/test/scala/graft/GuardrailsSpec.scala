package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.plans.{GuardrailViolation, ServingGuardrails}
import graft.serving.Serving

class GuardrailsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def registered(): Unit =
    Serving.registerViews(spark, Tables(spark, "/root/testdata/sf0.001", "events"))

  test("unbounded serving-view scan is rejected") {
    registered()
    val plan = spark.sql("SELECT * FROM v_decision_context_30m_1m").queryExecution.analyzed
    val ex = intercept[GuardrailViolation](ServingGuardrails.check(plan))
    assert(ex.getMessage.contains("no event-time bound"))
  }

  test("time-bounded scan passes (the anchor pattern)") {
    registered()
    val plan = spark.sql(
      """WITH anchor AS (SELECT max(minute) AS m FROM v_decision_context_30m_1m)
        |SELECT * FROM v_decision_context_30m_1m CROSS JOIN anchor
        |WHERE minute >= m - INTERVAL 30 MINUTES""".stripMargin).queryExecution.analyzed
    ServingGuardrails.check(plan) // must not throw
  }

  test("fact-to-fact join between different serving views is rejected") {
    registered()
    val plan = spark.sql(
      """SELECT * FROM v_decision_context_30m_1m a
        |JOIN v_stats_1min b ON a.user_id = b.user_id
        |WHERE a.minute >= TIMESTAMP '2024-01-01'""".stripMargin).queryExecution.analyzed
    val ex = intercept[GuardrailViolation](ServingGuardrails.check(plan))
    assert(ex.getMessage.contains("read-time join"))
  }

  test("non-serving queries are untouched") {
    val plan = Tables(spark, "/root/testdata/sf0.001", "orders")
      .groupBy("o_orderstatus").count().queryExecution.analyzed
    ServingGuardrails.check(plan)
  }

  test("extension wiring injects the check rule without error") {
    // buildCheckRules is private[sql]; assert the injection itself works
    val ext = new graft.plans.GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // throws if injectCheckRule signature drifts
    registered()
    // a row-returning unbounded read violates; scalar aggregates (count,
    // anchors) are the sanctioned exemption
    val bad = spark.sql("SELECT user_id FROM v_decision_context_30m_1m").queryExecution.analyzed
    assert(intercept[GuardrailViolation](ServingGuardrails.check(bad)).getMessage.contains("guardrail"))
    ServingGuardrails.check(
      spark.sql("SELECT count(*) FROM v_decision_context_30m_1m").queryExecution.analyzed)
  }

  test("GraftFunctions.registerAll: full SQL surface + rule in one call, idempotent") {
    val s2 = TestSpark.spark.newSession()
    graft.plans.GraftFunctions.registerAll(s2)
    graft.plans.GraftFunctions.registerAll(s2) // second call must not double-add the rule
    import org.apache.spark.sql.functions._
    val r = s2.sql("SELECT ascii_tokens('A b1') t, md5_long('x') h, dot_product(array(1.0D), array(2.0D)) d")
      .collect().head
    assert(r.getSeq[String](0) == Seq("a", "b1") && r.getDouble(2) == 2.0)
    assert(s2.experimental.extraOptimizations.count(_ eq graft.plans.BinnedIntervalJoin) == 1)
  }

  test("registerAll on an extensions-built session does not add the rule a second time") {
    import org.apache.spark.sql.SparkSession
    val prev = TestSpark.spark
    // getOrCreate returns the existing session (ignoring withExtensions)
    // unless the active/default slots are cleared; restored in finally
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s3 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      // the extension already injected the rule (Spark places injected
      // optimizer rules in its operator-optimization batches itself);
      // registerAll must detect it there — not only in
      // extraOptimizations — and add NOTHING on top
      def ruleCount = s3.sessionState.optimizer.batches
        .flatMap(_.rules).count(_ eq graft.plans.BinnedIntervalJoin)
      val before = ruleCount
      assert(before >= 1, "extension wiring should have injected the rule")
      graft.plans.GraftFunctions.registerAll(s3)
      assert(ruleCount == before,
        s"registerAll re-added the extension-injected rule ($before -> $ruleCount)")
      assert(s3.experimental.extraOptimizations.isEmpty)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

}
