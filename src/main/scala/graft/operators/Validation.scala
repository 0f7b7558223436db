package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contract validation + quarantine split (reference
  * rt_content_events_validation.py:26-91, rt_video_cdc_upsert.py:148-210).
  *
  * Pattern: annotate every row with a nullable `error_code` via a
  * first-match precedence CASE chain, then split the one annotated
  * DataFrame with two filters (`error_code IS NULL` vs NOT NULL).
  * Single pass, no UDFs — the whole chain stays inside whole-stage
  * codegen and is computed once per row at any scale.
  */
object Validation {

  /** A validation rule: first matching rule (in order) wins the error code. */
  final case class Rule(errorCode: String, predicate: Column)

  final case class Split(valid: DataFrame, invalid: DataFrame)

  /** Annotate with first-match error_code (null = valid). */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val chain = rules.reverse.foldLeft(lit(null).cast("string")) { (els, r) =>
      when(r.predicate, lit(r.errorCode)).otherwise(els)
    }
    df.withColumn("error_code", chain)
  }

  def split(df: DataFrame, rules: Seq[Rule]): Split = {
    val annotated = annotate(df, rules)
    Split(
      valid = annotated.filter(col("error_code").isNull).drop("error_code"),
      invalid = annotated.filter(col("error_code").isNotNull))
  }

  /** Event-contract rules for the testdata `events` table — precedence
    * mirrors the reference's 5-level error-code ladder
    * (PARSE > MISSING_FIELD > INVALID_TIMESTAMP > INVALID_TYPE > INVALID_PAYLOAD). */
  def eventRules(allowedTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error"),
                 maxK: Int = 80, maxValue: Double = 195.0): Seq[Rule] = Seq(
    Rule("E_PARSE_ERROR", get_json_object(col("props"), "$.k").isNull),
    Rule("E_INVALID_EVENT_TYPE", !col("event_type").isin(allowedTypes: _*)),
    // try_cast, NOT cast: under ANSI (Spark 4 default) a plain cast on a
    // non-numeric k would CRASH the job — the very rows a validation
    // operator exists to quarantine must never abort it
    Rule("E_K_OUT_OF_RANGE", expr("try_cast(get_json_object(props, '$.k') as int)") > maxK),
    Rule("E_VALUE_OUT_OF_RANGE", col("value") > maxValue))
}
