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

  /** Column the event rules read the extracted JSON field from. */
  val KRawCol = "__k_raw"

  /** Project the JSON field the event rules need, ONCE. Every rule
    * predicate then references this column, so however many rules (or
    * aggregate conditions built from them) consume it, each row pays a
    * single JSON parse — get_json_object is expensive enough that
    * Catalyst keeps the projection rather than inlining it into its
    * consumers (CollapseProject's cheap-expression check). */
  def withEventFields(df: DataFrame): DataFrame =
    df.withColumn(KRawCol, get_json_object(col("props"), "$.k"))

  /** Event-contract rules for the testdata `events` table — precedence
    * mirrors the reference's 5-level error-code ladder
    * (PARSE > MISSING_FIELD > INVALID_TIMESTAMP > INVALID_TYPE > INVALID_PAYLOAD).
    * Apply to `withEventFields(events)` — predicates read the
    * pre-extracted k column, not `props`. */
  def eventRules(allowedTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error"),
                 maxK: Int = 80, maxValue: Double = 195.0): Seq[Rule] = Seq(
    Rule("E_PARSE_ERROR", col(KRawCol).isNull),
    Rule("E_INVALID_EVENT_TYPE", !col("event_type").isin(allowedTypes: _*)),
    // try_cast, NOT cast: under ANSI (Spark 4 default) a plain cast on a
    // non-numeric k would CRASH the job — the very rows a validation
    // operator exists to quarantine must never abort it
    Rule("E_K_OUT_OF_RANGE", expr(s"try_cast($KRawCol as int)") > maxK),
    Rule("E_VALUE_OUT_OF_RANGE", col("value") > maxValue))

  /** annotate ∘ withEventFields, with the helper column dropped: the
    * ready-made event-contract split input. */
  def annotateEvents(events: DataFrame,
                     rules: Seq[Rule] = eventRules()): DataFrame =
    annotate(withEventFields(events), rules).drop(KRawCol)
}
