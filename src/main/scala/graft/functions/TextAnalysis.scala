package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristic,
  * document fingerprinting. All pure Column expressions (codegen'd, no
  * UDFs) so they run at parquet-scan throughput on any cluster size.
  *
  * Functions that consume an array column take the column NAME (they
  * are built with SQL lambda expressions); materialize the array first
  * with `withColumn` — that also lets Catalyst reuse the tokenization
  * across downstream expressions instead of re-tokenizing per use.
  */
object TextAnalysis {

  /** Lowercased alphanumeric word tokens. Semantics =
    * `regexp_extract_all(lower(text), '[a-z0-9]+')`, executed by the
    * codegen'd byte-scan expression (plans.AsciiTokens — equivalence
    * proven for all inputs and property-tested); the regex formulation
    * stays available as [[tokensRegex]] for cross-checks. */
  def tokens(textCol: String): Column =
    graft.plans.TextExpressions.asciiTokens(col(textCol))

  /** Reference regex formulation of [[tokens]] (slow path, spec twin). */
  def tokensRegex(textCol: String): Column =
    expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")

  def tokenCount(tokensCol: String): Column = size(col(tokensCol))

  /** Word n-gram shingles over a token-array column (1-based element_at).
    * Guarded: Spark's sequence(1, k) runs DESCENDING for k<1, so an
    * unguarded short doc would yield inverted garbage instead of []. */
  def shingles(tokensCol: String, n: Int = 3): Column = {
    val joined = (0 until n).map(o => s"element_at($tokensCol, i + $o)")
      .mkString("concat_ws(' ', ", ", ", ")")
    expr(
      s"""CASE WHEN size($tokensCol) >= $n
         | THEN array_distinct(transform(sequence(1, size($tokensCol) - ${n - 1}), i -> $joined))
         | ELSE array() END""".stripMargin)
  }

  /** Stopword ratio over tokens (quality signal). */
  def stopwordRatio(tokensCol: String, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val set = stopwords.map(s => s"'$s'").mkString(", ")
    expr(s"size(filter($tokensCol, t -> t IN ($set)))").cast("double") /
      greatest(size(col(tokensCol)), lit(1))
  }

  /** Fraction of characters that are not [a-z0-9 ] after lowercasing. */
  def punctRatio(textCol: String): Column =
    (length(col(textCol)) - length(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""))).cast("double") /
      greatest(length(col(textCol)), lit(1))

  /** Composite quality score in [0,1]: length, stopword balance, cleanliness. */
  def qualityScore(nTokens: Column, stopRatio: Column, punct: Column): Column =
    lit(0.5) * least(nTokens.cast("double") / lit(100.0), lit(1.0)) +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.2) * (lit(1.0) - punct)

  def qualityBand(score: Column): Column =
    when(score >= 0.7, "high").when(score >= 0.5, "medium").otherwise("low")

  /** Language-ID heuristic: marker-token profiles scored per language,
    * argmax with deterministic tiebreak (highest score, then
    * alphabetically-last language). Real deployments swap the profiles
    * for char-n-gram models; the operator shape (pure expression, zero
    * shuffle) is what scales. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "batch", "stream"),
    "en" -> Seq("the", "a", "and", "fast", "slow"),
    "es" -> Seq("el", "la", "los", "data", "query"),
    "fr" -> Seq("le", "la", "et", "table", "merge"),
    "zh" -> Seq("spark", "vector", "window", "hash", "join"))

  def langGuess(tokensCol: String): Column = {
    val scored = LangProfiles.map { case (lang, markers) =>
      val set = markers.map(m => s"'$m'").mkString(", ")
      struct(
        expr(s"size(filter($tokensCol, t -> t IN ($set)))").as("score"),
        lit(lang).as("lang"))
    }
    sort_array(array(scored: _*), asc = false).getItem(0).getField("lang")
  }

  /** Document fingerprint: min-wise hash over token md5s (1-permutation
    * MinHash) — a stable content id robust to token order. */
  def fingerprint(tokensCol: String): Column =
    expr(s"array_min(transform($tokensCol, t -> md5(t)))")
}
