package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and packing: PII redaction and per-source quota capping.
  *
  * Both are single-pass, shuffle-minimal shapes: redaction is a pure
  * projection (codegen'd regexp engine, no UDF); capping is one
  * shuffle on the quota key with WindowGroupLimit pushing the per-key
  * top-n into the sort (no full materialization per group).
  */
object Curation {

  /** Redaction patterns — written in the common subset of Java regex
    * (Spark) and RE2 (DuckDB) so the oracle can run the identical
    * pattern: no lookarounds, no \d shorthands, explicit classes. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern: String = "\\+?[0-9]{3}[- ]?[0-9]{3}[- ]?[0-9]{4}"

  /** Redact emails → IPv4s → phone-shaped numbers (that order: the
    * IPv4 pass must not see addresses hidden inside emails' domains,
    * and the phone pass must not see the digits of IPv4s). Emits the
    * redacted text plus per-kind match counts — the observability a
    * scrub job ships to its data-quality dashboard. Each count runs on
    * the PRECEDING pass's output, so it counts redactions actually
    * performed, not pattern hits an earlier pass already consumed
    * (n_ipv4 must not claim an <IP> for a dotted quad that was
    * swallowed inside an email's domain). */
  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val taken = df.columns.toSet
    val clash = Seq("n_emails", "n_ipv4", "n_phones", "redacted").filter(taken)
    require(clash.isEmpty,
      s"piiScrub writes output column(s) ${clash.mkString(", ")} that already exist; rename them")
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "<IP>")
    df
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_ipv4", regexp_count(afterEmail, lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhonePattern)))
      .withColumn("redacted", regexp_replace(afterIp, PhonePattern, "<PHONE>"))
  }

  /** Keep at most `n` rows per `key`, preferring by `order` (ties
    * broken by `tiebreak` for determinism) — the per-domain/per-source
    * quota that stops one crawl host from dominating a training mix.
    * Plans as WindowGroupLimit: the rank filter is pushed into the
    * per-partition sort, so only n rows per key survive the shuffle. */
  def capPerKey(df: DataFrame, key: String, order: Column, tiebreak: Column, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    require(!df.columns.contains("__rn"),
      "capPerKey reserves column name __rn internally; rename the input column")
    val w = Window.partitionBy(col(key)).orderBy(order, tiebreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** End-to-end curation pipeline — the four standard pretraining-data
    * gates composed in their canonical order, one call:
    *   1. exact dedup        keep the lowest id per content hash
    *   2. quality gate       composite score ≥ minScore
    *   3. LM gate            unigram cross-entropy ≤ maxXent (scored
    *                         against the FULL input corpus, so the LM
    *                         isn't biased by which duplicate survived)
    *   4. per-source cap     best `perSourceCap` docs per source, by
    *                         quality then id
    * Gates compare ROUNDED (4-dp) scores so the kept set is stable
    * across engines and summation orders. Output carries the per-doc
    * evidence (n_tokens, score, lm_xent) — the audit trail a data card
    * wants next to the kept set.
    *
    * Shape: dedup is one content-hash window, features are scan-level
    * expressions, the LM is two explode+groupBy passes + a term
    * equi-join (Collocations.unigramCrossEntropy), the cap is one
    * source-key window — every stage is a keyed shuffle or cheaper;
    * nothing materializes on the driver. */
  def curationPipeline(docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
                       minScore: Double, maxXent: Double, perSourceCap: Int): DataFrame = {
    import graft.functions.TextAnalysis
    def r4(c: Column): Column = graft.queries.rd(c, 4)
    val xent = graft.operators.Collocations
      .unigramCrossEntropy(docs, idCol, textCol)
      .select(col(idCol), r4(col("lm_xent")).as("lm_xent"))
    val deduped = docs
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))))
      .filter(col("__rn") === 1).drop("__rn")
    val scored = deduped
      .withColumn("toks", TextAnalysis.tokens(textCol))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("score", r4(TextAnalysis.qualityScore(
        col("n_tokens"), TextAnalysis.stopwordRatio("toks"), TextAnalysis.punctRatio(textCol))))
      .filter(col("score") >= minScore)
      .join(xent, idCol)
      .filter(col("lm_xent") <= maxXent)
    capPerKey(scored, sourceCol, col("score").desc, col(idCol), perSourceCap)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("score"), col("lm_xent"))
  }

  /** Filter-funnel attribution — the per-rule audit behind any
    * curation cascade: every document is attributed to its FIRST
    * failing rule (the order is the pipeline's declared order), and
    * the result is one row per rule with the walk-in/drop/walk-out
    * counts a data card reports. `rules` are (name, fails-predicate)
    * in evaluation order; names must be distinct and never "kept".
    *
    * Shape: the first-fail label is one CASE ladder in the scan
    * projection, counts are one keyed aggregation to a |rules|-row
    * frame, and the running walk-in numbers are a window over that
    * tiny frame. Zero-drop rules still appear (the rule list is the
    * spine, counts left-join in). */
  def funnelAttribution(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "funnelAttribution needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size && !rules.exists(_._1 == "kept"),
      s"rule names must be distinct and not 'kept': ${rules.map(_._1)}")
    val firstFail = rules.reverse.foldLeft(lit("kept")) {
      case (els, (name, fails)) => when(fails, name).otherwise(els)
    }
    val counts = df.select(firstFail.as("rule"))
      .groupBy(col("rule")).agg(count(lit(1)).as("n_dropped"))
    val spark = df.sparkSession
    import spark.implicits._
    val spine = rules.map(_._1).zipWithIndex
      .map { case (n, i) => (i + 1, n) }.toDF("rule_order", "rule")
    val w = Window.orderBy(col("rule_order"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = df.agg(count(lit(1)).as("__n"))
    spine.join(counts, Seq("rule"), "left")
      .withColumn("n_dropped", coalesce(col("n_dropped"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("n_in", col("__n") - coalesce(sum(col("n_dropped")).over(w), lit(0L)))
      .select(col("rule_order"), col("rule"), col("n_in"), col("n_dropped"),
        (col("n_in") - col("n_dropped")).as("n_out"))
  }

  /** Global-threshold impact audit: find the single score threshold t
    * that keeps `keepFraction` of the corpus (t = the value at rank
    * ⌊f·N⌋ of the score sorted descending; ties keep everything equal
    * to t, so n_kept can overshoot by the tie mass), then report how
    * that ONE global filter lands on each domain — the disparate-
    * impact check run before shipping a quality cutoff.
    *
    * Contract: `scoreCol` must already be rounded to a fixed decimal
    * grain (the 4-dp curation convention) — the threshold compare is
    * then exact on any engine. Returns one row per domain: (domain,
    * n_docs, n_kept, keep_rate, threshold).
    *
    * Shape: one keyed aggregation to per-score counts (≤ 10^grain
    * rows — thousands, not corpus-sized), a window over that tiny
    * frame for the descending cumulative, a 1-row threshold broadcast
    * into the per-domain aggregation. The corpus is scanned twice and
    * shuffled only by (score) and (domain). */
  def thresholdImpact(df: DataFrame, domainCol: String, scoreCol: String,
                      keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0,1], got $keepFraction")
    val perScore = df.groupBy(col(scoreCol).as("__s")).agg(count(lit(1)).as("__c"))
    val wDesc = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = df.agg(count(lit(1)).as("__n"))
    val thr = perScore
      .withColumn("__cum", sum(col("__c")).over(wDesc))
      .crossJoin(broadcast(n))
      .filter(col("__cum") >= greatest(floor(lit(keepFraction) * col("__n")), lit(1L)))
      .agg(max(col("__s")).as("threshold"))
    df.crossJoin(broadcast(thr))
      .groupBy(col(domainCol), col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col(scoreCol) >= col("threshold"), 1)).as("n_kept"))
      .withColumn("keep_rate",
        graft.queries.rd(col("n_kept").cast("double") / col("n_docs"), 4))
      .select(col(domainCol), col("n_docs"), col("n_kept"), col("keep_rate"), col("threshold"))
  }

  /** Exact-phrase blocklist matching at corpus scale — "flag every
    * document containing any banned phrase", the policy-filter stage.
    * NOT a per-row scan over K patterns (the multi-regex approach that
    * dies at large K): each document explodes once per phrase LENGTH
    * into md5-hashed token windows, and phrases join by window hash —
    * a keyed equi-join whose cost is |tokens|·|distinct lengths|,
    * independent of K. Matching is token-exact (same normalization as
    * [[graft.functions.TextAnalysis.tokens]] on both sides), so
    * "fast table" matches "Fast, table!" but never "fastest table".
    *
    * `phrases` is config-scale (it broadcasts); its distinct token
    * LENGTHS (a handful) are collected to drive the per-length window
    * explode — config-metadata collect, not a data-path collect.
    * Returns one row per (doc, phrase) with the hit count; anti-join
    * the doc frame against it to apply the block. */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
                    phrases: DataFrame, phraseIdCol: String,
                    phraseCol: String): DataFrame = {
    // config-scale frame: re-deriving it per length leg is cheaper than
    // managing a cache lifetime for a handful of rows
    val ph = phrases.select(col(phraseIdCol),
      graft.functions.TextAnalysis.tokens(phraseCol).as("__ptoks"))
      .withColumn("__len", size(col("__ptoks")))
      .withColumn("__ph", md5(concat_ws(" ", col("__ptoks"))))
    val lengths = ph.select(col("__len")).distinct()
      .collect().map(_.getInt(0)).filter(_ >= 1).sorted
    require(lengths.nonEmpty, "blocklist has no non-empty phrase")
    val toks = docs.withColumn("__toks",
      graft.functions.TextAnalysis.tokens(textCol))
    val hits = lengths.map { n =>
      toks.filter(size(col("__toks")) >= n)
        .select(col(idCol), explode(expr(
          s"""transform(sequence(1, size(__toks) - ${n - 1}),
             |  i -> md5(concat_ws(' ', slice(__toks, i, $n))))""".stripMargin))
          .as("__wh"))
        .join(broadcast(ph.filter(col("__len") === n)
          .select(col(phraseIdCol), col("__ph"))),
          col("__wh") === col("__ph"))
        .groupBy(col(idCol), col(phraseIdCol))
        .agg(count(lit(1)).as("n_hits"))
    }.reduce(_.unionByName(_))
    hits
  }

  /** Fill-in-the-middle training transform (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle"):
    * a hash-selected `ratePct`% of documents are rewritten in PSM
    * order — prefix, suffix, then the middle the model must infill —
    * with literal sentinel strings standing in for the special token
    * ids a tokenizer would emit. FIM is applied at the DATA layer
    * (the paper's key finding: it's free — no architecture change)
    * and must be deterministic per (seed, doc): re-running the
    * pipeline cannot re-deal which docs are transformed or where
    * their split points fall, or dataset versions stop being
    * reproducible.
    *
    * Split points: two independent md5-derived positions in
    * [0, len), sorted — so middle spans are uniform-ish and
    * occasionally empty (degenerate spans are legal FIM examples and
    * are kept, matching the paper's uniform-span recipe). Everything
    * is a scalar projection: no shuffle, no state, scan-throughput at
    * any corpus size; the oracle replays the exact hash arithmetic. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   ratePct: Int = 50, seed: String = "fim"): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, s"ratePct must be 0..100, got $ratePct")
    def h(salt: String): Column =
      conv(substring(md5(concat_ws(":", lit(seed), col(idCol).cast("string"),
        lit(salt))), 1, 8), 16, 10).cast("long")
    val len = length(col(textCol)).cast("long")
    val lenSafe = greatest(len, lit(1L))
    val p1 = h("a") % lenSafe
    val p2 = h("b") % lenSafe
    val lo = least(p1, p2)
    val hi = greatest(p1, p2)
    val applied = col(textCol).isNotNull &&
      (Sampling.hashBucket(concat_ws(":", lit(seed), col(idCol).cast("string"))) < ratePct)
    val prefix = expr(s"substring($textCol, 1, __lo)")
    val middle = expr(s"substring($textCol, __lo + 1, __hi - __lo)")
    val suffix = expr(s"substring($textCol, __hi + 1)")
    df.withColumn("__lo", when(applied, lo).otherwise(lit(0L)))
      .withColumn("__hi", when(applied, hi).otherwise(lit(0L)))
      .withColumn("fim_applied", applied)
      .withColumn("fim_text",
        when(applied,
          concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix, lit("<MID>"), middle))
          .otherwise(col(textCol)))
      .withColumn("n_prefix", when(applied, col("__lo")).otherwise(lit(null).cast("long")))
      .withColumn("n_middle", when(applied, col("__hi") - col("__lo")).otherwise(lit(null).cast("long")))
      .drop("__lo", "__hi")
  }
}
