package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document-quality rule battery (Rae et al. 2021,
  * "Scaling Language Models: … Gopher", §A1.1; the same family C4 and
  * RefinedWeb apply) — the per-document structural filters a
  * web-scale pretraining pipeline runs BEFORE any model-based scoring:
  *
  *  - word-count bounds and mean-word-length bounds (strips
  *    boilerplate fragments and OCR noise),
  *  - symbol-to-word ratio over `#` and ellipsis (forum/markup junk),
  *  - bullet-start and ellipsis-end line fractions (listicle /
  *    truncated-crawl pages),
  *  - alphabetic-word fraction (tables, code, lineage noise),
  *  - stopword-presence floor (the "is this running prose" probe),
  *  - duplicate-line fraction (the intra-document half of dedup —
  *    nav bars and footers repeat inside a page).
  *
  * Every metric is a scalar over ONE document, so the whole battery is
  * a single narrow projection — no shuffle, no join, no state: at
  * 100 TB it runs at parquet-scan throughput and composes with the
  * curation funnel (`Curation`) as just another filter stage. The
  * higher-order array functions used here (filter/aggregate/
  * array_distinct) are native Catalyst expressions evaluated
  * per-row — not UDFs.
  *
  * Rule flags are emitted INDIVIDUALLY (r_*) alongside `keep`: a mix
  * designer needs per-rule kill counts (which rule fires on which
  * slice), not just the conjunction. Ratios are 6-dp rounded with the
  * shared oracle-stable formula so the booleans compare identically
  * cross-engine. Null text is deterministically REJECTED (every rule
  * flag and `keep` coalesce to false; metrics stay null) — a null doc
  * must land on exactly one side of a keep/drop split.
  *
  * Crawl-reality hygiene: lines split on `\r?\n` (CRLF corpora keep no
  * trailing `\r`, so the ellipsis-END rule still fires), words split
  * on any whitespace run (`\s+` — tabs don't glue words), and the
  * stopword probe matches LOWERCASED ALPHANUMERIC TOKENS (the
  * TextAnalysis.tokens grain), not raw splits — 'The', 'the,' and
  * 'the.' all count, as the rule intends.
  *
  * Reference anchor: the reference's quality gate is the fixed
  * CASE-ladder validation precedence over declared thresholds
  * (rt_content_events_validation.py:33-52); this battery is the
  * corpus-quality analog the survey's §5 training-data extension
  * prescribes.
  */
object QualityRules {

  /** The Gopher stopword-probe list (Rae et al. §A1.1 uses a small
    * function-word set; this is the canonical published one). */
  val StopProbe: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Published Gopher bounds. Documents outside ANY bound are dropped
    * by `keep`. */
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MaxBulletFrac = 0.9
  val MaxEllipsisFrac = 0.3
  val MinAlphaFrac = 0.8
  val MinStopHits = 2L
  val MaxDupLineFrac = 0.3

  private def rd6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Per-document battery over `textCol` (newline-separated page
    * text). Emits the raw metrics, one boolean per rule, and the
    * conjunction `keep`. Passes `idCols` through untouched. */
  def gopherRules(df: DataFrame, textCol: String, idCols: Seq[String]): DataFrame = {
    val txt = col(textCol)
    // lines: CRLF-aware split; blank lines (crawl artifacts) don't count
    val lines = filter(split(txt, "\r?\n"), l => length(l) > 0)
    // words: any whitespace run (space/tab/CR/LF) splits, empties dropped
    val words = filter(split(txt, "\\s+"), w => length(w) > 0)

    val withArrays = df.select(
      (idCols.map(col) ++ Seq(lines.as("__lines"), words.as("__words"), txt.as("__t"),
        graft.functions.TextAnalysis.tokens(textCol).as("__toks"))): _*)

    val nLines = greatest(size(col("__lines")), lit(1)).cast("long")
    val nWords = size(col("__words")).cast("long")
    val nWordsSafe = greatest(nWords, lit(1L))

    // total word characters via a fold — one pass over the array
    val totalChars = aggregate(col("__words"), lit(0L), (acc, w) => acc + length(w))
    val meanWordLen = totalChars.cast("double") / nWordsSafe.cast("double")

    // '#' characters plus '...' runs plus '…' — the Gopher symbol set.
    // Counting by length-difference keeps it one codegen'd projection.
    val nHash = (length(col("__t")) - length(regexp_replace(col("__t"), "#", ""))).cast("long")
    val nEllipsis3 = ((length(col("__t")) -
      length(regexp_replace(col("__t"), "\\.\\.\\.", ""))) / 3).cast("long")
    val nEllipsis1 = (length(col("__t")) - length(regexp_replace(col("__t"), "…", ""))).cast("long")
    val symbolRatio = (nHash + nEllipsis3 + nEllipsis1).cast("double") / nWordsSafe.cast("double")

    val bulletFrac = size(filter(col("__lines"), l => l.rlike("^[-*•] ")))
      .cast("double") / nLines.cast("double")
    val ellipsisFrac = size(filter(col("__lines"), l => l.rlike("(\\.\\.\\.|…)$")))
      .cast("double") / nLines.cast("double")
    val alphaFrac = size(filter(col("__words"), w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWordsSafe.cast("double")
    val dupLineFrac = lit(1.0) -
      size(array_distinct(col("__lines"))).cast("double") / nLines.cast("double")
    // probe against lowercased alphanumeric TOKENS (case/punct-blind)
    val stopHits = StopProbe.map(w =>
      array_contains(col("__toks"), w).cast("long")).reduce(_ + _)

    val metrics = withArrays.select(
      (idCols.map(col) ++ Seq(
        nWords.as("n_words"),
        nLines.as("n_lines"),
        rd6(meanWordLen).as("mean_word_len"),
        rd6(symbolRatio).as("symbol_ratio"),
        rd6(bulletFrac).as("bullet_frac"),
        rd6(ellipsisFrac).as("ellipsis_frac"),
        rd6(alphaFrac).as("alpha_frac"),
        rd6(dupLineFrac).as("dup_line_frac"),
        stopHits.as("stop_hits"))): _*)

    // rule booleans compare the ROUNDED metrics (bit-stable
    // cross-engine) and coalesce to false: null text fails every rule
    // deterministically instead of vanishing from both filter sides
    def r(c: Column): Column = coalesce(c, lit(false))
    metrics
      .withColumn("r_wordcount",
        r(col("n_words") >= MinWords && col("n_words") <= MaxWords))
      .withColumn("r_meanlen",
        r(col("mean_word_len") >= MinMeanWordLen && col("mean_word_len") <= MaxMeanWordLen))
      .withColumn("r_symbol", r(col("symbol_ratio") <= MaxSymbolRatio))
      .withColumn("r_bullet", r(col("bullet_frac") <= MaxBulletFrac))
      .withColumn("r_ellipsis", r(col("ellipsis_frac") <= MaxEllipsisFrac))
      .withColumn("r_alpha", r(col("alpha_frac") >= MinAlphaFrac))
      .withColumn("r_stop", r(col("stop_hits") >= MinStopHits))
      .withColumn("r_dupline", r(col("dup_line_frac") <= MaxDupLineFrac))
      .withColumn("keep",
        col("r_wordcount") && col("r_meanlen") && col("r_symbol") && col("r_bullet") &&
          col("r_ellipsis") && col("r_alpha") && col("r_stop") && col("r_dupline"))
  }
}
