package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Distributed BPE (byte-pair-encoding) merge-rule fitting — the
  * tokenizer-induction primitive (Sennrich et al., ACL 2016): each
  * round counts adjacent symbol pairs across the corpus weighted by
  * word frequency, promotes the most frequent pair to a new merged
  * symbol, and rewrites the vocabulary. This is the map-reduce
  * formulation: the corpus collapses to the (word, freq) vocabulary
  * first (≪ corpus at any scale — token frequency follows Zipf), and
  * every round is one explode→groupBy shuffle on the pair key plus a
  * 1-row broadcast argmax — no driver-side vocabulary, no per-word
  * sequential state.
  *
  * Symbol sequences are carried as a `|`-prefixed string
  * (`"|h|e|r"`): applying merge (a, b) is then the plain substring
  * replacement `replace(syms, "|a|b", "|ab")`, whose left-to-right
  * non-overlapping scan IS the greedy BPE apply — and because the
  * pattern does not consume the NEXT symbol's leading `|`, a run like
  * `a a a a` merges to `aa aa` exactly as sequential BPE does. Both
  * engines implement `replace` with identical semantics, so the whole
  * fit is oracle-mirrorable with no custom code on the SQL side.
  *
  * Returns the merge ledger: one row per round —
  * (round, merge_a, merge_b, pair_count, vocab_symbols = Σ per-word
  * symbol counts AFTER applying the round's merge, weighted by word
  * freq — i.e. the corpus token count under the tokenizer so far,
  * the compression curve a tokenizer fit is judged by).
  *
  * Tie-break: highest count, then lexicographically smallest (a, b) —
  * deterministic on any engine and any partitioning.
  */
object Bpe {

  /** Vocabulary with symbol strings: (word, freq, syms). */
  private[operators] def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(textCol)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      // '|' + chars joined by '|': regexp char split is dialect-shared
      .withColumn("syms",
        concat(lit("|"), array_join(expr("regexp_extract_all(word, '.', 0)"), "|")))

  /** Adjacent-pair counts over a (freq, syms) vocabulary frame. */
  private def pairCounts(v: DataFrame): DataFrame =
    v.select(col("freq"), split(regexp_replace(col("syms"), "^\\|", ""), "\\|").as("__a"))
      .select(col("freq"), explode(expr(
        """CASE WHEN size(__a) >= 2
          | THEN transform(sequence(1, size(__a) - 1),
          |   i -> struct(element_at(__a, i) AS a, element_at(__a, i + 1) AS b))
          | ELSE array() END""".stripMargin)).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Fit `rounds` merge rules. One row per round:
    * (round, merge_a, merge_b, pair_count, vocab_symbols). */
  def fitMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // the vocabulary is the only carried state — truncate per round
    // (same contract as the graph loops: round r's plan would
    // otherwise nest r replace+argmax chains)
    var v = graft.core.Lineage.truncate(vocab(docs, textCol))
    var ledger: Seq[DataFrame] = Nil
    for (r <- 1 to rounds) {
      // truncated: the 1-row winner is read twice (merge apply + ledger
      // row) — without the eager reset the pair-count shuffle runs twice
      val best = graft.core.Lineage.truncate(pairCounts(v)
        .orderBy(col("pair_count").desc, col("a"), col("b")).limit(1))
      // apply the merge: one broadcast row against the vocab frame
      v = graft.core.Lineage.truncate(
        v.crossJoin(broadcast(best))
          .withColumn("syms", expr(
            "replace(syms, '|' || a || '|' || b, '|' || a || b)"))
          .select(col("word"), col("freq"), col("syms")))
      // corpus token count under the tokenizer-so-far: symbols per word
      // = count of '|' markers, weighted by word frequency
      val tokens = v.agg(sum(col("freq") *
        (length(col("syms")) - length(expr("replace(syms, '|', '')"))))
        .as("vocab_symbols"))
      ledger = ledger :+ best
        .crossJoin(broadcast(tokens))
        .select(lit(r).as("round"), col("a").as("merge_a"), col("b").as("merge_b"),
          col("pair_count"), col("vocab_symbols"))
    }
    ledger.reduce(_ union _)
  }

  /** ENCODE with a fitted merge ledger — the apply half of the
    * tokenizer loop ([[fitMerges]] being the fit half): every corpus
    * word segmented by replaying the merges in rank order. The whole
    * replay is ONE codegen'd `aggregate` fold of the (tiny, broadcast)
    * sorted merge array over each word's symbol string — the same
    * `replace` trick as the fit, so greedy left-to-right application
    * is preserved and the oracle mirrors it with the fit's own CTE
    * chain. No driver-side merge list, no per-merge pass over the
    * vocab.
    *
    * Returns one row per distinct word: (word, freq, n_symbols,
    * encoded) with `encoded` the `|`-joined symbol segmentation. */
  def encode(docs: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val ms = merges
      .select(struct(col("round"), col("merge_a").as("a"), col("merge_b").as("b")).as("m"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
    vocab(docs, textCol).crossJoin(broadcast(ms))
      .withColumn("syms", expr(
        "aggregate(ms, syms, (s, m) -> replace(s, '|' || m.a || '|' || m.b, '|' || m.a || m.b))"))
      .select(col("word"), col("freq"),
        (length(col("syms")) - length(expr("replace(syms, '|', '')")))
          .cast("long").as("n_symbols"),
        expr("substr(syms, 2)").as("encoded"))
  }
}
