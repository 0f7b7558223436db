package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Distributed BPE merge fitting: hand-computed merge choices,
  * greedy-run apply semantics, tie-break determinism, compression
  * monotonicity. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fitMerges: hand-computed two rounds on a tiny corpus") {
    // corpus: "low low low lower lower" — classic BPE example.
    // Round 1 pairs: (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=2 → tie (l,o)
    // vs (o,w) breaks lexicographically → merge (l,o).
    // Round 2: (lo,w)=5 wins → "low" becomes one symbol.
    val docs = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val out = Bpe.fitMerges(docs, "text", rounds = 2)
      .orderBy("round")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(out.map(r => (r._2, r._3, r._4)) == Seq(("l", "o", 5L), ("lo", "w", 5L)),
      s"merge choices drifted: $out")
    // after r1: low=|lo|w (2 syms ×3), lower=|lo|w|e|r (4 ×2) → 14.
    // after r2: low=|low (1 ×3), lower=|low|e|r (3 ×2) → 9.
    assert(out.map(_._5) == Seq(14L, 9L), s"compression curve drifted: $out")
  }

  test("fitMerges: greedy left-to-right non-overlap on a repeated-symbol run") {
    // "aaaa" with merge (a,a): sequential BPE yields aa|aa (2 symbols),
    // NOT a|aa|a or 3 overlapping pairs. After round 1 the only word
    // must carry exactly 2 symbols → vocab_symbols = 2.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Bpe.fitMerges(docs, "text", rounds = 1)
      .as[(Int, String, String, Long, Long)].head()
    assert(out._2 == "a" && out._3 == "a", s"merge must be (a,a): $out")
    assert(out._4 == 3L, "pair count over aaaa is 3 adjacent (a,a) pairs")
    assert(out._5 == 2L, s"greedy apply must leave aa|aa = 2 symbols, got ${out._5}")
  }

  test("encode: replays the fitted merges in rank order, per-word fold") {
    // corpus: "low" ×3, "lower" ×2 → r1 merges (l,o), r2 (lo,w)
    val docs = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = Bpe.fitMerges(docs, "text", rounds = 2)
    val enc = Bpe.encode(docs, "text", merges)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // low → |low (1 symbol); lower → |low|e|r (3 symbols)
    assert(enc("low") == (("low", 3L, 1L, "low")), s"${enc("low")}")
    assert(enc("lower") == (("lower", 2L, 3L, "low|e|r")), s"${enc("lower")}")
  }

  test("encode: word untouched by any merge stays fully split") {
    val docs = Seq((1L, "ab ab xyz")).toDF("doc_id", "text")
    val merges = Bpe.fitMerges(docs, "text", rounds = 1) // merges (a,b)
    val enc = Bpe.encode(docs, "text", merges)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(enc("xyz") == "x|y|z", s"got ${enc("xyz")}")
    assert(enc("ab") == "ab", s"got ${enc("ab")}")
  }

  test("fitMerges: deterministic under repartitioning (tie-break is total)") {
    val docs = Seq((1L, "ab ab cd cd"), (2L, "cd ab"), (3L, "ef ef ef")).toDF("doc_id", "text")
    val a = Bpe.fitMerges(docs, "text", rounds = 3).orderBy("round")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    val b = Bpe.fitMerges(docs.repartition(7), "text", rounds = 3).orderBy("round")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(a == b, s"partitioning changed the fit: $a vs $b")
  }
}
