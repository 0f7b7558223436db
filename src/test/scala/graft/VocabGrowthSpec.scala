package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.VocabGrowth

/** Heaps'-law curve: hand-checkable tiny corpus, cumulative-curve
  * invariants, and the degenerate-fit contract (fewer than 2 valid
  * checkpoints → NULL β/K, never ±Inf/NaN — the r8 ADVICE case). */
class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand corpus: per-bucket masses, first-sighting new types, cumulative curve") {
    val df = VocabGrowth.heapsCurve(corpus(
      (0L, "a b c"), (1L, "a b"),      // bucket 0: tokens 5, types {a,b,c}
      (2L, "c d"), (3L, "d e f"),      // bucket 1: tokens 5, new {d,e,f}
      (4L, "a f g h")),                // bucket 2: tokens 4, new {g,h}
      bucketSize = 2L).orderBy("bucket").collect()
    assert(df.map(_.getAs[Long]("bucket_tokens")).toSeq === Seq(5L, 5L, 4L))
    assert(df.map(_.getAs[Long]("new_types")).toSeq === Seq(3L, 3L, 2L))
    assert(df.map(_.getAs[Long]("cum_vocab")).toSeq === Seq(3L, 6L, 8L))
    assert(df.map(_.getAs[Long]("cum_tokens")).toSeq === Seq(5L, 10L, 14L))
    assert(df.map(_.getAs[Long]("n_docs")).toSeq === Seq(2L, 2L, 1L))
    // β on a growing curve is positive and finite, identical on all rows
    val betas = df.map(_.getAs[Double]("heaps_beta")).distinct
    assert(betas.length === 1 && betas.head > 0 && betas.head < 1.5)
  }

  test("degenerate curve (single checkpoint): β/K are NULL, not Inf/NaN") {
    val one = VocabGrowth.heapsCurve(corpus((0L, "a b c"), (1L, "a d")),
      bucketSize = 10L).collect()
    assert(one.length === 1)
    assert(one.head.isNullAt(one.head.fieldIndex("heaps_beta")))
    assert(one.head.isNullAt(one.head.fieldIndex("heaps_k")))
  }

  test("buckets with zero new types still appear (token mass drives the universe)") {
    val df = VocabGrowth.heapsCurve(corpus(
      (0L, "a b"), (1L, "a b"), (2L, "a b"), (3L, "b a")), bucketSize = 2L)
      .orderBy("bucket").collect()
    assert(df.length === 2)
    assert(df(1).getAs[Long]("new_types") === 0L)
    assert(df(1).getAs[Long]("cum_vocab") === 2L)
  }

  test("parameter contract") {
    intercept[IllegalArgumentException] {
      VocabGrowth.heapsCurve(corpus((0L, "a")), bucketSize = 0L)
    }
    intercept[IllegalArgumentException] {
      VocabGrowth.zipfFit(corpus((0L, "a")), "text", topN = 1)
    }
  }

  test("zipfFit: hand spectrum — ranks deterministic, exact-power-law α recovered") {
    // freqs 8/4/2/1 at ranks 1..4 is freq = 8·r^(-?) — not exact; use
    // an EXACT power law over ranks 1,2,4: freq 8,4,2 → α = 1, C = 8
    val df = corpus((0L, ("aa " * 8 + "bb " * 4 + "cc " * 2).trim))
    val r = VocabGrowth.zipfFit(df, "text", topN = 3).orderBy("rank").collect()
    assert(r.map(x => (x.getAs[Long]("rank"), x.getAs[String]("term"),
      x.getAs[Long]("freq"))).toSeq === Seq((1L, "aa", 8L), (2L, "bb", 4L), (3L, "cc", 2L)))
    // ln freq on ln rank over (1,8),(2,4),(3,2): closed-form OLS slope
    // (through the 1e-9 fixed-point recipe) is −1.2336619…
    val alpha = r.head.getAs[Double]("zipf_alpha")
    assert(math.abs(alpha - 1.2336619) < 1e-4, s"alpha $alpha")
    // tie-break: equal freqs rank alphabetically
    val t = VocabGrowth.zipfFit(corpus((0L, "zz yy xx")), "text", topN = 3)
      .orderBy("rank").collect().map(_.getAs[String]("term")).toSeq
    assert(t === Seq("xx", "yy", "zz"))
  }
}
