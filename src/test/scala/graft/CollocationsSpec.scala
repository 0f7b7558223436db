package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Collocations

/** Hand-computed fixtures for the corpus-statistics operators: the
  * q_pmi_bigrams / q_lm_xent oracles prove Spark≡DuckDB on the real
  * tables; these prove both match the MATH on inputs small enough to
  * compute by hand. */
class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pmiBigrams: an always-adjacent pair outranks independent pairs, ratio exact") {
    // corpus: "new york" glued 4x; "big apple city" shuffle contributes
    // independent co-occurrences of filler words
    val docs = Seq(
      "new york new york",
      "new york big city",
      "big apple city apple",
      "city big apple new york").toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 2, k = 10).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "new" && top.getString(1) == "york")
    // hand computation: T1 = 4+4+4+5 = 17 tokens, T2 = 3+3+3+4 = 13
    // bigrams, n_xy(new,york) = 4, n_new = 4, n_york = 4
    // ratio = (4·17·17)/(13·4·4) = 1156/208 ≈ 5.5577
    val expected = 4.0 * 17 * 17 / (13.0 * 4 * 4)
    assert(math.abs(top.getDouble(5) - expected) < 1e-6,
      s"got ${top.getDouble(5)}, want $expected")
  }

  test("pmiBigrams: minCount filters singletons") {
    val docs = Seq("a b", "c d", "a b").toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 2, k = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("a", "b")))
  }

  test("unigramCrossEntropy: uniform corpus gives every doc the same exact entropy") {
    // 4 docs over a 4-term vocabulary, each term appearing exactly 4x:
    // p(w) = (4+1)/(16+4) = 1/4 for every token → H = ln 4 everywhere
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "bb cc dd aa"),
      (3L, "cc dd aa bb"), (4L, "dd aa bb cc")).toDF("doc_id", "text")
    val out = Collocations.unigramCrossEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "lm_xent")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    out.foreach { case (_, n, h) =>
      assert(n == 4)
      assert(math.abs(h - math.log(4.0)) < 1e-12, s"H=$h, want ln4=${math.log(4.0)}")
    }
  }

  test("bigramBackoffXent: seen bigrams score from the conditional, unseen fall to the Laplace floor") {
    // train "a b a b": uni a:2 b:2 (T1=4, V=2); bigrams (a,b):2 (b,a):1
    // score "a b c": (a,b) seen → ln(2/2)=0; (b,c) unseen, c unseen
    // unigram → ln(0.4·(0+1)/(4+2)); H = -(0 + ln(0.4/6))/2
    val train = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Collocations.bigramBackoffXent(train, score, "doc_id", "text")
      .select("doc_id", "n_tokens", "lm2_xent")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1)
    val (_, n, h) = out.head
    assert(n == 3)
    val expected = -(math.log(2.0 / 2.0) + math.log(0.4 * 1.0 / 6.0)) / 2
    assert(math.abs(h - expected) < 1e-12, s"H=$h, want $expected")
    // sub-2-token docs are dropped, not scored
    val short = Collocations.bigramBackoffXent(train,
      Seq((2L, "solo")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(short.isEmpty)
  }

  test("unigramCrossEntropy: a rare-token doc scores strictly worse than a common-token doc") {
    val docs = (1L to 9L).map(i => (i, "common common common")) :+ (10L, "zzz zzz zzz")
    val out = Collocations.unigramCrossEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "lm_xent").as[(Long, Double)].collect().toMap
    assert(out(10L) > out(1L), s"rare ${out(10L)} should exceed common ${out(1L)}")
    // empty docs are dropped, not scored as 0/0
    val withEmpty = Collocations.unigramCrossEntropy(
      Seq((1L, "a b"), (2L, "   ")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(withEmpty.map(_.getLong(0)).toSet == Set(1L))
  }
}
