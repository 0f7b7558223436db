package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TfIdf

class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tfidf: corpus-wide terms score 1.0 (tf·N/df), rare terms score higher") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common other"),
      (3L, "common filler words")).toDF("doc_id", "text")
    val m = TfIdf.tfidf(docs, "doc_id", "text")
      .filter(col("doc_id") === 1)
      .select("term", "tf", "df", "score")
      .as[(String, Double, Long, Double)].collect()
      .map { case (t, tf, df, s) => t -> ((tf, df, s)) }.toMap
    // 'common' in all 3 docs: tf=3/4, idf=3/3=1 → score 0.75
    assert(m("common") == ((0.75, 3L, 0.75)))
    // 'rare1' in 1 doc: tf=1/4, idf=3/1=3 → score 0.75
    assert(m("rare1") == ((0.25, 1L, 0.75)))
  }

  test("topTerms ranks by score desc with term tiebreak, exactly k rows per doc") {
    val docs = Seq(
      (1L, "aa bb cc dd ee"),
      (2L, "aa aa aa zz")).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .select("doc_id", "rank", "term").as[(Long, Int, String)].collect().sorted.toSeq
    // doc 1: all terms tf=1/5; unique terms (df=1, idf=2 → 0.4) beat
    // shared 'aa' (df=2, idf=1 → 0.2); bb/cc/dd/ee tie broken
    // alphabetically. doc 2: 'aa' tf=3/4·idf 1 = 0.75 beats 'zz'
    // tf=1/4·idf 2 = 0.5.
    assert(got == Seq((1L, 1, "bb"), (1L, 2, "cc"), (2L, 1, "aa"), (2L, 2, "zz")))
  }

  test("invertedIndex: doc-ordered postings with per-doc tf, df and totals consistent") {
    val docs = Seq(
      (3L, "x y x"), (1L, "x z"), (2L, "y")).toDF("doc_id", "text")
    val got = TfIdf.invertedIndex(docs, "doc_id", "text")
      .select("term", "df", "tf_total", "postings")
      .as[(String, Long, Long, Seq[(Long, Long)])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("x") == ((2L, 3L, Seq((1L, 1L), (3L, 2L)))), "postings must be doc-ordered")
    assert(got("y") == ((2L, 2L, Seq((2L, 1L), (3L, 1L)))))
    assert(got("z") == ((1L, 1L, Seq((1L, 1L)))))
  }

  test("bm25 matches the closed-form score bit-for-bit") {
    val docs = Seq((1L, "aa aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val m = TfIdf.bm25(docs, "doc_id", "text")
      .select("doc_id", "term", "score").as[(Long, String, Double)].collect()
      .map { case (id, t, s) => (id, t) -> s }.toMap
    // N=2, dl1=3, dl2=2, avgdl=2.5 (exact: 5 tokens / 2 docs)
    val k1 = 1.2; val b = 0.75
    def score(f: Double, df: Double, dl: Double) =
      (2.0 / df) * ((f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + b * (dl / 2.5))))
    assert(m((1L, "aa")) == score(2.0, 2.0, 3.0))
    assert(m((1L, "bb")) == score(1.0, 1.0, 3.0))
    assert(m((2L, "cc")) == score(1.0, 1.0, 2.0))
  }

  test("bm25 saturates: more occurrences help sublinearly, bounded by (k1+1)·idf") {
    val docs = Seq(
      (1L, "x y y y y y y y"), // f(y)=7 of dl 8
      (2L, "x y z z")).toDF("doc_id", "text")
    val rows = TfIdf.bm25(docs, "doc_id", "text")
      .select("doc_id", "term", "f", "score").as[(Long, String, Long, Double)].collect()
    val y1 = rows.find(r => r._1 == 1L && r._2 == "y").get
    val y2 = rows.find(r => r._1 == 2L && r._2 == "y").get
    assert(y1._3 == 7L && y2._3 == 1L)
    assert(y1._4 > y2._4, "higher raw count must score higher")
    val idfY = 2.0 / 2.0
    assert(y1._4 < (1.2 + 1.0) * idfY, "saturation ceiling (k1+1)·idf")
    assert(y1._4 < 7.0 * y2._4, "growth is sublinear in f")
  }

  test("bm25TopTerms: exactly k rows per doc, score-desc with term tiebreak") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "aa aa zz")).toDF("doc_id", "text")
    val got = TfIdf.bm25TopTerms(docs, "doc_id", "text", k = 2)
      .select("doc_id", "rank", "term").as[(Long, Int, String)].collect().sorted.toSeq
    // doc1: all f=1/dl=4; unique bb/cc/dd (idf 2) beat shared aa (idf 1),
    // alphabetical among ties. doc2: aa f=2 saturated still beats zz? no —
    // zz idf 2 vs aa idf 1·sat(2): compare explicitly below.
    val k1 = 1.2; val b = 0.75
    def score(f: Double, df: Double, dl: Double, n: Double, avgdl: Double) =
      (n / df) * ((f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + b * (dl / avgdl))))
    val avgdl = 7.0 / 2.0
    val aa2 = score(2.0, 2.0, 3.0, 2.0, avgdl)
    val zz2 = score(1.0, 1.0, 3.0, 2.0, avgdl)
    val expectedDoc2 = if (zz2 > aa2) Seq((2L, 1, "zz"), (2L, 2, "aa"))
                       else Seq((2L, 1, "aa"), (2L, 2, "zz"))
    assert(got == Seq((1L, 1, "bb"), (1L, 2, "cc")) ++ expectedDoc2)
  }

  test("rrfFuse: hand-computed fusion, missing keys contribute zero") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val got = TfIdf.rrfFuse(Seq("a" -> a, "b" -> b), Seq("id"))
      .select("id", "rrf").as[(Long, Double)].collect().toMap
    assert(got(10L) == 1.0 / 61)
    assert(got(20L) == 1.0 / 62 + 1.0 / 61, "rank 2 in a, rank 1 in b")
    assert(got(30L) == 1.0 / 62)
    // agreement on the top item beats a solo #1: 20 outranks both
    assert(got(20L) > got(10L) && got(20L) > got(30L))
  }

  test("termLabelMi: predictive term carries the full label entropy, balanced term carries 0") {
    // 8 docs, 4 labeled true: 'sig' appears exactly in the true docs,
    // 'noise' appears in exactly half of each class
    val docs = (0 until 8).map { i =>
      val sig = if (i < 4) " sig" else ""
      val noise = if (i % 2 == 0) " noise" else ""
      (i.toLong, i < 4, s"base$sig$noise")
    }.toDF("id", "y", "body")
    val mi = TfIdf.termLabelMi(docs, "id", "body", "y", minDf = 1L)
      .select("term", "n11", "n01", "n10", "n00", "mi")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    // perfect predictor: MI = H(label) = ln 2 for a balanced label
    assert(mi("sig")._2 == 4 && mi("sig")._3 == 0 && mi("sig")._4 == 0 && mi("sig")._5 == 4)
    assert(math.abs(mi("sig")._6 - math.log(2)) < 1e-12)
    // independent of the label: MI exactly 0
    assert(mi("noise")._6 == 0.0)
    assert(mi("base")._6 == 0.0, "a term in every doc carries nothing")
    // contingency cells always total N
    mi.values.foreach(x => assert(x._2 + x._3 + x._4 + x._5 == 8))
  }
}
