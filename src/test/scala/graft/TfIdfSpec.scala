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
}
