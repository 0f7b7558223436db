package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityRules

/** Gopher rule battery: the crawl-reality hygiene cases the r8 ADVICE
  * flagged — CRLF documents must still fire the ellipsis-END rule,
  * tabs must split words, the stopword probe must be case- and
  * punctuation-blind, and null text must land deterministically on
  * the drop side of a keep/drop split. */
class QualityRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    QualityRules.gopherRules(rows.toDF("doc_id", "text"), "text", Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("CRLF document: trailing \\r is stripped so the ellipsis-end rule fires") {
    val m = run(Seq(
      (1L, "first line...\r\nsecond line...\r\nthird line...\r\nplain end"),
      (2L, "first line...\nsecond line...\nthird line...\nplain end")))
    val crlf = m(1L); val lf = m(2L)
    // identical content up to line terminators → identical metrics
    assert(crlf.getAs[Double]("ellipsis_frac") === 0.75)
    assert(crlf.getAs[Double]("ellipsis_frac") === lf.getAs[Double]("ellipsis_frac"))
    assert(crlf.getAs[Boolean]("r_ellipsis") === false) // 0.75 > 0.3
    assert(crlf.getAs[Long]("n_lines") === lf.getAs[Long]("n_lines"))
    assert(crlf.getAs[Double]("mean_word_len") === lf.getAs[Double]("mean_word_len"))
  }

  test("tabs split words: mean_word_len and alpha_frac see individual words") {
    val m = run(Seq((1L, "aa\tbb\tcc dd"), (2L, "aa bb cc dd")))
    assert(m(1L).getAs[Long]("n_words") === 4L)
    assert(m(1L).getAs[Double]("mean_word_len") === m(2L).getAs[Double]("mean_word_len"))
  }

  test("stopword probe is case- and punctuation-blind") {
    // 'The,' 'OF.' 'And!' all hit; raw-split matching would find none
    val m = run(Seq((1L, "The, quick fox OF. the woods And! more")))
    assert(m(1L).getAs[Long]("stop_hits") === 3L) // the, of, and
    assert(m(1L).getAs[Boolean]("r_stop") === true)
  }

  test("null text: metrics null, every rule flag and keep exactly false") {
    val m = run(Seq((1L, null.asInstanceOf[String]), (2L, "ok text here")))
    val r = m(1L)
    assert(r.isNullAt(r.fieldIndex("n_words")))
    assert(r.isNullAt(r.fieldIndex("mean_word_len")))
    Seq("r_wordcount", "r_meanlen", "r_symbol", "r_bullet", "r_ellipsis",
      "r_alpha", "r_stop", "r_dupline", "keep").foreach { c =>
      assert(!r.isNullAt(r.fieldIndex(c)), s"$c must not be null")
      assert(r.getAs[Boolean](c) === false, s"$c must be false for null text")
    }
  }

  test("null text lands on exactly one side of a keep split") {
    import spark.implicits._
    val df = QualityRules.gopherRules(
      Seq((1L, null.asInstanceOf[String]), (2L, "some text")).toDF("doc_id", "text"),
      "text", Seq("doc_id"))
    val kept = df.filter(col("keep")).count()
    val dropped = df.filter(!col("keep")).count()
    assert(kept + dropped === 2L, "null-text row vanished from both filter sides")
  }

  test("duplicate-line fraction: repeated nav bar trips r_dupline") {
    val m = run(Seq((1L, "nav bar\nnav bar\nnav bar\nreal content here")))
    assert(m(1L).getAs[Double]("dup_line_frac") === 0.5)
    assert(m(1L).getAs[Boolean]("r_dupline") === false)
  }

  test("a clean prose document passes every rule") {
    val prose = ("the quick brown fox jumps over that lazy dog and they have " +
      "plenty of time with which to admire the meadow ") * 3 // 63 words ≥ MinWords
    val m = run(Seq((1L, prose.trim)))
    assert(m(1L).getAs[Boolean]("keep") === true,
      m(1L).mkString(", "))
  }
}
