package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextAnalysis
import graft.generator.Generator

class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def classified = {
    val docs = Generator.languageCorpus("langfix").toDF("doc_id", "lang", "text")
    docs
      .withColumn("toks", TextAnalysis.tokens("text"))
      .withColumn("guess", TextAnalysis.langGuess("toks", "text"))
  }

  test("accuracy > 0.9 on the generator's language-marked fixture (30% shared-token noise)") {
    val g = classified.select(col("lang"), col("guess")).as[(String, String)].collect()
    assert(g.length == 250)
    val acc = g.count { case (l, p) => l == p }.toDouble / g.length
    assert(acc > 0.9, s"language-ID accuracy $acc on signal-bearing fixture")
    // every language individually above the bar — a classifier that
    // nails 4 languages and punts one shouldn't pass on the average
    Generator.languageCorpus("langfix").map(_._2).distinct.foreach { lang =>
      val rows = g.filter(_._1 == lang)
      val a = rows.count { case (l, p) => l == p }.toDouble / rows.length
      assert(a > 0.9, s"per-language accuracy for $lang = $a")
    }
  }

  test("CJK probe wins even for mixed CJK/ascii text; no-signal text is 'und'") {
    val df = Seq(
      (1L, "spark 数据 join 查询 merge"),
      (2L, "zzz qqq xxx parquet shuffle")).toDF("doc_id", "text")
      .withColumn("toks", TextAnalysis.tokens("text"))
      .withColumn("guess", TextAnalysis.langGuess("toks", "text"))
    val m = df.select("doc_id", "guess").as[(Long, String)].collect().toMap
    assert(m(1L) == "zh")
    assert(m(2L) == "und")
  }

  test("fixture is deterministic: same runId reproduces byte-identical corpus") {
    assert(Generator.languageCorpus("langfix") == Generator.languageCorpus("langfix"))
    assert(Generator.languageCorpus("a") != Generator.languageCorpus("b"))
  }
}
