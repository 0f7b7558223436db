package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NaiveBayes

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fitPredict: separable vocabularies self-classify perfectly") {
    val docs = Seq(
      (1L, "apple banana apple", "fruit"),
      (2L, "banana apple", "fruit"),
      (3L, "car truck", "vehicle"),
      (4L, "truck truck car", "vehicle")).toDF("doc_id", "text", "label")
    val p = NaiveBayes.fitPredict(docs, "doc_id", "text", "label")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(p.size == 4)
    p.foreach { case (id, (t, pred, correct)) =>
      assert(pred == t && correct, s"doc $id misclassified: true=$t pred=$pred") }
  }

  test("fitPredict: exact fixed-point tie breaks to the larger label") {
    // perfectly symmetric corpus: identical text, one doc per class —
    // every class score is the same exact long, so argmax must take
    // the LARGER label for both docs (max(struct) contract)
    val docs = Seq((1L, "x y", "a"), (2L, "x y", "b")).toDF("doc_id", "text", "label")
    val p = NaiveBayes.fitPredict(docs, "doc_id", "text", "label")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(p == Map(1L -> "b", 2L -> "b"), s"tie must break high: $p")
  }

  test("confusion: counts land in the right cells; accuracy recoverable") {
    val docs = Seq(
      (1L, "apple apple apple apple", "fruit"),
      (2L, "apple banana", "fruit"),
      (3L, "apple apple apple apple", "vehicle"), // mislabeled on purpose
      (4L, "car truck car truck", "vehicle")).toDF("doc_id", "text", "label")
    val c = NaiveBayes.confusion(NaiveBayes.fitPredict(docs, "doc_id", "text", "label"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // doc 3's text is pure fruit vocabulary -> predicted fruit
    assert(c(("vehicle", "fruit")) == 1L, s"got $c")
    assert(c(("fruit", "fruit")) == 2L && c(("vehicle", "vehicle")) == 1L, s"got $c")
    assert(c.values.sum == 4L)
  }
}
