package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg matches plain aggregation on a skewed key") {
    val df = (Seq.fill(5000)(("hot", 1.0)) ++ Seq.tabulate(100)(i => (s"k$i", 2.0)))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), saltBuckets = 8, aggs = scala.collection.immutable.ListMap(
        "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
        "s" -> (sum($"v"), (c: org.apache.spark.sql.Column) => sum(c))))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin matches plain join") {
    val left = (Seq.fill(1000)(("hot", 1)) ++ Seq.tabulate(50)(i => (s"k$i", i))).toDF("k", "lv")
    val right = (Seq("hot") ++ Seq.tabulate(50)(i => s"k$i")).map(k => (k, k.length)).toDF("k", "rv")
    val plain = left.join(right, "k").as[(String, Int, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k", saltBuckets = 4)
      .select("k", "lv", "rv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted == plain)
  }
}
