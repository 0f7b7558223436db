package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SetExpressions

/** SortedIntersectCount ≡ size(array_intersect) on sorted-unique
  * arrays — both the codegen path (DataFrame eval) and edge shapes. */
class SetExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches array_intersect on random sorted-unique long arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      def arr() = Iterator.continually(rnd.nextLong() % 500)
        .take(rnd.nextInt(60) + 1).toSeq.distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("fast", SetExpressions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("fast") =!= col("ref")).count()
    assert(bad == 0, s"$bad rows disagree with array_intersect")
  }

  test("edges: empty, disjoint, identical, subset") {
    val df = Seq(
      (1L, Seq.empty[Long], Seq(1L, 2L)),
      (2L, Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (3L, Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)),
      (4L, Seq(1L, 2L, 3L, 4L), Seq(2L, 4L)))
      .toDF("id", "a", "b")
      .withColumn("c", SetExpressions.sortedIntersectCount(col("a"), col("b")))
    val got = df.select("id", "c").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 2L), s"got $got")
  }

  test("interpreted eval agrees with codegen (collapsed to literal via constant folding)") {
    // a Dataset-free eval through the expression directly
    val e = graft.plans.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 9L), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 9L), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2L)
  }
}
