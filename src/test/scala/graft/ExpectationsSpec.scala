package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations._

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each expectation isolates exactly its violating rows") {
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, 5.0),        // null name
      (3L, Some("zz"), -1.0), // out of range + out of enum
      (3L, Some("a"), 3.0)    // duplicate id
    ).toDF("id", "name", "v")
    assert(notNull(df, "name").count() == 1)
    assert(inRange(df, "v", 0, 100).count() == 1)
    assert(inSet(df, "name", Seq("a", "b")).count() == 1)
    assert(unique(df, Seq("id")).count() == 1) // one duplicated key group
  }

  test("refIntegrity flags orphans only, null FKs excluded") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None)).toDF("id", "fk")
      .selectExpr("id", "CAST(fk AS BIGINT) AS fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val orphans = refIntegrity(child, "fk", parent, "pk")
    assert(orphans.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("report: one ordered row per check with pass flags") {
    val df = Seq((1L, 5.0), (2L, -3.0)).toDF("id", "v")
    val r = report(Seq(
      "b_range" -> inRange(df, "v", 0, 10),
      "a_ids_unique" -> unique(df, Seq("id"))))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(r == Seq(("a_ids_unique", 0L, true), ("b_range", 1L, false)))
  }
}
