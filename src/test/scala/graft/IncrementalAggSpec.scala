package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("k")

  private def stateMap(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("merge(partials(A), partials(B)) == partials(A ∪ B) exactly") {
    val a = Seq(("x", 5L), ("x", 7L), ("y", 1L)).toDF("k", "v")
    val b = Seq(("x", 2L), ("z", 9L), ("y", -4L)).toDF("k", "v")
    val merged = stateMap(IncrementalAgg.merge(keys,
      IncrementalAgg.partials(a, keys, "v"),
      IncrementalAgg.partials(b, keys, "v")))
    val full = stateMap(IncrementalAgg.partials(a.unionByName(b), keys, "v"))
    assert(merged == full)
    assert(merged("x") == ((3L, 14L, 2L, 7L)))
    assert(merged("y") == ((2L, -3L, -4L, 1L)))
    assert(merged("z") == ((1L, 9L, 9L, 9L)))
  }

  test("merge is associative and variadic: fold order doesn't matter") {
    val batches = (0 until 4).map(i =>
      Seq(("a", i.toLong), ("b", 10L * i)).toDF("k", "v"))
    val states = batches.map(IncrementalAgg.partials(_, keys, "v"))
    val variadic = stateMap(IncrementalAgg.merge(keys, states: _*))
    val nested = stateMap(IncrementalAgg.merge(keys,
      IncrementalAgg.merge(keys, states(0), states(1)),
      IncrementalAgg.merge(keys, states(2), states(3))))
    assert(variadic == nested)
    assert(variadic("a") == ((4L, 6L, 0L, 3L)))
  }

  test("delta keys unseen in the base appear; base keys missing from delta persist") {
    val base = Seq(("old", 1L)).toDF("k", "v")
    val delta = Seq(("new", 2L)).toDF("k", "v")
    val merged = stateMap(IncrementalAgg.merge(keys,
      IncrementalAgg.partials(base, keys, "v"),
      IncrementalAgg.partials(delta, keys, "v")))
    assert(merged == Map("old" -> ((1L, 1L, 1L, 1L)), "new" -> ((1L, 2L, 2L, 2L))))
  }

  test("finalized derives avg from the state, no refeed of facts") {
    val s = IncrementalAgg.partials(Seq(("a", 2L), ("a", 4L)).toDF("k", "v"), keys, "v")
    val avg = IncrementalAgg.finalized(s).select("avg_v").as[Double].head()
    assert(avg == 3.0)
  }
}
