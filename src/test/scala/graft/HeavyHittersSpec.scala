package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.HeavyHitters.mgHeavyHitters
import graft.plans.MgBuffer

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Stream with known truth: `heavy` items at freq H each, plus a wide
    * light tail of distinct items — vocabulary far above m. */
  private def corpus(heavy: Int, h: Int, tail: Int): Seq[String] = {
    val hot = (0 until heavy).flatMap(i => Seq.fill(h)(s"hot$i"))
    val cold = (0 until tail).map(i => s"cold$i")
    // deterministic interleave (no Random: order shouldn't matter anyway)
    (hot ++ cold).sortBy(_.hashCode)
  }

  test("no false negatives: every item with freq > n/(m+1) is retained under any partitioning") {
    val items = corpus(heavy = 5, h = 200, tail = 400) // n = 1400, m+1 = 17 → bound 82
    for (parts <- Seq(1, 4, 13)) {
      val got = items.toDF("item").repartition(parts)
        .agg(mgHeavyHitters(col("item"), 16).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
      (0 until 5).foreach { i =>
        assert(got.contains(s"hot$i"), s"hot$i missing at $parts partitions")
      }
      assert(got.size <= 16, "state exceeded m counters")
      // estimates never overestimate and undercount is bounded by n/(m+1)
      got.foreach { case (k, est) =>
        val truth = if (k.startsWith("hot")) 200L else 1L
        assert(est <= truth, s"$k overestimated: $est > $truth")
      }
      (0 until 5).foreach { i =>
        assert(200L - got(s"hot$i") <= 1400L / 17, s"hot$i undercount out of bound")
      }
    }
  }

  test("buffer-level MG semantics: decrement-all cancellation and bounded size") {
    val buf = new MgBuffer(2)
    Seq("a", "a", "a", "b", "c").foreach(buf.add) // c triggers decrement-all
    assert(buf.counts.size <= 2)
    assert(buf.counts("a") == 2) // 3 - 1
    assert(!buf.counts.contains("b") && !buf.counts.contains("c"))
  }

  test("merge subtracts the (m+1)-th largest and keeps the invariant") {
    val x = new MgBuffer(2)
    Seq("a", "a", "a", "b").foreach(x.add)
    val y = new MgBuffer(2)
    Seq("c", "c", "d").foreach(y.add)
    x.mergeIn(y) // a:3 b:1 c:2 d:1 → subtract 3rd largest (1) → a:2 c:1
    assert(x.counts.size <= 2)
    assert(x.counts("a") == 2 && x.counts("c") == 1)
  }

  test("vocabulary smaller than m degenerates to exact counts") {
    val items = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ Seq.fill(7)("z")
    val got = items.toDF("item").repartition(5)
      .agg(mgHeavyHitters(col("item"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 50L, "y" -> 30L, "z" -> 7L))
  }
}
