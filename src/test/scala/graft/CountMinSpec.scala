package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** The CMS contracts the q_cms_words hash-equality oracle can't state
  * on its own: the one-sided error guarantee, the ε-bound, and the
  * cell-wise union merge algebra that makes the sketch shard. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def terms(n: Int): Seq[String] =
    (0 until n).flatMap(i => Seq.fill(i % 7 + 1)(s"term_${i % 40}"))

  test("estimates are never below exact counts and respect the e/width bound") {
    val items = terms(600).toDF("term")
    val total = items.count()
    val sketch = CountMin.build(items, "term", depth, width)
    val exact = items.groupBy("term").agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(sketch, exact, "term", depth, width)
      .select("term", "exact_n", "cms_est").as[(String, Long, Long)].collect()
    assert(est.length == 40)
    est.foreach { case (t, ex, e) =>
      assert(e >= ex, s"$t: CMS must never undercount ($e < $ex)")
      // standard bound: overcount ≤ e/width · N holds w.p. 1−(1/e)^depth
      // per query; with depth 4 a violation on this fixed corpus would
      // mean the hash rows are not behaving independently
      assert(e - ex <= math.ceil(math.E / width * total).toLong,
        s"$t: overcount ${e - ex} beyond ε-bound")
    }
  }

  test("union merge: summing two half-corpus sketches cell-wise equals the full-corpus sketch") {
    val all = terms(600)
    val (a, b) = all.splitAt(all.length / 2)
    val merged = CountMin.build(a.toDF("term"), "term", depth, width)
      .unionAll(CountMin.build(b.toDF("term"), "term", depth, width))
      .groupBy("row", "bucket").agg(sum(col("n")).as("n"))
    val whole = CountMin.build(all.toDF("term"), "term", depth, width)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("unseen probes estimate 0 when their buckets are empty (sparse sketch, left join)") {
    val items = Seq("a", "a", "b").toDF("term")
    // width large enough that 3 items can't fill the probe's buckets
    val sketch = CountMin.build(items, "term", depth, width = 8192)
    val est = CountMin.estimate(sketch, Seq("never_seen_zzz").toDF("term"), "term", depth, 8192)
      .select("cms_est").as[Long].head()
    assert(est == 0L)
  }

  test("probe never shuffles: the sketch side joins as a broadcast") {
    val items = terms(600).toDF("term")
    val sketch = CountMin.build(items, "term", depth, width)
    val plan = CountMin.estimate(sketch, items.distinct(), "term", depth, width)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
  }
}
