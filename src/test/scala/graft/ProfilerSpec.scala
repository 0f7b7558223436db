package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: null counting, cardinality, ranges per type family") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, Some(2.5)),
      (3L, Some("c"), None),
      (4L, Some("a"), Some(10.25))
    ).toDF("id", "s", "d")
    val rows = Profiler.profile(df, Seq("id", "s", "d"))
      .as[(String, Long, Long, Long, String, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      ("d", 4L, 3L, 3L, "1.500000", "10.250000"),
      ("id", 4L, 4L, 4L, "1", "4"),
      ("s", 4L, 3L, 2L, "a", "c")))
  }

  test("profile reads the table once (single scan, Expand for the distinct aggs)") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "orders")
    val plan = Profiler.profile(docs, Seq("o_orderkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("all-null column: zero nonnull/distinct, null-rendered range") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = Profiler.profile(df, Seq("s")).as[(String, Long, Long, Long, String, String)].head()
    assert(r._3 == 0L && r._4 == 0L && r._5 == null && r._6 == null)
  }

  test("madOutliers: planted spike flagged, tight cluster untouched, robust to the spike itself") {
    // group g: 99 values at 10±0.5 plus one 1000 spike — mean/stddev
    // would be dragged (~(1000-20)/99 sigma pull); med/MAD are not
    val vals = (1 to 99).map(i => ("g", 10.0 + (i % 11 - 5) * 0.1)) :+ (("g", 1000.0))
    val df = vals.toDF("k", "v")
    val out = Profiler.madOutliers(df, "k", "v")
    val flagged = out.filter($"is_outlier").select("v").as[Double].collect().toSeq
    assert(flagged == Seq(1000.0), s"expected only the spike, got $flagged")
    // med/mad land on the clean cluster
    val (med, mad) = out.select("med", "mad").as[(Double, Double)].head()
    assert(med > 9.0 && med < 11.0)
    assert(mad < 1.0)
  }

  test("madOutliers: constant group has MAD 0 and flags only deviants") {
    val df = (Seq.fill(20)(("c", 5.0)) ++ Seq(("c", 5.1))).toDF("k", "v")
    val flagged = Profiler.madOutliers(df, "k", "v")
      .filter($"is_outlier").select("v").as[Double].collect().toSeq
    assert(flagged == Seq(5.1), "any deviation from a zero-MAD group is an outlier")
  }

  test("winsorize: values clip to the group fences, interior rows untouched") {
    // k=a: values 0..100 → p05=5, p95=95 exactly (101 evenly spaced pts)
    val df = (0 to 100).map(v => ("a", v.toDouble)).toDF("k", "v")
    val out = graft.operators.Profiler.winsorize(df, "k", "v")
      .select("v", "clipped").as[(Double, Double)].collect().toMap
    assert(out(0.0) == 5.0 && out(3.0) == 5.0, "below-fence rows clip up")
    assert(out(100.0) == 95.0 && out(97.0) == 95.0, "above-fence rows clip down")
    assert(out(50.0) == 50.0 && out(5.0) == 5.0, "interior and fence rows pass through")
  }

  test("keyDistribution: hot key ranks first, share and skew factor exact") {
    // 10 "hot" + 2+2+1 others: total 15, 4 keys, max 10
    // skew = max/avg = 10/(15/4) = 8/3
    val df = (Seq.fill(10)("hot") ++ Seq("a", "a", "b", "b", "c")).toDF("k")
    val rows = graft.operators.Profiler.keyDistribution(df, "k", topN = 2)
      .select("k", "n", "share", "skew_factor")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length == 2)
    assert(rows.head == (("hot", 10L, 10.0 / 15, 10.0 * 4 / 15)))
    assert(rows(1)._1 == "a" && rows(1)._2 == 2L, "count-desc then key tiebreak")
  }
}
