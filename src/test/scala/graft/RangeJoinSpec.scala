package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("proximity semantics: inclusive at exactly radius, cross-bin pairs found") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 160L), (3L, 10L, 161L), (4L, 20L, 100L))
      .toDF("id", "k", "sec")
    val right = Seq((10L, 100L, "a")).toDF("k", "rsec", "tag")
    val got = RangeJoin.proximityJoin(left, right, "k", "sec", "rsec", 60L)
      .select("id").as[Long].collect().toSet
    // id=2 at distance exactly 60 → included; id=3 at 61 → excluded;
    // id=4 wrong key → excluded
    assert(got == Set(1L, 2L))
    // bin-boundary case: left at 119 (bin 1), right at 121 (bin 2) —
    // only adjacent-bin explosion finds this pair
    val l2 = Seq((1L, 1L, 119L)).toDF("id", "k", "sec")
    val r2 = Seq((1L, 121L, "x")).toDF("k", "rsec", "tag")
    assert(RangeJoin.proximityJoin(l2, r2, "k", "sec", "rsec", 60L).count() == 1)
  }

  test("binned equi-join ≡ nested-loop twin on real events") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).cast("long").as("sec"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("sec").as("err_sec"), col("event_id").as("err_id"))
    val others = e.filter(col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("sec"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "err_id").as[(String, String)].collect().toSet
    val binned = pairs(RangeJoin.proximityJoin(others, errors, "user_id", "sec", "err_sec", 60L))
    val nested = pairs(RangeJoin.proximityJoinNested(others, errors, "user_id", "sec", "err_sec", 60L))
    assert(binned.nonEmpty && binned == nested)
  }

  test("binned plan is an equi-join, not a broadcast nested loop") {
    val e = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).cast("long").as("sec"))
    val p = RangeJoin.proximityJoin(e, e.select(col("user_id"), col("sec").as("rsec")),
        "user_id", "sec", "rsec", 60L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(500))
  }

  test("overlapJoin: equals the nested-loop formulation on a seeded interval sweep, " +
    "for several bin widths, with no duplicate pairs") {
    import spark.implicits._
    var state = 7L
    def next(mod: Long): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      math.floorMod(state >>> 16, mod)
    }
    val ivs = (1L to 120L).map { id =>
      val s = next(5000); (id, s, s + next(400))
    }
    val l = ivs.toDF("lid", "ls", "le")
    val r = ivs.map { case (id, s, e) => (id + 1000, s, e) }.toDF("rid", "rs", "re")
    val want = ivs.flatMap { case (a, s1, e1) =>
      ivs.collect { case (b, s2, e2) if s1 <= e2 && s2 <= e1 => (a, b + 1000) }
    }.sorted
    for (bw <- Seq(1L, 37L, 400L, 10000L)) {
      val got = RangeJoin.overlapJoin(l, r, "ls", "le", "rs", "re", binWidth = bw)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"binWidth=$bw: got ${got.size}, want ${want.size}")
    }
  }

  test("overlapJoin: touching endpoints overlap (closed intervals); disjoint don't; " +
    "equi-join plan") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val r = Seq((1L, 10L, 20L), (2L, 11L, 20L)).toDF("rid", "rs", "re")
    val j = RangeJoin.overlapJoin(l, r, "ls", "le", "rs", "re", binWidth = 4L)
    assert(j.select("rid").as[Long].collect().toSeq == Seq(1L))
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(500))
  }
}
