package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MergeOps

class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupLatest keeps highest (order, tiebreak) row per key") {
    val df = Seq(
      ("u1", 1L, 10L, "a"), ("u1", 2L, 5L, "b"), ("u1", 2L, 7L, "c"),
      ("u2", 1L, 1L, "d")).toDF("k", "ts", "off", "v")
    val got = MergeOps.dedupLatest(df, Seq("k"), Seq(col("ts").desc, col("off").desc))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "c", "u2" -> "d"))
  }

  test("upsert: source latest wins, unmatched target rows survive") {
    val target = Seq(("u1", 1L, "old1"), ("u2", 1L, "old2")).toDF("k", "ts", "v")
    val source = Seq(("u1", 2L, "new1a"), ("u1", 3L, "new1b"), ("u3", 1L, "new3")).toDF("k", "ts", "v")
    val got = MergeOps.upsert(target, source, Seq("k"), Seq(col("ts").desc))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "new1b", "u2" -> "old2", "u3" -> "new3"))
  }

  test("dedupLatestBy (max_by aggregate) ≡ dedupLatest (window) on a total order") {
    val df = Seq(
      ("u1", 1L, 10L, "a"), ("u1", 2L, 5L, "b"), ("u1", 2L, 7L, "c"),
      ("u2", 1L, 1L, "d"), ("u3", 9L, 0L, "e")).toDF("k", "ts", "off", "v")
    val win = MergeOps.dedupLatest(df, Seq("k"), Seq(col("ts").desc, col("off").desc))
    val agg = MergeOps.dedupLatestBy(df, Seq("k"), Seq(col("ts"), col("off")))
    val w = win.orderBy("k").collect().map(_.toSeq).toSeq
    val a = agg.select(win.columns.map(col).toSeq: _*).orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == w)
  }

  test("upsertBy: source latest wins, unmatched target rows survive") {
    val target = Seq(("u1", 1L, "old1"), ("u2", 1L, "old2")).toDF("k", "ts", "v")
    val source = Seq(("u1", 2L, "new1a"), ("u1", 3L, "new1b"), ("u3", 1L, "new3")).toDF("k", "ts", "v")
    val got = MergeOps.upsertBy(target, source, Seq("k"), Seq(col("ts")))
      .select("k", "v").as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "new1b", "u2" -> "old2", "u3" -> "new3"))
  }

  test("scd2: consecutive duplicates collapse, intervals chain, current version open") {
    val log = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "view"),   // no-op update → one version
      ("u1", 3L, "click"), ("u1", 4L, "view"),  // value can recur in a LATER version
      ("u2", 1L, "buy")).toDF("k", "ts", "attr")
    val got = MergeOps.scd2(log, Seq("k"), "ts", Seq("attr"))
      .select("k", "attr", "effective_from", "effective_to", "is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      ("u1", "view", 1L, Some(3L), false),
      ("u1", "click", 3L, Some(4L), false),
      ("u1", "view", 4L, None, true),
      ("u2", "buy", 1L, None, true)))
  }

  test("snapshotAsOf: at most one version per key; boundary instant picks the NEW version") {
    val log = Seq(
      ("u1", 1L, "view"), ("u1", 3L, "click"), ("u1", 4L, "view"),
      ("u2", 1L, "buy")).toDF("k", "ts", "attr")
    val hist = MergeOps.scd2(log, Seq("k"), "ts", Seq("attr"))
    def at(t: Long) = MergeOps.snapshotAsOf(hist, lit(t))
      .select("k", "attr").as[(String, String)].collect().sorted.toSeq
    // mid-interval
    assert(at(2L) == Seq(("u1", "view"), ("u2", "buy")))
    // exactly on a version boundary: half-open intervals → new version
    assert(at(3L) == Seq(("u1", "click"), ("u2", "buy")))
    // current open version
    assert(at(99L) == Seq(("u1", "view"), ("u2", "buy")))
    // before any history: empty
    assert(at(0L).isEmpty)
    // invariant: never more than one row per key at any instant
    for (t <- 0L to 5L)
      assert(at(t).map(_._1).distinct.size == at(t).size, s"duplicate key in snapshot at $t")
  }

  test("scd2: null attribute values compare null-safely (null→null is a no-op)") {
    val log = Seq(
      ("u1", 1L, Option.empty[String]), ("u1", 2L, Option.empty[String]),
      ("u1", 3L, Some("x")), ("u1", 4L, Option.empty[String])).toDF("k", "ts", "attr")
    val got = MergeOps.scd2(log, Seq("k"), "ts", Seq("attr"))
      .select("attr", "effective_from").as[(Option[String], Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((None, 1L), (Some("x"), 3L), (None, 4L)))
  }

  test("insertIfAbsent is idempotent") {
    val target = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val rows = Seq(("b", 99), ("c", 3)).toDF("k", "v")
    val once = MergeOps.insertIfAbsent(target, rows, Seq("k"))
    val twice = MergeOps.insertIfAbsent(once, rows, Seq("k"))
    val got = twice.as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 1, "b" -> 2, "c" -> 3))
    assert(twice.count() == 3)
  }

  test("snapshotDiff: I/U/D detected, unchanged absent, null→null is not a change") {
    val before = Seq((1L, "x", Some(10.0)), (2L, "y", Option.empty[Double]),
      (3L, "z", Some(5.0))).toDF("k", "name", "bal")
    val after = Seq((2L, "y", Option.empty[Double]), (3L, "z", Some(6.0)),
      (4L, "w", Some(1.0))).toDF("k", "name", "bal")
    val got = MergeOps.snapshotDiff(before, after, Seq("k"), Seq("name", "bal"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "D"), (3L, "U"), (4L, "I")), s"got $got")
  }

  test("snapshotDiff of identical snapshots is empty") {
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "bal")
    assert(MergeOps.snapshotDiff(df, df, Seq("k"), Seq("name", "bal")).count() == 0L)
  }

  test("applyCdc: latest op wins — delete removes, later upsert resurrects, untouched survive") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq(
      (1L, 0.0, "D", 5L), (1L, 99.0, "U", 7L), // delete then resurrect → v=99
      (2L, 5.0, "U", 1L), (2L, 0.0, "D", 2L),  // update then delete → gone
      (9L, 9.0, "U", 1L))                       // insert brand-new key
      .toDF("k", "v", "op", "seq")
    val got = MergeOps.applyCdc(target, changes, Seq("k"), Seq(col("seq").desc))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 99.0, 3L -> 30.0, 9L -> 9.0), s"got $got")
  }
}
