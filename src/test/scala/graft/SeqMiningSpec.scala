package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SeqMining

class SeqMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("seqPairs: ∃-before decided by per-(user,type) extremes, hand-counted") {
    // u1: A@1 B@2 (A→B); u2: B@1 A@2 (B→A); u3: A@1 only
    val ev = Seq(
      (1L, "A", ts(1)), (1L, "B", ts(2)),
      (2L, "B", ts(1)), (2L, "A", ts(2)),
      (3L, "A", ts(1))).toDF("user_id", "event_type", "ts")
    val r = SeqMining.seqPairs(ev, "user_id", "event_type", "ts")
      .as[(String, String, Long, Double)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4))).toMap
    assert(r(("A", "B")) == ((1L, 1.0 / 3)), s"got $r")
    assert(r(("B", "A")) == ((1L, 1.0 / 3)), s"got $r")
    assert(r.size == 2, s"no other pair qualifies: $r")
  }

  test("seqPairs: equal timestamps are NOT 'before' (strict order); repeats don't double-count a user") {
    // u1 has A and B at the same instant -> neither direction; u2 has
    // many interleaved repeats -> still one user in each direction
    val ev = Seq(
      (1L, "A", ts(5)), (1L, "B", ts(5)),
      (2L, "A", ts(1)), (2L, "B", ts(2)), (2L, "A", ts(3)), (2L, "B", ts(4)))
      .toDF("user_id", "event_type", "ts")
    val r = SeqMining.seqPairs(ev, "user_id", "event_type", "ts")
      .as[(String, String, Long, Double)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    assert(r(("A", "B")) == 1L && r(("B", "A")) == 1L, s"got $r")
  }

  test("seqPairs: minUsers prunes sparse pairs") {
    val ev = Seq(
      (1L, "A", ts(1)), (1L, "B", ts(2)),
      (2L, "A", ts(1)), (2L, "B", ts(2)),
      (3L, "C", ts(1)), (3L, "B", ts(2))).toDF("user_id", "event_type", "ts")
    val r = SeqMining.seqPairs(ev, "user_id", "event_type", "ts", minUsers = 2)
      .as[(String, String, Long, Double)].collect()
    assert(r.map(x => (x._1, x._2)).toSet == Set(("A", "B")), s"got ${r.toSeq}")
    assert(r.head._3 == 2L && math.abs(r.head._4 - 2.0 / 3) < 1e-12)
  }
}
