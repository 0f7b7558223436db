package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Survival

/** Kaplan-Meier against the textbook hand computation, and the
  * censoring frame (still-active-at-boundary ≠ churned). */
class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kaplanMeier: textbook 5-subject curve with censoring") {
    // durations (observed): 1+, 2+, 2c, 3+, 4c
    // S(1) = 4/5 = .8; S(2) = .8·(3/4) = .6; S(3) = .6·(1/2) = .3; S(4) = .3
    val subj = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
      .toDF("duration", "observed")
    val r = Survival.kaplanMeier(subj, "duration", "observed")
      .select("duration", "n_risk", "n_events", "n_censored", "survival")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L)._2 == 5L && r(1L)._3 == 1L)
    assert(r(2L)._2 == 4L && r(2L)._3 == 1L && r(2L)._4 == 1L)
    assert(r(3L)._2 == 2L && r(4L)._2 == 1L)
    assert(math.abs(r(1L)._5 - 0.8) < 1e-6, s"S(1) ${r(1L)._5}")
    assert(math.abs(r(2L)._5 - 0.6) < 1e-6, s"S(2) ${r(2L)._5}")
    assert(math.abs(r(3L)._5 - 0.3) < 1e-6, s"S(3) ${r(3L)._5}")
    assert(math.abs(r(4L)._5 - 0.3) < 1e-6, "censoring-only step must not move the curve")
  }

  test("kaplanMeier: everyone-churns bucket drives survival to 0, not -Inf") {
    val subj = Seq((1L, 1L), (1L, 1L)).toDF("duration", "observed")
    val s = Survival.kaplanMeier(subj, "duration", "observed")
      .select("survival").as[Double].head()
    assert(s >= 0.0 && s < 1e-6, s"curve must hit ~0, got $s")
  }

  test("churnSubjects: silence rule separates churned from censored") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-05 10:00:00")), // silent 25d -> churned
      (2L, ts("2024-01-10 08:00:00")), (2L, ts("2024-01-30 09:00:00")) // active at end -> censored
    ).toDF("user_id", "ts")
    val got = Survival.churnSubjects(ev, "user_id", "ts", silenceDays = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (4L, 1L), s"user 1 ${got(1L)}")   // 4-day span, observed
    assert(got(2L) == (20L, 0L), s"user 2 ${got(2L)}") // 20-day span, censored
  }
}
