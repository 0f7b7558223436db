package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Decisions
import graft.functions.Decisions._

/** Property tests: the Column-expression decision pipeline and the pure
  * case-class twin must agree on every input (mirrors the reference's
  * dual Python/SQL implementation, asserted equal). */
class DecisionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val counterGen = for {
    v <- Gen.chooseNum(0L, 500L)
    c <- Gen.chooseNum(0L, 200L)
    p <- Gen.chooseNum(0L, 100L)
    e <- Gen.chooseNum(0L, 100L)
  } yield Rolling30m(v, c, p, e)

  test("column expressions agree with pure functions on random counters") {
    val th = Thresholds()
    // scalacheck as a deterministic generator (no scalatestplus bridge on
    // the offline classpath): 500 samples incl. the all-zero corner.
    val rows = Rolling30m(0, 0, 0, 0) ::
      Gen.listOfN(500, counterGen)(Gen.Parameters.default, Seed(42L)).get
    val df = rows.toDF("views_30m", "clicks_30m", "purchases_30m", "errors_30m")
    val vel = Decisions.velocityExpr(col("views_30m"), col("clicks_30m"), col("purchases_30m"))
    val compl = Decisions.completionExpr(col("clicks_30m"), col("purchases_30m"))
    val skip = Decisions.skipRateExpr(col("clicks_30m"), col("errors_30m"))
    val got = df.select(
      Decisions.decisionExpr(
        Decisions.candidateExpr(vel, col("views_30m"), th),
        Decisions.qualityGateExpr(compl, skip, col("clicks_30m"), th),
        Decisions.underExposedExpr(col("views_30m"), col("clicks_30m"), col("purchases_30m"), th))
        .as("decision"))
      .as[String].collect().toSeq
    val want = rows.map(r => Decisions.decide(r, th))
    assert(got == want)
  }

  test("decision precedence: BOOST beats REVIEW beats RESCUE") {
    // candidate+gate (+underExposed irrelevant) => BOOST
    assert(decide(Flags(candidate = true, qualityGatePass = true, underExposed = true)) == Boost)
    assert(decide(Flags(candidate = true, qualityGatePass = false, underExposed = true)) == Review)
    assert(decide(Flags(candidate = false, qualityGatePass = true, underExposed = true)) == Rescue)
    assert(decide(Flags(candidate = false, qualityGatePass = true, underExposed = false)) == NoAction)
  }

  test("denominator floors prevent cold-key explosion") {
    // 0 views: velocity denominator floors at 5, not 0
    assert(velocity(Rolling30m(0, 10, 0, 0)) == 2.0)
    assert(completion(Rolling30m(0, 0, 3, 0)) == 3.0) // clicks floor 1
  }

  test("priority and TTL maps") {
    val df = Seq(Boost, Review, Rescue).toDF("d")
    val got = df.select(
        Decisions.priorityExpr(col("d")).as("p"),
        Decisions.ttlMinutesExpr(col("d")).as("t"))
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((3, 15), (2, 30), (1, 30)))
  }
}
