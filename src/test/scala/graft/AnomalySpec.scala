package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planted spike is flagged; its stable season is not") {
    // season 1: 30 values at 10.00 plus one spike at 100 -> only the
    // spike exceeds 3 sigma. season 2: constant -> sd = 0 -> no flags
    // (and no divide-by-zero).
    val rows = (1 to 30).map(i => (i.toLong, "a", 1, 10.0)) ++
      Seq((31L, "a", 1, 100.0)) ++
      (40 to 50).map(i => (i.toLong, "a", 2, 5.0))
    val df = rows.toDF("event_id", "k", "season_in", "value")
    val got = Anomaly.seasonalZ(df, Seq("k"), col("season_in"), "value", sigma = 3.0)
      .select("event_id", "z").as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(31L), s"only the planted spike flags: $got")
    assert(got(31L) > 3.0)
  }

  test("baseline is row-order / partitioning invariant (fixed-point sums)") {
    val rows = (0 until 200).map(i => (i.toLong, "k", i % 4, (i % 37) + 0.25))
    val a = Anomaly.seasonalZ(rows.toDF("event_id", "k", "s", "value").repartition(1),
      Seq("k"), col("s"), "value", 1.5)
      .select("event_id", "z").as[(Long, Double)].collect().toMap
    val b = Anomaly.seasonalZ(
      scala.util.Random.shuffle(rows).toDF("event_id", "k", "s", "value").repartition(13),
      Seq("k"), col("s"), "value", 1.5)
      .select("event_id", "z").as[(Long, Double)].collect().toMap
    assert(a == b, "flag set and z values must be bit-identical under reorder")
    assert(a.nonEmpty)
  }
}
