package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsofJoin, RangeJoin}

/** Property tests for the scale-shaped join operators: on randomly
  * generated data — duplicate timestamps, clustered keys, empty-side
  * keys included — the fast formulation (union-window asof / binned
  * range) must agree row-for-row with its naive twin. The fixtures in
  * AsofJoinSpec/RangeJoinSpec pin known edge cases; this sweeps the
  * space between them. */
class JoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // small key/time domains on purpose: collisions (same key, same
  // second) must be COMMON in the sample for the tie paths to be hit
  private val rowGen = for {
    k <- Gen.chooseNum(1L, 8L)
    t <- Gen.chooseNum(0L, 120L)
  } yield (k, t)

  private def sample(n: Int, seed: Long): Seq[(Long, Long, Long)] =
    Gen.listOfN(n, rowGen)(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }

  test("asofJoin ≡ inequality twin on 400 random rows with heavy ts collisions") {
    val left = sample(200, 7L).toDF("id", "k", "t")
    // right side must be unique per (key, ts) — the operator's contract;
    // collapse collisions keeping the max id (deterministic)
    val right = sample(200, 99L).toDF("rid", "k", "rt")
      .groupBy(col("k"), col("rt")).agg(max(col("rid")).as("rid"))
      .withColumn("v", col("rid").cast("double"))
      .select("k", "rt", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v").as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    val fast = rows(AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v")))
    val slow = rows(AsofJoin.asofJoinViaWindow(left, right, "k", "t", "rt", Seq("v")))
    assert(fast == slow)
    assert(fast.exists(_._2.isDefined) && fast.exists(_._2.isEmpty),
      "sample must exercise both matched and unmatched rows")
  }

  test("proximityJoin ≡ nested twin on random rows across several radii") {
    val left = sample(150, 3L).toDF("id", "k", "sec")
    val right = sample(150, 4L).toDF("rid", "k", "rsec")
      .select(col("k"), col("rsec"), col("rid"))
    for (radius <- Seq(1L, 7L, 30L)) {
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "rid").as[(Long, Long)].collect().toSet
      val binned = pairs(RangeJoin.proximityJoin(left, right, "k", "sec", "rsec", radius))
      val nested = pairs(RangeJoin.proximityJoinNested(left, right, "k", "sec", "rsec", radius))
      assert(binned == nested, s"radius=$radius: binned ${binned.size} vs nested ${nested.size}")
    }
  }
}
