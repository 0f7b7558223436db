package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the three queries without a DuckDB oracle
  * (driver records rows-only for them). Values pinned from the
  * deterministic sf0.01 testdata — any logic drift fails here even
  * though the hash gate can't see it.
  *
  * Note on q_lang_id: the synthetic documents carry NO language signal
  * (token distribution is identical across declared langs — verified:
  * none of the de/es/fr marker words occur anywhere in the corpus), so
  * classification "accuracy" is meaningless by construction; the pin
  * asserts the deterministic argmax output, not linguistic quality. */
class GoldenRowsOnlySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("q_lang_id golden at sf0.01: full confusion table pinned") {
    val got = SparkEntry.queries("q_lang_id")(spark, dir)
      .as[(String, String, Long)].collect().toSet
    val expected = Set(
      ("de", "de", 2L), ("de", "en", 7L), ("de", "es", 2L), ("de", "fr", 2L), ("de", "zh", 57L),
      ("en", "de", 5L), ("en", "en", 38L), ("en", "es", 4L), ("en", "fr", 8L), ("en", "zh", 163L),
      ("es", "de", 2L), ("es", "en", 26L), ("es", "fr", 3L), ("es", "zh", 42L),
      ("fr", "de", 1L), ("fr", "en", 13L), ("fr", "es", 5L), ("fr", "fr", 1L), ("fr", "zh", 44L),
      ("zh", "de", 3L), ("zh", "en", 18L), ("zh", "es", 3L), ("zh", "fr", 2L), ("zh", "zh", 49L))
    assert(got == expected)
  }

  test("q_multimodal_features golden at sf0.01: count + first rows + domains") {
    val df = SparkEntry.queries("q_multimodal_features")(spark, dir)
    val rows = df.collect()
    assert(rows.length == 500)
    val first3 = rows.take(3).map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).toSeq
    assert(first3 == Seq(
      (0L, "image", 157L, 92.4076, 0.1975),
      (1L, "audio", 406L, 95.0222, 0.1749),
      (2L, "video", 246L, 94.065, 0.1789)))
    // decode-stub feature domains hold for every asset
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0))
    assert(rows.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q_approx_stats within documented tolerance of exact (2% distinct, 1% p90)") {
    val approx = SparkEntry.queries("q_approx_stats")(spark, dir)
      .select("event_type", "approx_users", "approx_p90")
      .as[(String, Long, Double)].collect().map { case (t, u, p) => t -> ((u, p)) }.toMap
    val exact = graft.core.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct($"user_id").as("u"), expr("percentile(value, 0.9)").as("p"))
      .as[(String, Long, Double)].collect().map { case (t, u, p) => t -> ((u, p)) }.toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, (u, p)) =>
      val (au, ap) = approx(t)
      assert(math.abs(au - u).toDouble / u <= 0.02, s"$t distinct: $au vs $u")
      assert(math.abs(ap - p) / p <= 0.01, s"$t p90: $ap vs $p")
    }
  }
}
