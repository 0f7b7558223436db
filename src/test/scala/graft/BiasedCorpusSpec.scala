package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The embedding near-dup bucket key must not collapse on a
  * sign-biased corpus. Real embedding models often emit coordinates
  * whose signs are strongly biased (e.g. all-positive after a ReLU-ish
  * head); a key built from raw leading-dim signs then sends every row
  * to ONE bucket and the within-bucket self-join is all-pairs — the
  * exact scale-killer the bucketing exists to avoid. The WTA
  * (rank-comparison) key compares seeded coordinate pairs instead, so
  * it keeps fanning out under per-dimension bias, uniform shifts, and
  * positive scaling. */
class BiasedCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic all-POSITIVE-coordinate corpus (the biased-sign
    * worst case): 64 vectors x 16 dims, values in (0, 2). */
  private def biased = {
    val rows = (0L until 64L).map { id =>
      val v = Array.tabulate(16) { i =>
        (1.0 + math.sin(id * 16 + i)).toFloat match { case x => if (x <= 0f) 0.01f else x }
      }
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("WTA bucket fans out on an all-positive corpus (raw sign key collapses to 1)") {
    val signKey = biased.select(
      expr("aggregate(slice(embedding, 1, 8), 0L, (acc, x) -> acc * 2 + CASE WHEN x >= 0 THEN 1 ELSE 0 END)")
        .as("b"))
      .distinct().count()
    assert(signKey == 1L, s"precondition: raw sign key should collapse, got $signKey buckets")

    val wta = biased.select(Dedup.wtaBucket("embedding", 8).as("b")).distinct().count()
    assert(wta > 8L, s"WTA bucket fan-out on biased corpus = $wta (collapse not fixed)")
  }

  test("WTA bucket is invariant to uniform shift and positive scaling") {
    val base = biased.select(col("vec_id"), Dedup.wtaBucket("embedding", 8).as("b"))
    val shifted = biased
      .withColumn("embedding", expr("transform(embedding, x -> CAST(x * 3.0 + 100.0 AS FLOAT))"))
      .select(col("vec_id"), Dedup.wtaBucket("embedding", 8).as("b2"))
    assert(base.join(shifted, "vec_id").filter(col("b") =!= col("b2")).count() == 0L)
  }

  test("length-1 vectors are keyed NULL and excluded, not crashed on (ANSI % 0)") {
    val mixed = biased.unionByName(
      Seq((2000L, Array(1.0f))).toDF("vec_id", "embedding"))
    val buckets = mixed.select(col("vec_id"), Dedup.wtaBucket("embedding", 8).as("b"))
    assert(buckets.filter(col("vec_id") === 2000L).select("b").head().isNullAt(0))
    // and pair generation simply skips it
    val pairs = Dedup.embeddingNearDups(mixed, "vec_id", "embedding", threshold = -1.0)
      .filter(col("id_a") === 2000L || col("id_b") === 2000L).count()
    assert(pairs == 0L)
  }

  test("near-identical pair still collides and is reported on the biased corpus") {
    // plant an exact near-dup of vec 7 (one coordinate nudged 1e-3)
    val dup = biased.filter(col("vec_id") === 7)
      .select(lit(1000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(CASE WHEN i = 3 THEN x + 0.001 ELSE x END AS FLOAT))")
          .as("embedding"))
    val corpus = biased.unionByName(dup)
    val pairs = Dedup.embeddingNearDups(corpus, "vec_id", "embedding", threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 1000L)), s"planted near-dup not found; got $pairs")
  }
}
