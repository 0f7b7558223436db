package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, MergeOps, Similarity, Validation}

/** Degenerate-input robustness: empty frames, k>n, single rows —
  * operators must return empty/small results, never throw. */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup family on empty input") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", "text").count() == 0)
    val sig = Dedup.minhashSignatures(emptyDocs, "doc_id", "text")
    assert(sig.count() == 0)
    assert(Dedup.lshCandidatePairs(sig, "doc_id", 8, 2).count() == 0)
    assert(Dedup.simhash16(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("minhash of empty-token docs yields null signature, not a crash") {
    val docs = Seq((1L, "!!! ???"), (2L, "real words here ok now yes")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    // doc 1 has no shingles at all -> no row (explode of empty array)
    assert(sig.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("topk with k larger than corpus") {
    val vs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(vs, vs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
    assert(r.count() == 1) // only one candidate exists
    val h = Similarity.heapTopK(vs, vs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
    assert(h.count() == 1)
  }

  test("upsert with empty source leaves target unchanged") {
    val target = Seq(("a", 1L, "x")).toDF("k", "ts", "v")
    val source = target.filter(lit(false))
    val merged = MergeOps.upsert(target, source, Seq("k"), Seq(col("ts").desc))
    assert(merged.as[(String, Long, String)].collect().toSeq == Seq(("a", 1L, "x")))
  }

  test("connected components of an empty pair list is empty, no hang") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("connected components of a single pair is one 2-node cluster") {
    val one = Seq((5L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(one)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 9L -> 5L))
  }

  test("registry thresholds fall back to defaults when nothing is effective") {
    import graft.functions.Decisions.Thresholds
    import graft.serving.BaselineRegistry
    val reg = BaselineRegistry.seed(spark)
    // as-of before any generation → defaults
    val early = BaselineRegistry.thresholds(reg, "graft_rules_v1", "2020-01-01")
    assert(early == Thresholds())
    // unknown rule version → defaults with that version
    val unknown = BaselineRegistry.thresholds(reg, "no_such_rules", "2026-06-01")
    assert(unknown == Thresholds(ruleVersion = "no_such_rules"))
  }

  test("kMeansFit on a tiny corpus returns usable centroids") {
    val vs = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val fit = Similarity.kMeansFit(vs, "vec_id", "embedding", stride = 2, iters = 1)
    val n = fit.count()
    assert(n >= 1 && n <= 2)
    assert(Similarity.ivfTopKWith(vs, vs.filter(col("vec_id") === 0), "vec_id", "embedding", 2, fit)
      .count() >= 1)
  }

  test("validation of empty frame returns empty splits") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("event_type", StringType), StructField("props", StringType),
        StructField("value", DoubleType))))
    val s = Validation.split(Validation.withEventFields(empty), Validation.eventRules())
    assert(s.valid.count() == 0 && s.invalid.count() == 0)
  }
}
