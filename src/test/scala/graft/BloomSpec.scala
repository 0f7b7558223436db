package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** Contracts behind q_bloom_prune's result-equality oracle: the filter
  * itself never drops a true key (one-sided error), keeps its fpp
  * promise within sampling slack, and actually lands in the plan as a
  * scan-side Filter (codegen'd) rather than decorating the join. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every built key passes might_contain") {
    val keys = (1L to 2000L).toDF("k")
    val bytes = Bloom.buildBytes(keys, "k", expectedItems = 2000, fpp = 0.01)
    val kept = keys.filter(Bloom.mightContain(bytes, col("k"))).count()
    assert(kept == 2000L, s"bloom dropped ${2000 - kept} true keys")
  }

  test("false-positive rate stays near the configured fpp on disjoint probes") {
    val bytes = Bloom.buildBytes((1L to 10000L).toDF("k"), "k",
      expectedItems = 10000, fpp = 0.02)
    val probes = (1000001L to 1050000L).toDF("k")
    val fp = probes.filter(Bloom.mightContain(bytes, col("k"))).count()
    val rate = fp.toDouble / 50000
    assert(rate <= 0.04, s"fp rate $rate more than 2x the configured 0.02")
    assert(rate > 0.0, "a bloom with zero false positives at 2% fpp on 50k probes " +
      "suggests the probe never consulted the filter")
  }

  test("semiJoinPruned equals the plain left-semi join") {
    val fact = (1L to 5000L).map(i => (i, i % 97)).toDF("id", "key")
    val dim = (0L to 96L by 3).toDF("dkey")
    val pruned = Bloom.semiJoinPruned(fact, "key", dim, "dkey", expectedItems = 64)
      .select("id", "key")
    val plain = fact.join(dim, fact("key") === dim("dkey"), "left_semi")
      .select("id", "key")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the bloom predicate is a pre-join Filter in the executed plan") {
    // parquet-backed, not toDF: ConvertToLocalRelation would evaluate a
    // filter over a LocalRelation at optimization time and erase it
    val plan = graft.queries.Relational.bloomPrune(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val filterIdx = plan.indexOf("bloom_might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(filterIdx >= 0, s"bloom filter absent from plan:\n$plan")
    // child operators print BELOW their parent join in the tree dump
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"bloom filter should sit under the join (scan side):\n$plan")
  }
}
