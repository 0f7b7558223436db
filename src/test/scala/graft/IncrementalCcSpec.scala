package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** incrementalComponents ≡ full recompute over old ∪ new edges — the
  * quotient-graph merge contract. */
class IncrementalCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("id", "cluster_id").as[(Long, Long)].collect().toMap

  test("bridging pair merges two existing clusters to the min label; newcomers enter as singletons") {
    val baseEdges = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val base = Dedup.connectedComponents(baseEdges)
    val newEdges = Seq((2L, 5L), (9L, 10L)).toDF("id_a", "id_b")
    val inc = labelsOf(Dedup.incrementalComponents(base, newEdges))
    // full recompute over the union must agree exactly
    val full = labelsOf(Dedup.connectedComponents(
      baseEdges.union(newEdges)))
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc(6L) == 1L, "bridge must pull cluster {5,6} down to label 1")
    assert(inc(9L) == 9L && inc(10L) == 9L, "newcomer pair forms its own cluster")
  }

  test("new pairs INSIDE one existing cluster change nothing") {
    val baseEdges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val base = Dedup.connectedComponents(baseEdges)
    val inc = labelsOf(Dedup.incrementalComponents(
      base, Seq((1L, 3L)).toDF("id_a", "id_b")))
    assert(inc == labelsOf(base), s"intra-cluster edge must be a no-op, got $inc")
  }

  test("chained bridges merge transitively through the quotient graph") {
    // three clusters {1,2} {5,6} {8,9}; bridges 2-5 and 6-8 chain all three
    val baseEdges = Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val base = Dedup.connectedComponents(baseEdges)
    val inc = labelsOf(Dedup.incrementalComponents(
      base, Seq((2L, 5L), (6L, 8L)).toDF("id_a", "id_b")))
    assert(inc.values.toSet == Set(1L), s"all nodes must land in cluster 1: $inc")
  }
}
