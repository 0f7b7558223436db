package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BloomExpressions

/** Bloom-filter join pruning: build a compact filter over a dimension
  * key set, push `bloom_might_contain(fact_key)` into the fact SCAN,
  * then exact-verify with the real semi-join. The bloom admits a
  * bounded false-positive trickle (no false negatives), so the final
  * join sees only `sel + fpp` of the fact table instead of all of it —
  * at 100 TB that is the difference between shuffling the whole fact
  * table into the join and shuffling a few percent.
  *
  * This is Spark's InjectRuntimeFilter pattern surfaced as a library
  * call: AQE injects it only under specific shuffle-join shapes; a
  * pipeline that KNOWS its dimension predicate is selective can apply
  * it unconditionally (and against key sets AQE can't see, e.g. an
  * allowlist table from another store).
  *
  * Build cost: `df.stat.bloomFilter` is one treeAggregate over the dim
  * keys — executors build partial filters, the driver ORs them; the
  * result (~1.2 MB at 1M keys / 1% fpp) ships to executors by task
  * serialization like a broadcast value. Driver memory holds one
  * filter, never the key set.
  */
object Bloom {

  /** Serialized bloom filter over an integral key column. */
  def buildBytes(dim: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val f = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  /** `bloom_might_contain` predicate column for a built filter. */
  def mightContain(bytes: Array[Byte], key: Column): Column =
    BloomExpressions.mightContain(bytes, key)

  /** Exact LEFT SEMI join with a bloom prefilter on the fact side:
    * result ≡ `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")`
    * (the exact join clears the bloom's false positives), but the fact
    * rows entering the join are pre-pruned at the scan. */
  def semiJoinPruned(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildBytes(dim, dimKey, expectedItems, fpp)
    fact
      .filter(mightContain(bytes, col(factKey)))
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }
}
