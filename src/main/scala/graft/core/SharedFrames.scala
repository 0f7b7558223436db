package graft.core

import org.apache.spark.sql.DataFrame

/** Session-scoped memo of shared intermediate frames, each cut to a
  * [[Lineage.truncate]] checkpoint leaf.
  *
  * Several query families derive from one expensive intermediate — the
  * purchase graph's symmetrized edge list feeds six of the Relational
  * graph queries, the embeddings' 3-NN graph feeds seven of the
  * TextVector ones. Rebuilding that intermediate per query is pure
  * constant-factor waste: within one session (a bench sweep, a Verify
  * run, a real multi-query job) the first consumer pays the build and
  * every later consumer reads the checkpoint leaf. On a cluster this is
  * the "materialize the shared CTE once" pattern — here it is an RDD
  * checkpoint instead of a temp table, so the leaf also survives
  * `cacheManager.clearCache()` (which drops Catalyst plan-cache entries
  * but not checkpointed RDD blocks — the property Bench/Verify rely on
  * between queries).
  *
  * Contract: the builder must be DETERMINISTIC (every graft query is —
  * the driver hash-compares against DuckDB), so first-build vs reuse
  * can never change a result. Entries are keyed by the owning
  * SparkContext and dropped when that context stops (tests spin up
  * fresh sessions; a leaf from a dead context is unreadable).
  */
object SharedFrames {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  /** Return the checkpoint leaf for `key`, building it at most once per
    * (SparkContext, key). Synchronized per map entry: two concurrent
    * first-consumers (parallel test suites sharing a session) must not
    * race the same eager checkpoint job — the round-5 shared-scan-race
    * lesson. */
  def memoize(df: => DataFrame, key: String): DataFrame = {
    // drop entries whose context has stopped (fresh per-suite sessions)
    memo.forEach { (k, v) =>
      if (v.sparkSession.sparkContext.isStopped) memo.remove(k)
    }
    val plan = df // plan construction only — no job until truncate
    val k = (plan.sparkSession.sparkContext.hashCode(), key)
    memo.computeIfAbsent(k, _ => Lineage.truncate(plan))
  }
}
