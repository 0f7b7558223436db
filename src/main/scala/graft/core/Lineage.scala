package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage control for iterative operators (connected components,
  * PageRank, label propagation): round N's plan otherwise nests N
  * joins, so plan depth grows without bound and a lost cached
  * partition replays the entire chain.
  */
object Lineage {

  /** Truncate plan lineage between iterative rounds: reliable
    * checkpoint when a checkpoint dir is configured (the cluster
    * setting — survives executor loss), local checkpoint otherwise.
    * Both are EAGER (run a job), so callers only invoke this every
    * k rounds, not per round. */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Truncate AND count in ONE job — the saturation probe an iterative
    * loop otherwise pays a second job submission for every round
    * (r8 verdict: per-iteration job overhead dominates the BFS-family
    * queries at sf0.1). Local mode materializes into a persisted RDD
    * whose count() is the materializing job; with a reliable
    * checkpoint dir configured (the cluster fault-tolerance contract)
    * it keeps checkpoint semantics and pays the count against the
    * already-checkpointed leaf (cheap, and executor-loss-safe). */
  def truncateCounted(df: DataFrame): (DataFrame, Long) =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val t = df.checkpoint(); (t, t.count())
    } else org.apache.spark.sql.graftbridge.DatasetBridge.materializeCounted(df)
}
