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
}
