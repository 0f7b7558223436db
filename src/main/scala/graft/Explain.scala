package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan for the
  * named queries (or a default set) so shuffle/broadcast/pushdown
  * regressions are visible. Usage:
  *   runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q_revenue_by_nation", "q_rolling_30m", "q_decision_context",
        "q_lsh_pairs", "q_embed_ivf", "q_topk",
        "q_dedup_clusters", "q_health_gates", "q_merge_upsert", "q_action_queue",
        "q_simhash64_pairs", "q_asof_join", "q_range_join", "q_tfidf", "q_scd2",
        "q_tpch_q2", "q_tpch_q16", "q_tpch_q21", "q_triangles_oriented")
    // Same session settings as Bench/Verify (ScaleDefaults: AQE, bloom
    // pruning, UTC) so the printed plans are the measured plans; core
    // count from the same env knob the driver uses.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.ScaleDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
