package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph scoring over edge lists — the shuffle-on-edge
  * shape that scales: per-iteration state is one (node, rank) frame,
  * each round is one equi-join on the edge source + one groupBy on the
  * destination. No adjacency materialization, no driver-side graph.
  * Complements Dedup.connectedComponents (pointer-doubling min-label).
  */
object Graphs {

  /** PageRank with a fixed iteration count (the batch form: unrollable,
    * deterministic, ORACLE-mirrorable — a convergence loop would be
    * data-dependent). Contract: every node must have at least one
    * out-edge (feed symmetric edges for bipartite/undirected graphs;
    * checked). Dangling-mass redistribution is deliberately out of
    * scope — symmetric edges make it unreachable. Returns a PERSISTED
    * |V|-row (id, rank) frame, already materialized; the caller
    * unpersists it (or clearCache()s) when done.
    *
    * Each iteration: contributions = edges ⋈ ranks on src (one shuffle
    * on src, which stays stable across iterations so AQE/exchange
    * reuse applies), then sum per dst (one shuffle on dst). At any
    * scale the state frame is |V| rows — never collected.
    *
    * @param edges (srcCol, dstCol) directed edge list; duplicates are
    *              dropped (distinct) so parallel edges don't double-count.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 2, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // e feeds nodes (twice), deg, and the iteration frame — persist AND
    // materialize it eagerly: a lazy persist only helps across actions
    // AFTER it's populated, so the first downstream job would compute
    // the upstream edge derivation (often a fact-fact join + distinct)
    // once per uncached traversal it contains
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct().persist()
    e.count()
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
      .persist() // read by the contract check, the n count, and every iteration
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    // ONE action answers both prechecks: node count + dangling count
    // (every node needs out-degree >= 1, or rank mass silently leaks)
    val Array(nl, dangling) = nodes.join(deg, nodes("id") === deg("src"), "left")
      .agg(count(lit(1)), count(when(col("src").isNull, 1))).head().toSeq.toArray
      .map(_.asInstanceOf[Long])
    require(dangling == 0L,
      "pageRank contract: every node needs an out-edge (feed symmetric edges for undirected graphs)")
    val n = nl.toDouble
    // reused every iteration — persisted so the upstream edge
    // derivation (often a fact-fact join) computes once. No explicit
    // repartition: the |V|-row rank frame broadcasts (AQE) into this
    // side each round, so the edge frame is never re-shuffled; the
    // only per-iteration shuffle is the groupBy(dst) of contributions
    val withDeg = e.join(deg, "src").persist()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 0 until iters) {
      val contribs = withDeg.join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      // nodes with no in-edges keep only the teleport term
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
    }
    // materialize the final |V|-row result, then release the edge-sized
    // intermediates — a repeated caller otherwise accumulates ~3 pinned
    // edge-scale frames per invocation. The returned frame stays
    // persisted (one |V|-row frame); the caller unpersists (or
    // clearCache()s) when done with it.
    val result = ranks.persist()
    result.count()
    e.unpersist()
    nodes.unpersist()
    withDeg.unpersist()
    result
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own label; each round every node adopts the most
    * frequent label among its neighbors, ties broken toward the
    * SMALLEST label — the deterministic variant (asynchronous LPA is
    * order-dependent and irreproducible, useless under a hash gate).
    * Fixed `iters` so batch runs are unrollable for the oracle, exactly
    * like [[pageRank]].
    *
    * Per round: one edge⋈label equi-join + one (node, label) count +
    * one per-node argmax folded into `max(struct(count, -label))` — no
    * window sort, all shuffles keyed by node id. Nodes are drawn from
    * the edge list (an isolated node has no neighbor vote and keeps its
    * own label trivially). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val und = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      labels = und
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("src"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__m"))
        .select(col("src").as("id"), (-col("__m.__nl")).as("label"))
    }
    labels
  }

  /** Triangle census over an undirected edge list via wedge-closing:
    * canonicalize every edge to (u < v), build wedges a<b<c with two
    * id-oriented passes (ab ⋈ bc on the middle node), then LEFT-join
    * the closing (a,c) edge — `n_wedges` = open+closed paths,
    * `n_triangles` = closed ones (each triangle counted exactly once
    * under the a<b<c convention). Single (n_nodes, n_edges, n_wedges,
    * n_triangles) row; global clustering coefficient =
    * 3·triangles / wedges.
    *
    * Shuffle budget: one distinct on the canonical edge, one equi-join
    * per pass — wedge volume is Σ deg², so feed SPARSE graphs (a kNN
    * graph from [[Similarity.knnGraph]] is ≤ k·|V| edges by
    * construction). At scale the id-orientation would be replaced by
    * degree-orientation (orient each edge toward the higher-degree
    * endpoint) to bound the wedge count on skewed graphs — same plan
    * shape, one extra degree join. */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"), greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    val counts = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(
        e.select(col("u").as("id")).union(e.select(col("v").as("id"))).distinct()
          .agg(count(lit(1)).as("n_nodes")))
    val ab = e.select(col("u").as("a"), col("v").as("b"))
    val bc = e.select(col("u").as("wb"), col("v").as("c"))
    val closing = e.select(col("u").as("ca"), col("v").as("cc"), lit(1).as("closed"))
    val wedgeAgg = ab.join(bc, col("b") === col("wb"))
      .join(closing, col("a") === col("ca") && col("c") === col("cc"), "left")
      .agg(count(lit(1)).as("n_wedges"), count(col("closed")).as("n_triangles"))
    val result = counts.crossJoin(wedgeAgg)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
      .persist()
    result.count()
    e.unpersist()
    result
  }
}
