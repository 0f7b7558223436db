package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Core relational operator surface (SURVEY.md §2.2-§2.6) expressed as
  * driver-checkable queries over the TPC-H-ish testdata.
  *
  * Every query here has a DuckDB oracle; column names and rounding are
  * aligned on both sides (see SparkEntry scaladoc). All results are
  * fully deterministically ordered (ORDER BY covers a unique key).
  *
  * Scale notes (100 TB stance):
  *  - dims (region/nation/customer/supplier/part) are broadcast;
  *    fact-fact joins shuffle on their join key only.
  *  - aggregations are partial+final (map-side combine) automatically;
  *    no driver-side collect anywhere.
  *  - `events.ts` is ns-precision parquet; Spark truncates to µs, so no
  *    query emits or compares raw `ts` — always date_trunc ≥ second.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** A1: conditional-count pivot by enum + sum, per event-time minute.
    * Mirrors the reference's 1-min windowed counter aggregation
    * (rt_content_events_aggregator.py:318-342). */
  def conditionalAgg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        count(when(col("event_type") === "signup", 1)).as("signups"),
        count(when(col("event_type") === "error", 1)).as("errors"),
        rd(sum(col("value")), 2).as("value_sum"),
        count(lit(1)).as("n_events"))
      .orderBy("minute")
  }

  /** A2/W3: rolling 30-minute metrics via RANGE-interval window frame
    * (reference rt_video_metrics_serving.sql:9-26). DataFrame API uses
    * the epoch-cast rangeBetween; semantics = SQL
    * `RANGE BETWEEN INTERVAL '29' MINUTE PRECEDING AND CURRENT ROW`. */
  def rolling30m(s: SparkSession, dir: String): DataFrame = {
    val perMin = t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("minute").cast("long"))
      .rangeBetween(-29L * 60, 0)
    perMin.select(
        col("user_id"), col("minute"),
        sum(col("n")).over(w).as("n_30m"),
        rd(sum(col("v")).over(w), 2).as("v_30m"))
      .orderBy("user_id", "minute")
  }

  /** J1: fact → broadcast-dim left join chain (orders → customer →
    * nation → region), aggregated per region/nation. */
  def dimJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .join(n, c("c_nationkey") === n("n_nationkey"), "left")
      .join(r, n("n_regionkey") === r("r_regionkey"), "left")
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_orders"),
        rd(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy("region", "nation")
  }

  /** TPC-H Q5-style multiway join: revenue per nation. lineitem⋈orders
    * shuffles on the orderkey; all dims broadcast. Revenue is exact at
    * 4 decimals (price 2dp × discount 2dp) → rd(_, 4). */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = broadcast(t(s, dir, "customer"))
    val n = broadcast(t(s, dir, "nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        rd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("nation")
  }

  /** J2: 1-row anchor aggregate cross-joined (broadcast) to bound a
    * time window — the reference's dashboard anchor pattern
    * (metabase pack:25-37). */
  def anchorWindow(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val anchor = e.agg(max(date_trunc("minute", col("ts"))).as("anchor_minute"))
    e.crossJoin(broadcast(anchor))
      .filter(col("ts") >= col("anchor_minute") - expr("INTERVAL 30 MINUTES"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), rd(sum(col("value")), 2).as("value_sum"))
      .orderBy("event_type")
  }

  /** J6: NOT EXISTS → left-anti join (customers with no orders). */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** EXISTS → left-semi join (customers with ≥1 high-value order). */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Bloom-pruned semi-join (operators/Bloom.semiJoinPruned): orders
    * whose customer clears an acctbal threshold, the fact side pruned
    * at the scan by a `bloom_might_contain` filter before the exact
    * join clears the false-positive trickle. Result ≡ the plain
    * semi-join (the oracle), which is the point: the bloom changes the
    * plan, never the answer. `expectedItems` is sized for sf0.1; an
    * undercount only raises fpp, never loses rows. Money summed as
    * exact scaled cents (the q_tpch_q9 lesson). */
  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "customer").filter(col("c_acctbal") > 7000.0).select("c_custkey")
    graft.operators.Bloom.semiJoinPruned(
        t(s, dir, "orders"), "o_custkey", dim, "c_custkey",
        expectedItems = 8192, fpp = 0.01)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")) / lit(100)).as("total_value"))
      .orderBy("o_orderpriority")
  }

  /** Pearson correlation / covariance battery over the lineitem
    * measures — the feature-selection screen. Single scan, co-moment
    * aggregates (partial+final like any algebraic agg); rounded where
    * the engines' summation orders can drift. */
  def corrBattery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      rd(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      rd(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qty_disc"),
      rd(corr(col("l_extendedprice"), col("l_discount")), 6).as("corr_price_disc"),
      rd(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
      rd(stddev_samp(col("l_quantity")), 6).as("std_qty"))

  /** Spearman rank correlation (RankStats.spearman) between quantity
    * and extended price — the monotone-robust twin of q_corr's
    * Pearson. Quantity is integer-valued (massive ties → exercises
    * average-tie ranks); price is near-distinct. Ranks come from the
    * two-level distributed prefix sum (no global row sort); only the
    * final corr aggregate is summation-order sensitive → rd6. */
  def spearmanCorr(s: SparkSession, dir: String): DataFrame =
    graft.operators.RankStats.spearman(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice")
      .select(col("n"), rd(col("rho"), 6).as("rho"))

  /** J7: scalar-subquery battery — one row of independent counts
    * (reference grain-acceptance query rt_video_metrics_serving.sql:191-196).
    * Built as broadcast cross-joins of 1-row aggregates. */
  def scalarSubqueries(s: SparkSession, dir: String): DataFrame = {
    def cnt(n: String, as: String) = t(s, dir, n).agg(count(lit(1)).as(as))
    cnt("lineitem", "n_lineitem")
      .crossJoin(broadcast(cnt("orders", "n_orders")))
      .crossJoin(broadcast(cnt("customer", "n_customer")))
      .crossJoin(broadcast(t(s, dir, "orders")
        .agg(rd(max(col("o_totalprice")), 2).as("max_order_price"))))
      .crossJoin(broadcast(t(s, dir, "events")
        .agg(countDistinct(col("user_id")).as("n_users"))))
  }

  /** W1/W2: latest row per key via ROW_NUMBER (ORDER BY ts DESC with a
    * deterministic id tiebreak — the reference's CDC latest-wins dedup,
    * rt_video_cdc_upsert_sql.py:136-144). */
  def latestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        date_trunc("second", col("ts")).as("ts_sec"),
        col("event_type"), col("value"))
      .orderBy("user_id")
  }

  /** A3: duplicate-grain detection — GROUP BY key HAVING COUNT(*)>1
    * (reference uniqueness acceptance, rt_video_metrics_serving.sql:173-190). */
  def dupGrains(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("user_id", "minute")
  }

  /** A4: distinct counts per day (active users trend, metabase pack:50-57). */
  def distinctActive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_id")).as("n_events"))
      .orderBy("day")
  }

  /** A9: long→wide pivot via MAX(CASE WHEN) (thresholds pivot,
    * rt_video_metrics_serving.sql:71-87). */
  def pivotMaxCase(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        rd(max(when(col("event_type") === "purchase", col("value"))), 2).as("max_purchase"),
        rd(max(when(col("event_type") === "click", col("value"))), 2).as("max_click"),
        rd(min(when(col("event_type") === "view", col("value"))), 2).as("min_view"))
      .orderBy("user_id")
  }

  /** A11: exact interpolated percentiles per group (threshold baseline
    * computation, metric-contract.md:62-75). At 100 TB the publish path
    * swaps `percentile` → `percentile_approx`; exact kept here because
    * the oracle (quantile_cont) is exact. */
  def quantiles(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        rd(expr("percentile(value, 0.9)"), 4).as("p90"),
        rd(expr("percentile(value, 0.4)"), 4).as("p40"),
        rd(expr("percentile(value, 0.95)"), 4).as("p95"),
        count(lit(1)).as("sample_size"))
      .orderBy("event_type")
  }

  /** O2: ORDER BY + LIMIT top-k → TakeOrderedAndProject (no global sort
    * materialization; the reference's ranking guardrail). */
  def topK(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        col("value"), date_trunc("second", col("ts")).as("ts_sec"))
      .orderBy(col("value").desc, col("event_id").asc)
      .limit(100)
  }

  /** O5: set operations (union / intersect / except), surfaced as one
    * labelled result. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def users(et: String) = e.filter(col("event_type") === et).select(col("user_id")).distinct()
    val purchasers = users("purchase")
    val clickers = users("click")
    val errored = users("error")
    purchasers.intersect(clickers).withColumn("set_op", lit("purchase_and_click"))
      .unionByName(purchasers.except(errored).withColumn("set_op", lit("purchase_not_error")))
      .select(col("set_op"), col("user_id"))
      .orderBy("set_op", "user_id")
  }

  /** Shared purchase-graph base: lineitem⋈orders projected to the
    * parity-encoded node pair (customer c → 2c, supplier s → 2s+1)
    * plus the two edge attributes any family member needs (ship
    * timestamp for the time-sliced variants, quantity for the weighted
    * one). Six queries (q_pagerank, q_bfs_hops, q_ppr, q_hits, q_sssp,
    * q_neighborhood) derive from this one frame — memoized to a
    * checkpoint leaf per session so the fact join runs once per sweep
    * (SharedFrames scaladoc has the contract). */
  private def purchaseBase(s: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.memoize(s, s"purchase_base:$dir") {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"),
          col("l_shipdate").as("ship"), col("l_quantity").cast("long").as("qty"))
    }

  /** [[purchaseBase]] symmetrized to the undirected (src,dst) edge
    * list — its own leaf: four consumers read exactly this shape, and
    * the explode doubles the frame so cutting it once beats four
    * re-derivations. Symmetrization stays a ONE-pass explode (a
    * self-union would run the base scan once per leg). */
  private def purchaseEdgesSym(s: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.memoize(s, s"purchase_edges_sym:$dir")(
      purchaseBase(s, dir).select(explode(array(
          struct(col("c").as("src"), col("sp").as("dst")),
          struct(col("sp").as("src"), col("c").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")))

  /** [[purchaseEdgesSym]] DEDUPED — the shape every BFS/rank-family
    * operator reduces its input to internally (they all `.distinct()`
    * defensively, result-identically). Cutting the deduped frame to
    * its own leaf means those internal distincts re-shuffle ~0.2M
    * deduped rows instead of the 1.2M-row raw symmetrized frame, once
    * per consumer — seven queries read this leaf. */
  private def purchaseEdgesSymD(s: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.memoize(s, s"purchase_edges_symd:$dir")(
      purchaseEdgesSym(s, dir).distinct())

  /** The pageRank family's prepared frames (Graphs.degreeGraphFrames
    * shapes) as session leaves: `(src, dst, out_deg)` and the node
    * universe. Global + personalized PageRank consume these directly
    * (Graphs.pageRankOn / personalizedPageRankOn) instead of each
    * re-running the distinct+degree shuffles per query. On the
    * SYMMETRIC purchase graph the src set IS the node universe. */
  private def purchaseDeg(s: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.memoize(s, s"purchase_deg:$dir") {
      val e0 = purchaseEdgesSymD(s, dir)
      e0.join(e0.groupBy(col("src")).agg(count(lit(1)).as("out_deg")), "src")
    }

  private def purchaseNodes(s: SparkSession, dir: String): DataFrame =
    graft.core.SharedFrames.memoize(s, s"purchase_nodes:$dir")(
      purchaseEdgesSymD(s, dir).select(col("src").as("id")).distinct())

  /** Distributed PageRank (operators/Graphs) over the customer↔supplier
    * bipartite trade graph (symmetric edges from lineitem⋈orders).
    * Fixed 2 iterations so the oracle can unroll the same arithmetic;
    * ranks rounded at 1e-10 (sums of ~tens of doubles agree across
    * engines far below that).
    *
    * Node ids are parity-encoded LONGS (customer c → 2c, supplier s →
    * 2s+1), not string-prefixed keys: every downstream dedup / join /
    * groupBy then shuffles and hashes 8-byte longs — the string-keyed
    * variant spent ~2× the time hashing 1.17M concat'd keys. No
    * distinct here: pageRank dedups its edge input itself. */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    graft.operators.Graphs.pageRankOn(purchaseDeg(s, dir), purchaseNodes(s, dir), iters = 2)
      .select(col("id"), rd(col("rank"), 10).as("rank"))
      .orderBy("id")
  }

  /** Multi-source BFS hop distance (Graphs.bfsHops, 3 hops) over the
    * same symmetrized customer–supplier graph as q_pagerank, seeded at
    * customers 1..5 — blast-radius / reachability: "how many hops does
    * influence travel from these accounts". Frontier equi-join + anti
    * join per round, lineage-truncated; oracle is a depth-bounded
    * recursive CTE with min(d). */
  def bfsHopsQ(s: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdgesSymD(s, dir)
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.bfsHops(edges, "src", "dst", seeds, "id", maxHops = 3)
      .orderBy("id")
  }

  /** HITS hubs/authorities (Graphs.hits, 2 rounds, unnormalized —
    * integer-exact) on the DIRECTED customer→supplier purchase graph:
    * hub = how broadly a customer buys from strong suppliers,
    * authority = how strongly a supplier is bought by broad customers.
    * The role separation pageRank-on-symmetrized-edges can't give. */
  def hitsQ(s: SparkSession, dir: String): DataFrame = {
    val edges = purchaseBase(s, dir).select(col("c").as("src"), col("sp").as("dst"))
    graft.operators.Graphs.hits(edges, "src", "dst", iters = 2)
      .orderBy("id")
  }

  /** Weighted single-source shortest paths (Graphs.sssp — bounded
    * Bellman-Ford, 3 rounds = cheapest ≤3-hop route) from 5 seed
    * customers over the symmetrized customer↔supplier purchase graph
    * restricted to one ship month (keeps the oracle's depth-bounded
    * recursive CTE tractable at sf0.1). Edge cost = the pair's minimum
    * l_quantity — integer-valued, so every path sum is an exact int64
    * and the min-merge is engine-stable. The weighted complement of
    * q_bfs_hops: hop counts can't rank routes once edges carry cost. */
  def ssspQ(s: SparkSession, dir: String): DataFrame = {
    val base = purchaseBase(s, dir)
      .filter(col("ship") >= lit("1996-01-01").cast("timestamp") &&
        col("ship") < lit("1996-02-01").cast("timestamp"))
      .select(col("c"), col("sp"), col("qty").as("w"))
    val edges = base.select(explode(array(
        struct(col("c").as("src"), col("sp").as("dst"), col("w")),
        struct(col("sp").as("src"), col("c").as("dst"), col("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.sssp(edges, "src", "dst", "w", seeds, "id", rounds = 3)
      .orderBy("id")
  }

  /** Personalized PageRank (Graphs.personalizedPageRank, 2 rounds,
    * teleport = the 5 seed customers): proximity-to-the-seeds scoring
    * on the symmetrized purchase graph — "suppliers/customers related
    * to THESE accounts", which global q_pagerank cannot express.
    * Unreached nodes carry exact 0. */
  def pprQ(s: SparkSession, dir: String): DataFrame = {
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.personalizedPageRankOn(
        purchaseDeg(s, dir), purchaseNodes(s, dir), seeds, "id", iters = 2)
      .select(col("id"), rd(col("rank"), 10).as("rank"))
      .orderBy("id")
  }

  /** HyperANF-style per-node reach curve (Graphs.neighborhoodFunction,
    * HLL sketches, 3 hops) on a one-week purchase graph, gated against
    * the EXACT pair-set expansion: the sketch path is the 100 TB
    * operator (few KB of mergeable state per node), the exact path is
    * its test-scale witness, and the within-tol boolean is what the
    * oracle predicts (estimates are never gated by equality). */
  def neighborhoodQ(s: SparkSession, dir: String): DataFrame = {
    val pe = purchaseBase(s, dir)
      .filter(col("ship") >= lit("1996-01-01").cast("timestamp") &&
        col("ship") < lit("1996-01-08").cast("timestamp"))
      .select(col("c"), col("sp"))
    val edges = pe.select(explode(array(
        struct(col("c").as("src"), col("sp").as("dst")),
        struct(col("sp").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val est = graft.operators.Graphs.neighborhoodFunction(edges, "src", "dst", maxHops = 3)
    val eD = graft.core.Lineage.truncate(edges.distinct())
    val nodes = eD.select(col("src").as("id")).union(eD.select(col("dst"))).distinct()
    var pairs = graft.core.Lineage.truncate(nodes.select(col("id"), col("id").as("reached")))
    var exacts: DataFrame = null
    for (h <- 1 to 3) {
      pairs = graft.core.Lineage.truncate(
        pairs.union(
            pairs.join(eD, pairs("reached") === eD("src"))
              .select(pairs("id"), eD("dst").as("reached")))
          .distinct())
      val ex = pairs.groupBy(col("id")).agg(count(lit(1)).as("n_exact"))
        .withColumn("hop", lit(h))
      exacts = if (exacts == null) ex else exacts.union(ex)
    }
    est.join(exacts, Seq("id", "hop"))
      .select(col("id"), col("hop"), col("n_exact"),
        (abs(col("est_reach") - col("n_exact")) <=
          greatest(col("n_exact") * lit(0.04), lit(2.0))).as("within_tol"))
      .orderBy("id", "hop")
  }

  /** Landmark harmonic centrality (Graphs.harmonicCentrality) over the
    * purchase graph from the same 5 customer landmarks as q_bfs_hops:
    * which accounts sit closest to the anchor customers, with
    * unreachable landmarks contributing exactly 0 (harmonic's edge over
    * closeness). Reciprocals summed in 1e-9 fixed point — engine-stable
    * without float-order luck; oracle is the q_bfs_hops recursive CTE
    * keyed per-seed plus the same fixed-point sum. */
  def harmonicQ(s: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdgesSymD(s, dir)
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.harmonicCentrality(edges, "src", "dst", seeds, "id", maxHops = 3)
      .orderBy("id")
  }

  /** Deterministic hash-seeded random walks (Graphs.randomWalks) from
    * the 5 anchor customers over the purchase graph — the replayable
    * DeepWalk-corpus sampler: same (seed, graph) → same walks in any
    * engine, which is what an embedding-training pipeline needs from
    * "random". Oracle unrolls the 3 steps with the same
    * md5(seed:walk:t:u:v) argmin per step. */
  def randomWalksQ(s: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdgesSymD(s, dir)
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.randomWalks(edges, "src", "dst", seeds, "id",
        steps = 3, seed = "walk")
      .orderBy("walk_id", "step")
  }

  /** Time-respecting reachability (Graphs.temporalReach) over the
    * January-1996 purchase slice: earliest arrival from the 5 anchor
    * customers along paths whose ship timestamps never decrease — the
    * influence/contamination-window question static q_bfs_hops
    * over-answers (an edge that shipped BEFORE you arrived can't
    * forward anything). Exact integer epoch-µs mins; oracle is the
    * recursive-CTE enumeration of all ≤3-hop temporal paths, which the
    * operator's min-relaxation DP provably equals. */
  def temporalReachQ(s: SparkSession, dir: String): DataFrame = {
    val edges = purchaseBase(s, dir)
      .filter(col("ship") >= lit("1996-01-01").cast("timestamp") &&
        col("ship") < lit("1996-02-01").cast("timestamp"))
      .select(explode(array(
        struct(col("c").as("src"), col("sp").as("dst"), col("ship")),
        struct(col("sp").as("src"), col("c").as("dst"), col("ship")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.ship").as("ship"))
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.temporalReach(edges, "src", "dst", "ship", seeds, "id", maxHops = 3)
      .orderBy("seed", "id")
  }

  /** Hill tail-exponent estimate (Graphs.degreeTailAlpha, dmin=5) of
    * the purchase-graph degree distribution — the scale-free
    * diagnostic that says whether hub-aware strategies (salting,
    * skew-join) are worth wiring for this graph. 1e-9 fixed-point log
    * sums, NULL on the all-at-dmin degenerate tail. */
  def powerlawQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graphs.degreeTailAlpha(purchaseEdgesSymD(s, dir), "src", "dst", dmin = 5)
      .select(col("dmin"), col("n_tail"), rd(col("alpha"), 6).as("alpha"))

  /** Sampled hop-bounded Brandes betweenness
    * (Graphs.betweennessSampled, 5 customer sources, 3 hops) over the
    * purchase graph: which accounts sit ON the shortest trade routes —
    * the brokerage/bottleneck score no degree or PageRank view gives.
    * σ counts are exact longs and every δ term is 1e-9 fixed-point
    * before its level sum, so the oracle unrolls the exact trajectory
    * level by level. */
  def betweennessQ(s: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdgesSymD(s, dir)
    val seeds = t(s, dir, "customer").filter(col("c_custkey") <= 5)
      .select((col("c_custkey") * 2).as("id"))
    graft.operators.Graphs.betweennessSampled(edges, "src", "dst", seeds, "id", maxHops = 3)
      .select(col("id"), rd(col("bc"), 6).as("bc"))
      .orderBy("id")
  }

  /** Interval×interval overlap join (RangeJoin.overlapJoin — binned
    * equi-join, never the nested loop): co-presence of two users'
    * per-day purchase activity spans, with the overlap duration.
    * Interval bounds are floored epoch seconds (exact longs), so both
    * the overlap predicate and the duration are integer-exact; the
    * `% 7` user subset bounds the quadratic pair count at any sf. */
  def intervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val iv = graft.core.Lineage.truncate(
      t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("user_id") % 7 === 0)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(col("ts").cast("long")).as("s"), max(col("ts").cast("long")).as("e")))
    val a = iv.select(col("user_id").as("user_a"), col("day").as("day_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = iv.select(col("user_id").as("user_b"), col("day").as("day_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    graft.operators.RangeJoin.overlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", binWidth = 14400)
      .filter(col("user_a") < col("user_b"))
      .select(col("user_a"), col("user_b"), col("day_a"),
        (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b"))).as("overlap_sec"))
      .orderBy("user_a", "user_b", "day_a")
  }

  /** As-of join (J8 analog, beyond the reference's equi-joins): every
    * non-purchase event matched to the same user's latest purchase at
    * or before it. Union-tag + single window pass (operators/AsofJoin)
    * vs DuckDB's native `ASOF LEFT JOIN` as the oracle — a true
    * cross-engine semantics check of an operator Spark lacks natively. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_trunc("second", col("ts")).as("ts_sec"))
    // right side unique per (user, second): latest event_id wins the tie
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_sec").as("purchase_ts"))
      .agg(max_by(col("value"), col("event_id")).as("purchase_value"))
    val left = e.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    graft.operators.AsofJoin.asofJoin(left, purchases, "user_id", "ts_sec", "purchase_ts",
        Seq("purchase_ts", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("purchase_ts"),
        rd(col("purchase_value"), 2).as("purchase_value"))
      .orderBy("event_id")
  }

  /** Binned range join: every non-error event within ±60 s of an error
    * by the same user, aggregated per user. The banded equi-join shape
    * (operators/RangeJoin) vs DuckDB's plain inequality join oracle. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("event_type"),
      date_trunc("second", col("ts")).cast("long").as("sec"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("sec").as("err_sec"), col("event_id").as("err_id"))
    val others = e.filter(col("event_type") =!= "error")
      .select(col("event_id"), col("user_id"), col("sec"))
    graft.operators.RangeJoin.proximityJoin(others, errors, "user_id", "sec", "err_sec", 60L)
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("event_id")).as("n_near_events"),
        countDistinct(col("err_id")).as("n_errors"),
        count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Mergeable HLL sketch columns (Spark 4 datasketches): per-type
    * distinct-user estimates plus a sketch-UNION total — the partial/
    * merge algebra that makes distinct counting embarrassingly parallel
    * at 100 TB (sketches combine associatively across partitions and
    * time grains; exact countDistinct carried alongside for the
    * tolerance check). DuckDB has no HLL surface, so the estimates
    * themselves can't be oracled; the output carries the exact counts
    * plus a within-2%-of-exact boolean per row (the SketchSpec bound),
    * which the oracle predicts as literal TRUE — full rows+schema+hash
    * coverage that goes red if the sketch drifts. */
  /** Detailed sketch output (approx + exact side by side) — the form
    * SketchSpec pins; [[hllSketch]] folds it into the oracled gate. */
  def hllSketchDetail(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    // persisted: both union legs (per-type rows + the sketch-union
    // total) read this aggregate — without the cache the events scan +
    // sketch build would run twice; caller-scoped lifetime (Verify/
    // Bench clearCache between queries)
    val perType = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_users"))
      .persist()
    val totalRow = perType.agg(hll_union_agg(col("sk")).as("sk"))
      .crossJoin(broadcast(e.agg(countDistinct(col("user_id")).as("exact_users"))))
      .select(lit("__ALL__").as("event_type"),
        hll_sketch_estimate(col("sk")).as("approx_users"), col("exact_users"))
    perType
      .select(col("event_type"), hll_sketch_estimate(col("sk")).as("approx_users"),
        col("exact_users"))
      .unionByName(totalRow)
  }

  def hllSketch(s: SparkSession, dir: String): DataFrame =
    hllSketchDetail(s, dir)
      .select(col("event_type"), col("exact_users"),
        // same absolute floor rationale as q_approx_stats: tiny groups
        // (sf0.001) make a pure 2% bound demand exactness
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(col("exact_users") * lit(0.02), lit(2.0))).as("within_tol"))
      .orderBy("event_type")

  /** Higher-moment distribution battery over integer-valued l_quantity:
    * skewness / excess kurtosis derived from exact BIGINT power sums
    * (quantity ≤ 50, so s4 ≤ 50⁴·N — no 64-bit overflow through SF
    * 1000), exact interpolated median, discrete p90, and a
    * DETERMINISTIC mode (max count, ties to the smaller value — the
    * built-in mode() leaves ties unspecified, so it can't hash-gate).
    * No libm in the moment math: sqrt-products instead of pow. One
    * grouped scan for the sums + one (key, value) count for the mode. */
  def moments(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
    val sums = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("s1"),
      sum(col("q") * col("q")).as("s2"),
      sum(col("q") * col("q") * col("q")).as("s3"),
      sum(col("q") * col("q") * col("q") * col("q")).as("s4"),
      expr("percentile(q, 0.5)").as("median_qty"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY q)").cast("long").as("p90_disc"))
    val wm = Window.partitionBy(col("l_returnflag")).orderBy(col("c").desc, col("q"))
    val modeDf = li.groupBy(col("l_returnflag"), col("q")).agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wm)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("q").as("mode_q"))
    sums.join(modeDf, "l_returnflag")
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("ex2", col("s2").cast("double") / col("n"))
      .withColumn("ex3", col("s3").cast("double") / col("n"))
      .withColumn("ex4", col("s4").cast("double") / col("n"))
      .withColumn("varp", col("ex2") - col("mean") * col("mean"))
      .withColumn("m3", (col("ex3") - lit(3.0) * col("mean") * col("ex2"))
        + lit(2.0) * ((col("mean") * col("mean")) * col("mean")))
      .withColumn("m4", ((col("ex4") - lit(4.0) * col("mean") * col("ex3"))
        + lit(6.0) * ((col("mean") * col("mean")) * col("ex2")))
        - lit(3.0) * (((col("mean") * col("mean")) * col("mean")) * col("mean")))
      .select(col("l_returnflag"), col("n"),
        rd(col("mean"), 6).as("mean_qty"),
        rd(sqrt(col("varp")), 6).as("std_pop"),
        rd(col("m3") / (sqrt(col("varp")) * col("varp")), 6).as("skewness"),
        rd(col("m4") / (col("varp") * col("varp")) - lit(3.0), 6).as("kurtosis_excess"),
        col("median_qty"), col("p90_disc"), col("mode_q"))
      .orderBy("l_returnflag")
  }

  /** Skew.saltedJoin pinned against the plain-join oracle: lineitem ⋈
    * part through the salt-replicated key space, re-aggregated per
    * brand — semantics identical to the unsalted join by construction;
    * exact cent sums let the hash gate prove it. At scale this is the
    * hot-partkey escape hatch when the build side is too big to
    * broadcast and AQE's skew split can't help (it only splits sort-
    * merge partitions, not a hot build bucket). */
  def saltedJoinBrand(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_quantity"), col("l_extendedprice"))
    graft.operators.Skew.saltedJoin(li, t(s, dir, "part"), "p_partkey", saltBuckets = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long")).as("__cents"))
      .select(col("p_brand"), col("n_lines"), col("sum_qty"),
        (col("__cents").cast("double") / lit(100)).as("sum_price"))
      .orderBy("p_brand")
  }

  /** Jaro–Winkler fuzzy linkage over part names (plans.JaroWinkler —
    * codegen'd native expression, bit-identical to DuckDB's
    * `jaro_winkler_similarity`, see its scaladoc): candidate pairs come
    * from (p_brand, p_size) equi-join BLOCKING — never all-pairs — then
    * the transposition-tolerant score keeps likely same-item pairs.
    * The 0.85 cut runs on the unrounded score (same bits both engines);
    * only the emitted column is rounded. */
  def jaroWinklerPairs(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    val jw = graft.plans.JaroWinkler.jaroWinkler(col("name_a"), col("name_b"))
    a.join(b, Seq("p_brand", "p_size"))
      .filter(col("id_a") < col("id_b"))
      .filter(jw > lit(0.85))
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        rd(jw, 6).as("jw"))
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jaro_winkler" -> jaroWinklerPairs,
    "q_conditional_agg" -> conditionalAgg,
    "q_moments" -> moments,
    "q_salted_join" -> saltedJoinBrand,
    "q_rolling_30m" -> rolling30m,
    "q_dim_join" -> dimJoin,
    "q_revenue_by_nation" -> revenueByNation,
    "q_anchor_window" -> anchorWindow,
    "q_anti_join" -> antiJoin,
    "q_asof_join" -> asofJoin,
    "q_range_join" -> rangeJoin,
    "q_hll_sketch" -> hllSketch,
    "q_semi_join" -> semiJoin,
    "q_bloom_prune" -> bloomPrune,
    "q_corr" -> corrBattery,
    "q_spearman" -> spearmanCorr,
    "q_scalar_subqueries" -> scalarSubqueries,
    "q_latest_per_key" -> latestPerKey,
    "q_dup_grains" -> dupGrains,
    "q_distinct_active" -> distinctActive,
    "q_pivot_maxcase" -> pivotMaxCase,
    "q_quantiles" -> quantiles,
    "q_topk" -> topK,
    "q_set_ops" -> setOps,
    "q_pagerank" -> pagerank,
    "q_bfs_hops" -> bfsHopsQ,
    "q_hits" -> hitsQ,
    "q_sssp" -> ssspQ,
    "q_interval_overlap" -> intervalOverlap,
    "q_ppr" -> pprQ,
    "q_neighborhood" -> neighborhoodQ,
    "q_harmonic" -> harmonicQ,
    "q_random_walks" -> randomWalksQ,
    "q_temporal_reach" -> temporalReachQ,
    "q_powerlaw" -> powerlawQ,
    "q_betweenness" -> betweennessQ,
  )

  val oracles: Map[String, String] = Map(
    // DuckDB's builtin IS the spec the Spark expression mirrors
    // bit-for-bit (plans.JaroWinkler scaladoc); same unrounded cut
    "q_jaro_winkler" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  floor(jaro_winkler_similarity(a.p_name, b.p_name)*1000000 + 0.5)/1000000 AS jw
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) > 0.85
        |ORDER BY id_a, id_b""".stripMargin,
    "q_moments" ->
      """WITH li AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q*q) AS BIGINT) AS s2,
        |    CAST(sum(q*q*q) AS BIGINT) AS s3, CAST(sum(q*q*q*q) AS BIGINT) AS s4,
        |    quantile_cont(q, 0.5) AS median_qty,
        |    CAST(quantile_disc(q, 0.9) AS BIGINT) AS p90_disc
        |  FROM li GROUP BY 1),
        |md AS (
        |  SELECT l_returnflag, q AS mode_q FROM (
        |    SELECT l_returnflag, q,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC, q) AS rn
        |    FROM li GROUP BY l_returnflag, q) WHERE rn = 1),
        |d AS (
        |  SELECT s.l_returnflag, s.n, s.median_qty, s.p90_disc, md.mode_q,
        |    CAST(s1 AS DOUBLE)/n AS mean, CAST(s2 AS DOUBLE)/n AS ex2,
        |    CAST(s3 AS DOUBLE)/n AS ex3, CAST(s4 AS DOUBLE)/n AS ex4
        |  FROM s JOIN md USING (l_returnflag)),
        |e AS (
        |  SELECT *, ex2 - mean*mean AS varp,
        |    (ex3 - 3.0*mean*ex2) + 2.0*((mean*mean)*mean) AS m3,
        |    ((ex4 - 4.0*mean*ex3) + 6.0*((mean*mean)*ex2)) - 3.0*(((mean*mean)*mean)*mean) AS m4
        |  FROM d)
        |SELECT l_returnflag, n,
        |  floor((mean)*1000000 + 0.5)/1000000 AS mean_qty,
        |  floor((sqrt(varp))*1000000 + 0.5)/1000000 AS std_pop,
        |  floor((m3/(sqrt(varp)*varp))*1000000 + 0.5)/1000000 AS skewness,
        |  floor((m4/(varp*varp) - 3.0)*1000000 + 0.5)/1000000 AS kurtosis_excess,
        |  median_qty, p90_disc, mode_q
        |FROM e ORDER BY l_returnflag""".stripMargin,
    "q_salted_join" ->
      """SELECT p.p_brand,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) / 100 AS sum_price
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value, date_trunc('second', ts) AS ts_sec
        |  FROM events),
        |p0 AS (
        |  SELECT user_id, ts_sec AS purchase_ts, value AS purchase_value,
        |    row_number() OVER (PARTITION BY user_id, ts_sec ORDER BY event_id DESC) AS rn
        |  FROM e WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, purchase_ts, purchase_value FROM p0 WHERE rn = 1),
        |l AS (SELECT event_id, user_id, ts_sec FROM e WHERE event_type <> 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_sec, p.purchase_ts,
        |  floor((p.purchase_value)*100 + 0.5)/100 AS purchase_value
        |FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts_sec >= p.purchase_ts
        |ORDER BY l.event_id""".stripMargin,
    "q_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |err AS (SELECT user_id, sec AS err_sec, event_id AS err_id FROM e WHERE event_type = 'error'),
        |o AS (SELECT event_id, user_id, sec FROM e WHERE event_type <> 'error'),
        |p AS (
        |  SELECT o.user_id, o.event_id, err.err_id
        |  FROM o JOIN err ON o.user_id = err.user_id AND abs(o.sec - err.err_sec) <= 60)
        |SELECT user_id, count(DISTINCT event_id) AS n_near_events,
        |  count(DISTINCT err_id) AS n_errors, count(*) AS n_pairs
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // q_hll_sketch: exact distinct counts are SQL; the sketch estimate
    // is folded into a within-2% boolean the oracle predicts as TRUE
    // (SketchSpec still pins the estimate + union consistency).
    "q_hll_sketch" ->
      """WITH p AS (
        |  SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT '__ALL__' AS event_type, count(DISTINCT user_id) AS exact_users FROM events)
        |SELECT event_type, exact_users, TRUE AS within_tol
        |FROM p ORDER BY event_type""".stripMargin,
    "q_conditional_agg" ->
      """SELECT date_trunc('minute', ts) AS minute,
        | count(*) FILTER (WHERE event_type = 'click') AS clicks,
        | count(*) FILTER (WHERE event_type = 'view') AS views,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
        | count(*) FILTER (WHERE event_type = 'signup') AS signups,
        | count(*) FILTER (WHERE event_type = 'error') AS errors,
        | floor((sum(value))*100 + 0.5)/100 AS value_sum,
        | count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_30m" ->
      """WITH per_min AS (
        |  SELECT user_id, date_trunc('minute', ts) AS minute,
        |         count(*) AS n, sum(value) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, minute,
        |  CAST(sum(n) OVER w AS BIGINT) AS n_30m,
        |  floor((sum(v) OVER w)*100 + 0.5)/100 AS v_30m
        |FROM per_min
        |WINDOW w AS (PARTITION BY user_id ORDER BY minute
        |  RANGE BETWEEN INTERVAL '29' MINUTE PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, minute""".stripMargin,
    "q_dim_join" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        | count(*) AS n_orders, floor((sum(o.o_totalprice))*100 + 0.5)/100 AS total_price
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_revenue_by_nation" ->
      """SELECT n.n_name AS nation,
        | floor((sum(l.l_extendedprice * (1.0 - l.l_discount)))*10000 + 0.5)/10000 AS revenue,
        | count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anchor_window" ->
      """WITH anchor AS (SELECT max(date_trunc('minute', ts)) AS anchor_minute FROM events)
        |SELECT event_type, count(*) AS n, floor((sum(value))*100 + 0.5)/100 AS value_sum
        |FROM events CROSS JOIN anchor
        |WHERE ts >= anchor_minute - INTERVAL '30' MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_bloom_prune" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) / 100 AS total_value
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 7000.0)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q_corr" ->
      """SELECT
        |  floor((corr(l_quantity, l_extendedprice))*1000000 + 0.5)/1000000 AS corr_qty_price,
        |  floor((corr(l_quantity, l_discount))*1000000 + 0.5)/1000000 AS corr_qty_disc,
        |  floor((corr(l_extendedprice, l_discount))*1000000 + 0.5)/1000000 AS corr_price_disc,
        |  floor((covar_samp(l_quantity, l_extendedprice))*10000 + 0.5)/10000 AS covar_qty_price,
        |  floor((stddev_samp(l_quantity))*1000000 + 0.5)/1000000 AS std_qty
        |FROM lineitem""".stripMargin,
    // average-tie ranks direct: rank() (= #below + 1) plus half the tie
    // block — identical half-integers to the Spark two-level prefix sum
    "q_spearman" ->
      """WITH r AS (
        |  SELECT
        |    rank() OVER (ORDER BY CAST(floor(l_quantity*100 + 0.5) AS BIGINT))
        |      + (count(*) OVER (PARTITION BY CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) - 1)/2.0 AS rank_x,
        |    rank() OVER (ORDER BY CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
        |      + (count(*) OVER (PARTITION BY CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) - 1)/2.0 AS rank_y
        |  FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  floor((corr(rank_x, rank_y))*1000000 + 0.5)/1000000 AS rho
        |FROM r""".stripMargin,
    "q_scalar_subqueries" ->
      """SELECT
        | (SELECT count(*) FROM lineitem) AS n_lineitem,
        | (SELECT count(*) FROM orders) AS n_orders,
        | (SELECT count(*) FROM customer) AS n_customer,
        | (SELECT floor((max(o_totalprice))*100 + 0.5)/100 FROM orders) AS max_order_price,
        | (SELECT count(DISTINCT user_id) FROM events) AS n_users""".stripMargin,
    "q_latest_per_key" ->
      """SELECT user_id, date_trunc('second', ts) AS ts_sec, event_type, value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q_dup_grains" ->
      """SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS n
        |FROM events GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY user_id, minute""".stripMargin,
    "q_distinct_active" ->
      """SELECT CAST(ts AS DATE) AS day,
        | count(DISTINCT user_id) AS n_users,
        | count(DISTINCT event_id) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pivot_maxcase" ->
      """SELECT user_id,
        | floor((max(CASE WHEN event_type = 'purchase' THEN value END))*100 + 0.5)/100 AS max_purchase,
        | floor((max(CASE WHEN event_type = 'click' THEN value END))*100 + 0.5)/100 AS max_click,
        | floor((min(CASE WHEN event_type = 'view' THEN value END))*100 + 0.5)/100 AS min_view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantiles" ->
      """SELECT event_type,
        | floor((quantile_cont(value, 0.9))*10000 + 0.5)/10000 AS p90,
        | floor((quantile_cont(value, 0.4))*10000 + 0.5)/10000 AS p40,
        | floor((quantile_cont(value, 0.95))*10000 + 0.5)/10000 AS p95,
        | count(*) AS sample_size
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_topk" ->
      """SELECT event_id, user_id, event_type, value, date_trunc('second', ts) AS ts_sec
        |FROM events ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,
    "q_set_ops" ->
      """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT 'purchase_and_click' AS set_op, user_id FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM c)
        |UNION ALL
        |SELECT 'purchase_not_error' AS set_op, user_id FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
        |ORDER BY set_op, user_id""".stripMargin,
    // 2 unrolled PageRank iterations mirroring Graphs.pageRank exactly:
    // the teleport term must subtract in DOUBLE — DuckDB parses 1.0 and
    // 0.85 as DECIMALs and subtracts EXACTLY (0.15), while Spark's
    // lit((1.0-0.85)/n) carries the binary result 0.15000000000000002;
    // the casts force the identical IEEE subtraction. Same left-join
    // coalesce for nodes without in-edges.
    "q_pagerank" ->
      """WITH pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/nn AS rank FROM n, cnt),
        |c1 AS (SELECT e.dst AS id, sum(r.rank/deg.d) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r0 r ON e.src = r.id GROUP BY 1),
        |r1 AS (SELECT n.id, (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/cnt.nn + CAST(0.85 AS DOUBLE)*coalesce(c1.inflow, 0.0) AS rank
        |       FROM n CROSS JOIN cnt LEFT JOIN c1 ON n.id = c1.id),
        |c2 AS (SELECT e.dst AS id, sum(r.rank/deg.d) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r1 r ON e.src = r.id GROUP BY 1),
        |r2 AS (SELECT n.id, (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))/cnt.nn + CAST(0.85 AS DOUBLE)*coalesce(c2.inflow, 0.0) AS rank
        |       FROM n CROSS JOIN cnt LEFT JOIN c2 ON n.id = c2.id)
        |SELECT id, floor((rank)*10000000000 + 0.5)/10000000000 AS rank
        |FROM r2 ORDER BY id""".stripMargin,
    // UNION-dedup recursion terminates on cycles; min(d) over all
    // depth-bounded discoveries = BFS distance, matching the frontier
    // algorithm's first-discovery depth
    "q_bfs_hops" ->
      """WITH RECURSIVE pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |seeds AS (SELECT c_custkey * 2 AS id FROM customer WHERE c_custkey <= 5),
        |reach(id, d) AS (
        |  SELECT id, CAST(0 AS BIGINT) AS d FROM seeds
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id WHERE r.d < 3)
        |SELECT id, CAST(min(d) AS BIGINT) AS dist FROM reach GROUP BY id ORDER BY id""".stripMargin,
    // per-seed q_bfs_hops reach + the 1e-9 fixed-point reciprocal sum
    "q_harmonic" ->
      """WITH RECURSIVE pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |seeds AS (SELECT c_custkey * 2 AS id FROM customer WHERE c_custkey <= 5),
        |reach(seed, id, d) AS (
        |  SELECT id AS seed, id, CAST(0 AS BIGINT) AS d FROM seeds
        |  UNION
        |  SELECT r.seed, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.id WHERE r.d < 3),
        |md AS (SELECT seed, id, min(d) AS dist FROM reach GROUP BY 1, 2)
        |SELECT id, count(*) AS n_landmarks,
        |  CAST(sum(CAST(floor(1000000000 / dist) AS BIGINT)) AS DOUBLE) / 1e9 AS harmonic
        |FROM md WHERE dist > 0 GROUP BY id ORDER BY id""".stripMargin,
    // 3 unrolled steps of the md5(seed:walk:t:u:v) argmin walk
    "q_random_walks" ->
      """WITH pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |s0 AS (SELECT c_custkey * 2 AS walk_id, c_custkey * 2 AS node
        |       FROM customer WHERE c_custkey <= 5),
        |n1 AS (SELECT walk_id, node FROM (
        |  SELECT s0.walk_id, e.dst AS node, row_number() OVER (PARTITION BY s0.walk_id
        |    ORDER BY md5(concat_ws(':', 'walk', s0.walk_id, 1, s0.node, e.dst)), e.dst) AS rn
        |  FROM s0 JOIN e ON e.src = s0.node) WHERE rn = 1),
        |n2 AS (SELECT walk_id, node FROM (
        |  SELECT n1.walk_id, e.dst AS node, row_number() OVER (PARTITION BY n1.walk_id
        |    ORDER BY md5(concat_ws(':', 'walk', n1.walk_id, 2, n1.node, e.dst)), e.dst) AS rn
        |  FROM n1 JOIN e ON e.src = n1.node) WHERE rn = 1),
        |n3 AS (SELECT walk_id, node FROM (
        |  SELECT n2.walk_id, e.dst AS node, row_number() OVER (PARTITION BY n2.walk_id
        |    ORDER BY md5(concat_ws(':', 'walk', n2.walk_id, 3, n2.node, e.dst)), e.dst) AS rn
        |  FROM n2 JOIN e ON e.src = n2.node) WHERE rn = 1)
        |SELECT walk_id, step, node FROM (
        |  SELECT walk_id, CAST(0 AS INT) AS step, node FROM s0
        |  UNION ALL SELECT walk_id, 1, node FROM n1
        |  UNION ALL SELECT walk_id, 2, node FROM n2
        |  UNION ALL SELECT walk_id, 3, node FROM n3)
        |ORDER BY walk_id, step""".stripMargin,
    // enumerate ALL <=3-hop temporal paths; min arrival per (seed, id)
    // equals the operator's min-relaxation DP (see temporalReach doc)
    "q_temporal_reach" ->
      """WITH RECURSIVE pe AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, epoch_us(l_shipdate) AS ts
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'),
        |e AS (SELECT DISTINCT src, dst, ts FROM
        |  (SELECT src, dst, ts FROM pe UNION ALL SELECT dst, src, ts FROM pe)),
        |seeds AS (SELECT c_custkey * 2 AS id FROM customer WHERE c_custkey <= 5),
        |reach(seed, id, arr, d) AS (
        |  SELECT id AS seed, id, CAST(-1 AS BIGINT) AS arr, 0 AS d FROM seeds
        |  UNION
        |  SELECT r.seed, e.dst, e.ts, r.d + 1
        |  FROM reach r JOIN e ON e.src = r.id AND e.ts >= r.arr WHERE r.d < 3)
        |SELECT seed, id, CAST(min(arr) AS BIGINT) AS arr_us
        |FROM reach WHERE d >= 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_powerlaw" ->
      """WITH pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM pe),
        |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM
        |  (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |tail AS (SELECT CAST(count(*) AS BIGINT) AS n_tail,
        |  CAST(sum(CAST(floor(ln(CAST(deg AS DOUBLE) / 5) * 1000000000 + 0.5) AS BIGINT))
        |    AS BIGINT) AS s
        |  FROM deg WHERE deg >= 5)
        |SELECT CAST(5 AS BIGINT) AS dmin, n_tail,
        |  CASE WHEN s > 0 THEN
        |    floor((1.0 + CAST(n_tail AS DOUBLE) / (CAST(s AS DOUBLE) / 1e9))*1000000 + 0.5)/1000000
        |  END AS alpha
        |FROM tail""".stripMargin,
    // Brandes unrolled: forward levels l1..l3 with exact sigma sums,
    // backward deltas dd2, dd1 with the same per-term 1e-9 quantization
    "q_betweenness" ->
      """WITH pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |l0 AS (SELECT c_custkey * 2 AS seed, c_custkey * 2 AS id, CAST(1 AS BIGINT) AS sigma
        |       FROM customer WHERE c_custkey <= 5),
        |r1 AS (SELECT l0.seed, e.dst AS id, CAST(sum(l0.sigma) AS BIGINT) AS sigma
        |       FROM l0 JOIN e ON e.src = l0.id GROUP BY 1, 2),
        |l1 AS (SELECT r1.* FROM r1 WHERE NOT EXISTS (
        |       SELECT 1 FROM l0 WHERE l0.seed = r1.seed AND l0.id = r1.id)),
        |r2 AS (SELECT l1.seed, e.dst AS id, CAST(sum(l1.sigma) AS BIGINT) AS sigma
        |       FROM l1 JOIN e ON e.src = l1.id GROUP BY 1, 2),
        |l2 AS (SELECT r2.* FROM r2
        |       WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.seed = r2.seed AND l0.id = r2.id)
        |         AND NOT EXISTS (SELECT 1 FROM l1 WHERE l1.seed = r2.seed AND l1.id = r2.id)),
        |r3 AS (SELECT l2.seed, e.dst AS id, CAST(sum(l2.sigma) AS BIGINT) AS sigma
        |       FROM l2 JOIN e ON e.src = l2.id GROUP BY 1, 2),
        |l3 AS (SELECT r3.* FROM r3
        |       WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.seed = r3.seed AND l0.id = r3.id)
        |         AND NOT EXISTS (SELECT 1 FROM l1 WHERE l1.seed = r3.seed AND l1.id = r3.id)
        |         AND NOT EXISTS (SELECT 1 FROM l2 WHERE l2.seed = r3.seed AND l2.id = r3.id)),
        |d2 AS (SELECT v.seed, v.id,
        |    CAST(sum(CAST(floor(CAST(v.sigma AS DOUBLE) / w.sigma * 1000000000 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS delta_fp
        |  FROM l2 v JOIN e ON e.src = v.id
        |  JOIN l3 w ON w.seed = v.seed AND w.id = e.dst GROUP BY 1, 2),
        |dd2 AS (SELECT l2.seed, l2.id, coalesce(d2.delta_fp, 0) AS delta_fp
        |        FROM l2 LEFT JOIN d2 ON d2.seed = l2.seed AND d2.id = l2.id),
        |d1 AS (SELECT v.seed, v.id,
        |    CAST(sum(CAST(floor(CAST(v.sigma AS DOUBLE) / w.sigma
        |      * (1.0 + CAST(dw.delta_fp AS DOUBLE) / 1e9) * 1000000000 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS delta_fp
        |  FROM l1 v JOIN e ON e.src = v.id
        |  JOIN l2 w ON w.seed = v.seed AND w.id = e.dst
        |  JOIN dd2 dw ON dw.seed = v.seed AND dw.id = e.dst GROUP BY 1, 2),
        |dd1 AS (SELECT l1.seed, l1.id, coalesce(d1.delta_fp, 0) AS delta_fp
        |        FROM l1 LEFT JOIN d1 ON d1.seed = l1.seed AND d1.id = l1.id),
        |alld AS (
        |  SELECT seed, id, CAST(0 AS BIGINT) AS delta_fp FROM l3
        |  UNION ALL SELECT seed, id, delta_fp FROM dd2
        |  UNION ALL SELECT seed, id, delta_fp FROM dd1)
        |SELECT id, floor((CAST(sum(delta_fp) AS DOUBLE) / 1e9)*1000000 + 0.5)/1000000 AS bc
        |FROM alld GROUP BY id ORDER BY id""".stripMargin,
    // PPR unrolled 2 rounds: r0 = teleport(v) = 1/|seeds∩nodes| on
    // seeds, 0 elsewhere; per-round (1−d)·t(v) + d·inflow — the
    // q_pagerank recipe with the seed-restricted teleport
    "q_ppr" ->
      """WITH pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |seeds AS (SELECT c_custkey * 2 AS id FROM customer WHERE c_custkey <= 5
        |          AND c_custkey * 2 IN (SELECT id FROM n)),
        |ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM seeds),
        |tp AS (SELECT n.id,
        |         CASE WHEN sd.id IS NOT NULL THEN CAST(1.0 AS DOUBLE)/ns.s
        |              ELSE CAST(0.0 AS DOUBLE) END AS t
        |       FROM n CROSS JOIN ns LEFT JOIN seeds sd ON sd.id = n.id),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT id, t AS rank FROM tp),
        |c1 AS (SELECT e.dst AS id, sum(r.rank/deg.d) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r0 r ON e.src = r.id GROUP BY 1),
        |r1 AS (SELECT tp.id, (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))*tp.t + CAST(0.85 AS DOUBLE)*coalesce(c1.inflow, 0.0) AS rank
        |       FROM tp LEFT JOIN c1 ON tp.id = c1.id),
        |c2 AS (SELECT e.dst AS id, sum(r.rank/deg.d) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r1 r ON e.src = r.id GROUP BY 1),
        |r2 AS (SELECT tp.id, (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))*tp.t + CAST(0.85 AS DOUBLE)*coalesce(c2.inflow, 0.0) AS rank
        |       FROM tp LEFT JOIN c2 ON tp.id = c2.id)
        |SELECT id, floor((rank)*10000000000 + 0.5)/10000000000 AS rank
        |FROM r2 ORDER BY id""".stripMargin,
    // exact reach counts via depth-bounded recursion + first-discovery
    // depth; the sketch estimate itself is gated by the within_tol
    // boolean the oracle predicts as TRUE
    "q_neighborhood" ->
      """WITH RECURSIVE pe AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-01-08'),
        |e AS (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |reach(id, r, h) AS (
        |  SELECT id, id AS r, 0 AS h FROM n
        |  UNION
        |  SELECT p.id, e.dst, p.h + 1 FROM reach p JOIN e ON e.src = p.r WHERE p.h < 3),
        |m AS (SELECT id, r, min(h) AS hmin FROM reach GROUP BY 1, 2),
        |counts AS (
        |  SELECT m.id, hops.hop, count(*) AS n_exact
        |  FROM m JOIN (VALUES (1), (2), (3)) AS hops(hop) ON m.hmin <= hops.hop
        |  GROUP BY 1, 2)
        |SELECT id, CAST(hop AS INTEGER) AS hop, CAST(n_exact AS BIGINT) AS n_exact,
        |  TRUE AS within_tol
        |FROM counts ORDER BY id, hop""".stripMargin,
    // closed-interval overlap as a direct inequality join — the
    // independent semantics twin of the Spark side's binned equi-join
    "q_interval_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS s,
        |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS e
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id % 7 = 0
        |  GROUP BY 1, 2)
        |SELECT a.user_id AS user_a, b.user_id AS user_b, a.day AS day_a,
        |  least(a.e, b.e) - greatest(a.s, b.s) AS overlap_sec
        |FROM iv a JOIN iv b
        |  ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
        |ORDER BY user_a, user_b, day_a""".stripMargin,
    // depth-bounded weighted recursion: rows are (node, path-cost, hops)
    // triples, UNION-deduped; h < 3 bounds the depth so cycles
    // terminate, and min(d) over all ≤3-hop discoveries IS the
    // 3-round Bellman-Ford distance the operator computes
    "q_sssp" ->
      """WITH RECURSIVE pe AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
        |    CAST(min(l_quantity) AS BIGINT) AS w
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
        |  GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM pe UNION ALL SELECT dst AS src, src AS dst, w FROM pe),
        |seeds AS (SELECT c_custkey * 2 AS id FROM customer WHERE c_custkey <= 5),
        |reach(id, d, h) AS (
        |  SELECT id, CAST(0 AS BIGINT) AS d, 0 AS h FROM seeds
        |  UNION
        |  SELECT e.dst, r.d + e.w, r.h + 1 FROM reach r JOIN e ON e.src = r.id WHERE r.h < 3)
        |SELECT id, min(d) AS dist FROM reach GROUP BY id ORDER BY id""".stripMargin,
    // 2 rounds unrolled; h0 = 1 so a1 is the in-degree; every score an
    // exact integer (unnormalized fixed-round HITS)
    "q_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |a1 AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS a FROM e GROUP BY 1),
        |h1 AS (SELECT e.src AS id, CAST(sum(a1.a) AS BIGINT) AS h
        |       FROM e JOIN a1 ON a1.id = e.dst GROUP BY 1),
        |a2 AS (SELECT e.dst AS id, CAST(sum(h1.h) AS BIGINT) AS a
        |       FROM e JOIN h1 ON h1.id = e.src GROUP BY 1),
        |h2 AS (SELECT e.src AS id, CAST(sum(a2.a) AS BIGINT) AS h
        |       FROM e JOIN a2 ON a2.id = e.dst GROUP BY 1)
        |SELECT n.id AS id, coalesce(h2.h, CAST(0 AS BIGINT)) AS hub,
        |  coalesce(a2.a, CAST(0 AS BIGINT)) AS authority
        |FROM n LEFT JOIN h2 ON h2.id = n.id LEFT JOIN a2 ON a2.id = n.id
        |ORDER BY n.id""".stripMargin,
  )
}
