package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Symmetric path a—b—c: b is the hub. Hand-unrolled 1 iteration:
    * r0 = 1/3 each; deg a=1, b=2, c=1.
    * r1(a) = 0.05 + 0.85·(r0(b)/2) = 0.05 + 0.85/6
    * r1(b) = 0.05 + 0.85·(r0(a)+r0(c)) = 0.05 + 0.85·2/3
    * r1(c) = r1(a). */
  private val path = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")

  test("pageRank: hand-computed ranks on a 3-node path, mass conserved") {
    val r = Graphs.pageRank(path, "src", "dst", iters = 1)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(r("c") - r("a")) < 1e-15)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "rank mass must be conserved")
    assert(r("b") > r("a"), "hub must outrank leaves")
  }

  test("pageRank: parallel edges don't double-count (distinct contract)") {
    val dup = path.union(path) // every edge twice
    val r1 = Graphs.pageRank(path, "src", "dst", iters = 2).as[(String, Double)].collect().toMap
    val r2 = Graphs.pageRank(dup, "src", "dst", iters = 2).as[(String, Double)].collect().toMap
    assert(r1 == r2)
  }

  test("pageRank: dangling node fails fast") {
    val dangling = Seq(("a", "b")).toDF("src", "dst") // b has no out-edge
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRank(dangling, "src", "dst", iters = 1)
    }
    assert(e.getMessage.contains("out-edge"))
  }

  test("triangleStats: K4 has 4 triangles, 4 wedges under a<b<c; path has 1 open wedge") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles; under the a<b<c
    // orientation every ordered triple is exactly one wedge, all closed
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("s", "d")
    val r = Graphs.triangleStats(k4, "s", "d")
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((4L, 6L, 4L, 4L)), s"K4 census wrong: $r")

    // 3-node path 1-2-3: one wedge, zero triangles
    val p = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val rp = Graphs.triangleStats(p, "s", "d").as[(Long, Long, Long, Long)].head()
    assert(rp == ((3L, 2L, 1L, 0L)), s"path census wrong: $rp")
  }

  test("triangleStats: reversed duplicates and self-loops collapse to the canonical edge") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (2L, 2L))
      .toDF("s", "d")
    val r = Graphs.triangleStats(messy, "s", "d").as[(Long, Long, Long, Long)].head()
    assert(r == ((3L, 3L, 1L, 1L)), s"canonicalization wrong: $r")
  }

  test("labelPropagation: disjoint cliques converge to their min label, deterministically") {
    val edges = Seq( // two disjoint triangles
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("s", "d")
    val got = Graphs.labelPropagation(edges, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L), "every node keeps a label")
    assert(Set(1L, 2L, 3L).forall(got(_) == 1L), s"clique A must converge to 1: $got")
    assert(Set(10L, 11L, 12L).forall(got(_) == 10L), s"clique B must converge to 10: $got")
    val again = Graphs.labelPropagation(edges, "s", "d", iters = 2).as[(Long, Long)].collect().toMap
    assert(again == got, "synchronous LPA must be deterministic")
  }

  test("labelPropagation: min-label tie-break and direction-insensitivity") {
    // path 1-2-3 given with mixed edge directions: node 2 sees labels
    // {1, 3} (tie) -> must take 1
    val path = Seq((2L, 1L), (3L, 2L)).toDF("s", "d")
    val got = Graphs.labelPropagation(path, "s", "d", iters = 1).as[(Long, Long)].collect().toMap
    assert(got(2L) == 1L, "tie must break toward the smallest label")
    assert(got(1L) == 2L && got(3L) == 2L, "endpoints adopt their only neighbor")
  }

  test("triangleStatsOriented: same triangles as id-oriented on K4, path, and random graphs") {
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("s", "d")
    val rk = Graphs.triangleStatsOriented(k4, "s", "d").as[(Long, Long, Long, Long)].head()
    // K4: every node has deg 3, so (deg, id) order == id order — the
    // census is identical to triangleStats' (4 wedges, all closed)
    assert(rk == ((4L, 6L, 4L, 4L)), s"K4 oriented census wrong: $rk")

    // property: n_nodes/n_edges/n_triangles identical to the
    // id-oriented census on seeded Erdős–Rényi graphs (only n_wedges
    // may differ — that's the point of the orientation)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val edges = (for {
        a <- 1 to n; b <- 1 to n
        if a < b && rnd.nextDouble() < 0.25
      } yield (a.toLong, b.toLong)).toDF("s", "d")
      val id = Graphs.triangleStats(edges, "s", "d").as[(Long, Long, Long, Long)].head()
      val or = Graphs.triangleStatsOriented(edges, "s", "d").as[(Long, Long, Long, Long)].head()
      assert(id._1 == or._1 && id._2 == or._2 && id._4 == or._4,
        s"trial $trial: id-oriented $id vs degree-oriented $or disagree on nodes/edges/triangles")
    }
  }

  test("triangleStatsOriented: star-graph skew — hub wedges collapse to zero") {
    // hub at the MEDIAN id (25): the id-oriented census forms a wedge
    // for every (below, hub, above) pair = 24·25 = 600; degree
    // orientation points every edge AT the hub (leaves have deg 1), so
    // no node has two out-edges and the wedge count is ZERO. This is
    // the Σ deg² → O(m^1.5) bound in miniature: per-hub work no longer
    // scales with C(deg_hub, 2).
    val star = ((1L to 24L) ++ (26L to 50L)).map { leaf =>
      (math.min(leaf, 25L), math.max(leaf, 25L))
    }.toDF("s", "d")
    val id = Graphs.triangleStats(star, "s", "d").as[(Long, Long, Long, Long)].head()
    assert(id == ((50L, 49L, 600L, 0L)), s"id-oriented star census wrong: $id")
    val or = Graphs.triangleStatsOriented(star, "s", "d").as[(Long, Long, Long, Long)].head()
    assert(or == ((50L, 49L, 0L, 0L)), s"degree-oriented star census wrong: $or")
  }

  test("graph loops bound plan depth: high-iter runs truncate lineage every 4 rounds") {
    // without Lineage.truncate, iters=9 nests 18 joins into the final
    // plan; with truncation the optimized plan restarts from a
    // LogicalRDD at round 8 and carries at most 1 round of joins
    val longPath = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels9 = Graphs.labelPropagation(longPath, "src", "dst", iters = 9)
    val lpJoins = labels9.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.length
    assert(lpJoins <= 2, s"labelPropagation iters=9 plan carries $lpJoins joins — lineage not truncated")

    val ranks9 = Graphs.pageRank(path, "src", "dst", iters = 9)
    val prJoins = ranks9.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.length
    assert(prJoins <= 4, s"pageRank iters=9 plan carries $prJoins joins — lineage not truncated")
    // rank mass still conserved through the checkpoint boundary
    val mass = ranks9.as[(String, Double)].collect().map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"rank mass drifted across truncation: $mass")
  }

  test("kCorePeel: triangle with a tail peels the tail, keeps the triangle (fixpoint)") {
    // 1-2-3 triangle + 3-4-5 path; k=2: round 1 drops 5 (deg 1), round
    // 2 drops 4, then the triangle is stable — the 2-core
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val got = graft.operators.Graphs.kCorePeel(edges, "s", "d", k = 2, rounds = 3)
      .orderBy("round").as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((0, 5L, 5L), (1, 4L, 4L), (2, 3L, 3L), (3, 3L, 3L)),
      s"peel trajectory drifted: $got")
  }

  test("kCorePeel: canonicalization — self-loops and reversed duplicates don't inflate degree") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = graft.operators.Graphs.kCorePeel(edges, "s", "d", k = 2, rounds = 1)
      .orderBy("round").as[(Int, Long, Long)].collect().toSeq
    // clean graph is the 1-2-3 triangle: everyone has deg 2, nothing peels
    assert(got == Seq((0, 3L, 3L), (1, 3L, 3L)), s"got $got")
  }

  test("modularity: two disjoint triangles with perfect labels score exactly 0.5") {
    // K3 ∪ K3: m = 6, per community e_c = 3, d_c = 6
    // Q = 2 · (3/6 − (6/12)²) = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "label")
    val r = Graphs.modularity(edges, "a", "b", labels)
      .select("label", "n_nodes", "degree_sum", "intra_edges", "modularity", "m")
      .as[(Long, Long, Long, Long, Double, Long)].collect()
    assert(r.length == 2 && r.forall(_._6 == 6L))
    r.foreach { x =>
      assert(x._2 == 3 && x._3 == 6 && x._4 == 3, s"per-community counts wrong: $x")
      assert(math.abs(x._5 - 0.5) < 1e-9)
    }
    labels.unpersist(); edges.unpersist()
  }

  test("modularity: the all-in-one labeling scores 0; singletons score negative") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("id", "label")
    val q1 = Graphs.modularity(edges, "a", "b", one)
      .select("modularity").as[Double].head()
    assert(math.abs(q1) < 1e-9, s"single community must score 0, got $q1")
    val selfs = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "label")
    val q2 = Graphs.modularity(edges, "a", "b", selfs)
      .select("modularity").as[Double].head()
    assert(q2 < 0, s"all-singleton labeling must be negative, got $q2")
  }

  test("degreeAssortativity: star is maximally disassortative, regular graph undefined") {
    // star 0—{1,2,3}: every edge joins deg-3 hub to a deg-1 leaf → r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val rs = Graphs.degreeAssortativity(star, "a", "b")
      .select("n_nodes", "m", "assortativity").as[(Long, Long, Option[Double])].head()
    assert(rs._1 == 4 && rs._2 == 3)
    assert(math.abs(rs._3.get - (-1.0)) < 1e-12, s"star must score -1, got ${rs._3}")
    // triangle: all degrees equal — zero variance, r undefined (NULL)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val rt = Graphs.degreeAssortativity(tri, "a", "b")
      .select("assortativity").as[Option[Double]].head()
    assert(rt.isEmpty, "degree-regular graph must yield NULL")
    // two disjoint edges joined through a path: positive-leaning mixing
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val rp = Graphs.degreeAssortativity(path, "a", "b")
      .select("assortativity").as[Option[Double]].head()
    assert(rp.get < 0, "path-of-4 ends pull r negative")
  }

  test("hits: hand-unrolled 2 rounds on a tiny directed bipartite graph") {
    // 1→3, 2→3, 2→4: a1 = in-degree (3:2, 4:1); h1 (1:2, 2:3);
    // a2 (3:5, 4:3); h2 (1:5, 2:8). Pure-role nodes score 0 on the other.
    val g = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("s", "d")
    val got = Graphs.hits(g, "s", "d", iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (5L, 0L), 2L -> (8L, 0L), 3L -> (0L, 5L), 4L -> (0L, 3L)), s"got $got")
  }

  test("linkPrediction: square graph predicts exactly the two diagonals") {
    // cycle 1-2-3-4: non-edges (1,3) and (2,4), each with 2 common
    // neighbors of degree 2 → adamic_adar = 2·fx(1/ln 2) = 2.885390082
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val got = Graphs.linkPrediction(g, "s", "d", topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)).toSet ==
      Set((1L, 3L, 2L), (2L, 4L, 2L)), s"got $got")
    got.foreach(r => assert(r._4 == 2.885390082, s"adamic_adar ${r._4}"))
    // existing edges must never appear
    assert(!got.exists(r => r._1 == 1L && r._2 == 2L))
  }

  test("bfsHops: path distances, hop budget cutoff, unreached absent") {
    // 1 -> 2 -> 3 -> 4 -> 5, seed {1}, budget 3: node 5 out of reach
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val got = Graphs.bfsHops(path, "s", "d", seeds, "id", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"got $got")
  }

  test("bfsHops: cycles terminate, multi-seed takes the minimum, revisits keep first depth") {
    // triangle 1-2-3 (directed cycle) plus 3 -> 4; seeds {1, 4}
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val seeds = Seq(1L, 4L).toDF("id")
    val got = Graphs.bfsHops(g, "s", "d", seeds, "id", maxHops = 5)
      .as[(Long, Long)].collect().toMap
    // 4 is a seed (dist 0), NOT 1's 3-hop discovery; cycle nodes settle once
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L), s"got $got")
  }

  test("sssp: round budget is a hop bound — the cheap 2-edge path needs round 2") {
    // a->b->c cheap (1+1), a->c direct but expensive (5)
    val g = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 5L)).toDF("s", "d", "w")
    val seeds = Seq(Tuple1("a")).toDF("id")
    val r1 = Graphs.sssp(g, "s", "d", "w", seeds, "id", rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(r1 == Map("a" -> 0L, "b" -> 1L, "c" -> 5L), s"round 1: $r1")
    val r2 = Graphs.sssp(g, "s", "d", "w", seeds, "id", rounds = 2)
      .as[(String, Long)].collect().toMap
    assert(r2 == Map("a" -> 0L, "b" -> 1L, "c" -> 2L), s"round 2: $r2")
  }

  test("sssp: parallel edges collapse to the cheapest; multi-seed takes the min") {
    val g = Seq(("a", "b", 7L), ("a", "b", 3L), ("b", "c", 1L), ("z", "c", 1L))
      .toDF("s", "d", "w")
    val seeds = Seq("a", "z").toDF("id")
    val got = Graphs.sssp(g, "s", "d", "w", seeds, "id", rounds = 3)
      .as[(String, Long)].collect().toMap
    // c: via z (cost 1), not via a (3+1); b: the 3-cost parallel edge
    assert(got == Map("a" -> 0L, "z" -> 0L, "b" -> 3L, "c" -> 1L), s"got $got")
  }

  test("weightedPageRank: uniform weights reproduce pageRank exactly") {
    val u = path.withColumn("w", lit(1.0))
    val wr = Graphs.weightedPageRank(u, "src", "dst", "w", iters = 2)
      .as[(String, Double)].collect().toMap
    val pr = Graphs.pageRank(path, "src", "dst", iters = 2)
      .as[(String, Double)].collect().toMap
    assert(wr == pr, s"weighted(uniform)=$wr vs plain=$pr")
  }

  /** Hand-unrolled PPR on the a—b—c path, seeds {a}, 2 rounds:
    * r1 = (0.15, 0.85, 0); r2(a) = 0.15 + 0.85·(0.85/2) = 0.51125,
    * r2(b) = 0.85·0.15 = 0.1275, r2(c) = 0.85·(0.85/2) = 0.36125. */
  test("personalizedPageRank: hand-computed seed-proximity ranks, mass conserved, " +
    "unreached nodes at exact zero") {
    val seeds = Seq(Tuple1("a")).toDF("id")
    val r = Graphs.personalizedPageRank(path, "src", "dst", seeds, "id", iters = 2)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r("a") - 0.51125) < 1e-12, s"a: ${r("a")}")
    assert(math.abs(r("b") - 0.1275) < 1e-12, s"b: ${r("b")}")
    assert(math.abs(r("c") - 0.36125) < 1e-12, s"c: ${r("c")}")
    assert(math.abs(r.values.sum - 1.0) < 1e-12, "mass conserved")
    // disconnected component: exact zero, not epsilon
    val twoComp = path.union(Seq(("x", "y"), ("y", "x")).toDF("src", "dst"))
    val r2 = Graphs.personalizedPageRank(twoComp, "src", "dst", seeds, "id", iters = 2)
      .as[(String, Double)].collect().toMap
    assert(r2("x") == 0.0 && r2("y") == 0.0, s"unreached: $r2")
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(path, "src", "dst",
        Seq(Tuple1("zzz")).toDF("id"), "id", iters = 1)
    }
  }

  test("neighborhoodFunction: sketch reach curve is exact on a small path graph") {
    // symmetric path 1—2—3—4
    val p = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val est = Graphs.neighborhoodFunction(p, "src", "dst", maxHops = 3)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> math.round(r._3)).toMap
    val want = Map(
      (1L, 1) -> 2L, (1L, 2) -> 3L, (1L, 3) -> 4L,
      (2L, 1) -> 3L, (2L, 2) -> 4L, (2L, 3) -> 4L,
      (3L, 1) -> 3L, (3L, 2) -> 4L, (3L, 3) -> 4L,
      (4L, 1) -> 2L, (4L, 2) -> 3L, (4L, 3) -> 4L)
    assert(est == want, s"got $est")
  }

  test("weightedPageRank: heavier edge pulls more rank; mass conserved; parallel edges sum") {
    // star: b links to a (weight 9) and c (weight 1)
    val g = Seq(("b", "a", 9.0), ("b", "c", 1.0), ("a", "b", 1.0), ("c", "b", 1.0))
      .toDF("src", "dst", "w")
    val r = Graphs.weightedPageRank(g, "src", "dst", "w", iters = 2)
      .as[(String, Double)].collect().toMap
    assert(r("a") > r("c"), s"the weight-9 target must outrank the weight-1 target: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "rank mass must be conserved")
    // splitting b->a into two parallel halves must be identical
    val split = Seq(("b", "a", 4.5), ("b", "a", 4.5), ("b", "c", 1.0),
      ("a", "b", 1.0), ("c", "b", 1.0)).toDF("src", "dst", "w")
    val r2 = Graphs.weightedPageRank(split, "src", "dst", "w", iters = 2)
      .as[(String, Double)].collect().toMap
    assert(r2 == r, s"parallel-edge sum contract: $r2 vs $r")
  }

  test("multiSourceBfs: per-seed exact distances on a 4-node path") {
    // a—b—c—d symmetric, seeds {a, d}
    val p4 = Seq(("a","b"),("b","a"),("b","c"),("c","b"),("c","d"),("d","c"))
      .toDF("src", "dst")
    val seeds = Seq("a", "d").toDF("id")
    val d = Graphs.multiSourceBfs(p4, "src", "dst", seeds, "id", maxHops = 3)
      .as[(String, String, Long)].collect().toSet
    val want = Set(
      ("a","a",0L), ("a","b",1L), ("a","c",2L), ("a","d",3L),
      ("d","d",0L), ("d","c",1L), ("d","b",2L), ("d","a",3L))
    assert(d == want, s"got $d")
  }

  test("harmonicCentrality: hand-computed landmark sums, 1e-9 fixed point") {
    val p4 = Seq(("a","b"),("b","a"),("b","c"),("c","b"),("c","d"),("d","c"))
      .toDF("src", "dst")
    val seeds = Seq("a", "d").toDF("id")
    val h = Graphs.harmonicCentrality(p4, "src", "dst", seeds, "id", maxHops = 3)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // b: 1/1 (a) + 1/2 (d) = 1.5 ; c symmetric; a: 1/3 from d, floored
    assert(h("b") == ((2L, 1.5)) && h("c") == ((2L, 1.5)), s"got $h")
    assert(h("a") == ((1L, 0.333333333)) && h("d") == ((1L, 0.333333333)),
      s"fixed-point floor(1e9/3)/1e9 expected: $h")
  }

  test("densestSubgraphPeel: K4-plus-pendant peels to K4, then to empty") {
    // K4 on {1,2,3,4} + pendant 5—1: densities 7/5, then 6/4, then empty
    val e = ((for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      :+ (1L, 5L)).toDF("s", "d")
    val r = Graphs.densestSubgraphPeel(e, "s", "d", rounds = 2)
      .as[(Int, Long, Long, Option[Double])].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(0) == ((5L, 7L, Some(1.4))), s"round 0: ${r(0)}")
    assert(r(1) == ((4L, 6L, Some(1.5))), s"round 1 must be K4: ${r(1)}")
    assert(r(2) == ((0L, 0L, None)), s"round 2 must be fully peeled: ${r(2)}")
  }

  test("randomWalks: deterministic, neighbor-valid, early-stop at a sink") {
    val g = Seq(("a","b"),("b","a"),("b","c"),("c","b"),("x","y")) // y is a sink
      .toDF("src", "dst")
    val seeds = Seq("a", "x").toDF("id")
    def run() = Graphs.randomWalks(g, "src", "dst", seeds, "id", steps = 3, seed = "t")
      .as[(String, Int, String)].collect().toSet
    val w1 = run()
    assert(w1 == run(), "same seed must replay the identical walks")
    val adj = Map("a" -> Set("b"), "b" -> Set("a","c"), "c" -> Set("b"), "x" -> Set("y"))
    val byWalk = w1.groupBy(_._1)
    // walk from a: 4 rows (steps 0..3), every hop follows an edge
    assert(byWalk("a").size == 4)
    val aw = byWalk("a").toSeq.sortBy(_._2).map(_._3)
    aw.sliding(2).foreach { case scala.collection.Seq(u, v) =>
      assert(adj(u).contains(v), s"walk hop $u->$v is not an edge") }
    // walk from x reaches sink y at step 1 and stops
    assert(byWalk("x").toSeq.sortBy(_._2).map(_._3) == Seq("x", "y"),
      s"sink walk must end early: ${byWalk("x")}")
  }

  test("kTruss: K4-plus-pendant at k=4 drops the pendant, then holds K4 as a fixed point") {
    val e = ((for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      :+ (1L, 5L)).toDF("s", "d")
    val r = Graphs.kTruss(e, "s", "d", k = 4, rounds = 2)
      .as[(Int, Long)].collect().toMap
    // every K4 edge carries 2 triangles (support 2 >= k-2); pendant has 0
    assert(r == Map(0 -> 7L, 1 -> 6L, 2 -> 6L), s"got $r")
  }

  test("kTruss: a bare triangle dies at k=4 (support 1 < 2) but survives k=3") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    val r4 = Graphs.kTruss(tri, "s", "d", k = 4, rounds = 1).as[(Int, Long)].collect().toMap
    assert(r4 == Map(0 -> 3L, 1 -> 0L), s"k=4 got $r4")
    val r3 = Graphs.kTruss(tri, "s", "d", k = 3, rounds = 2).as[(Int, Long)].collect().toMap
    assert(r3 == Map(0 -> 3L, 1 -> 3L, 2 -> 3L), s"k=3 got $r3")
  }

  test("temporalReach: edges that fired before arrival cannot forward; earliest arrival is exact") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // a -(t=10)-> b -(t=5)-> c : NOT time-respecting (5 < 10)
    // a -(t=10)-> b -(t=20)-> c : respects time, arrives at 20
    // plus a later direct a -(t=30)-> c that must LOSE to 20
    val e = Seq(("a", "b", ts(10)), ("b", "c", ts(5)), ("b", "c", ts(20)), ("a", "c", ts(30)))
      .toDF("src", "dst", "t")
    val seeds = Seq("a").toDF("id")
    val r = Graphs.temporalReach(e, "src", "dst", "t", seeds, "id", maxHops = 3)
      .as[(String, String, Long)].collect().map(x => x._2 -> x._3).toMap
    assert(r == Map("b" -> 10000000L, "c" -> 20000000L), s"got $r")
  }

  test("temporalReach: pre-1970 timestamps (negative epoch-us) are reachable from seeds") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L) // negative = pre-epoch
    // both edges BEFORE the epoch; a -1L seed sentinel would block hop 1
    val e = Seq(("a", "b", ts(-1000)), ("b", "c", ts(-500))).toDF("src", "dst", "t")
    val seeds = Seq("a").toDF("id")
    val r = Graphs.temporalReach(e, "src", "dst", "t", seeds, "id", maxHops = 2)
      .as[(String, String, Long)].collect().map(x => x._2 -> x._3).toMap
    assert(r == Map("b" -> -1000000000L, "c" -> -500000000L), s"got $r")
  }

  test("temporalReach: static path exists but no temporal path -> unreachable") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val e = Seq(("a", "b", ts(10)), ("b", "c", ts(5))).toDF("src", "dst", "t")
    val seeds = Seq("a").toDF("id")
    val r = Graphs.temporalReach(e, "src", "dst", "t", seeds, "id", maxHops = 3)
      .as[(String, String, Long)].collect().map(x => x._2 -> x._3).toMap
    assert(r == Map("b" -> 10000000L), s"c must be temporally unreachable: $r")
  }

  test("degreeTailAlpha: hand-computed Hill estimate; all-at-dmin tail is NULL") {
    // star on hub h with 4 leaves + K3 among {x,y,z}: degrees h=4, leaves=1, x=y=z=2
    val star = (1 to 4).map(i => ("h", s"l$i")) ++ Seq(("x","y"),("y","z"),("x","z"))
    val e = star.toDF("s", "d")
    val r = Graphs.degreeTailAlpha(e, "s", "d", dmin = 2)
      .as[(Long, Long, Option[Double])].head()
    // tail degrees {4,2,2,2}: sum ln(d/2) = ln 2 quantized at 1e-9
    val expect = 1.0 + 4.0 / (math.floor(math.log(2.0) * 1e9 + 0.5) / 1e9)
    assert(r._1 == 2L && r._2 == 4L, s"got $r")
    assert(math.abs(r._3.get - expect) < 1e-12, s"got ${r._3}")
    val flat = Seq(("p","q")).toDF("s", "d") // both degrees = 1 = dmin
    val rf = Graphs.degreeTailAlpha(flat, "s", "d", dmin = 1)
      .as[(Long, Long, Option[Double])].head()
    assert(rf == ((1L, 2L, None)), s"degenerate tail must be NULL: $rf")
  }

  test("betweennessSampled: path graph hand values; diamond splits dependency 0.5/0.5") {
    // path a-b-c-d-e symmetric, source {a}: delta b=3, c=2, d=1, e=0
    val pth = Seq(("a","b"),("b","c"),("c","d"),("d","e"))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("s", "d")
    val bc = Graphs.betweennessSampled(pth, "s", "d", Seq("a").toDF("id"), "id", maxHops = 4)
      .as[(String, Double)].collect().toMap
    assert(bc == Map("b" -> 3.0, "c" -> 2.0, "d" -> 1.0, "e" -> 0.0), s"got $bc")

    // diamond a->{b,c}->d: two shortest paths, each carries 1/2
    val dia = Seq(("a","b"),("a","c"),("b","d"),("c","d"))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("s", "d")
    val bd = Graphs.betweennessSampled(dia, "s", "d", Seq("a").toDF("id"), "id", maxHops = 2)
      .as[(String, Double)].collect().toMap
    assert(bd == Map("b" -> 0.5, "c" -> 0.5, "d" -> 0.0), s"got $bd")
  }

  test("betweennessSampled: multi-source sums dependencies across seeds") {
    // path a-b-c symmetric, seeds {a, c}: each source gives delta(b)=1
    val p3 = Seq(("a","b"),("b","a"),("b","c"),("c","b")).toDF("s", "d")
    val bc = Graphs.betweennessSampled(p3, "s", "d", Seq("a","c").toDF("id"), "id", maxHops = 2)
      .as[(String, Double)].collect().toMap
    // b gets 1 from a and 1 from c; endpoints get 1 as each other's leaf... 
    // from a: levels a->b(s1)->c(s1): delta(b)=1, delta(c)=0
    // from c: delta(b)=1, delta(a)=0
    assert(bc == Map("b" -> 2.0, "a" -> 0.0, "c" -> 0.0), s"got $bc")
  }

  test("attributeAssortativity: bridged same-label triangles; perfect homophily = 1; single label NULL") {
    val triA = Seq(("a1","a2"),("a2","a3"),("a1","a3"))
    val triB = Seq(("b1","b2"),("b2","b3"),("b1","b3"))
    val lab = Seq(("a1","A"),("a2","A"),("a3","A"),("b1","B"),("b2","B"),("b3","B"))
      .toDF("id", "l")
    val bridged = (triA ++ triB :+ ("a1","b1")).toDF("s", "d")
    val r = Graphs.attributeAssortativity(bridged, "s", "d", lab, "id", "l")
      .as[(Long, Long, Double, Option[Double])].head()
    // 2m=14, T=12, ra=rb=7 per label: r = (12*14-98)/(196-98) = 70/98
    assert(r._1 == 14L && r._2 == 12L, s"got $r")
    assert(math.abs(r._4.get - 70.0/98) < 1e-12, s"got $r")

    val perfect = (triA ++ triB).toDF("s", "d")
    val rp = Graphs.attributeAssortativity(perfect, "s", "d", lab, "id", "l")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(rp._4.contains(1.0), s"disconnected same-label cliques must give r=1: $rp")

    val mono = triA.toDF("s", "d")
    val rm = Graphs.attributeAssortativity(mono, "s", "d", lab, "id", "l")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(rm._4.isEmpty, s"single-label graph must give NULL r: $rm")
  }

  test("diameterDoubleSweep: path graph exact; tie on farthest goes to smaller id") {
    val p4 = Seq(("a","b"),("b","c"),("c","d"))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("s", "d")
    val r = Graphs.diameterDoubleSweep(p4, "s", "d", maxHops = 8)
      .as[(String, String, Long, Long)].head()
    assert(r == (("a", "d", 3L, 3L)), s"got $r")

    val star = Seq(("a","b"),("a","c"))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("s", "d")
    val rs = Graphs.diameterDoubleSweep(star, "s", "d", maxHops = 8)
      .as[(String, String, Long, Long)].head()
    assert(rs == (("a", "b", 1L, 2L)), s"tie must pick b over c: $rs")
  }

  test("labelSpread: hard-clamped seeds, one hop per round, majority with min-label ties") {
    // path a-b-c-d, seed a=X: b labeled round 1, c round 2, d absent
    val pth = Seq(("a","b"),("b","c"),("c","d")).toDF("s", "d")
    val seeds = Seq(("a", "X")).toDF("id", "l")
    val r = Graphs.labelSpread(pth, "s", "d", seeds, "id", "l", rounds = 2)
      .as[(String, String, Int)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r == Map("a" -> (("X", 0)), "b" -> (("X", 1)), "c" -> (("X", 2))), s"got $r")

    // tie: m sees one A and one B neighbor -> min label A; seeds never flip
    val star = Seq(("m","s1"),("m","s2")).toDF("s", "d")
    val sd = Seq(("s1","A"),("s2","B")).toDF("id", "l")
    val rt = Graphs.labelSpread(star, "s", "d", sd, "id", "l", rounds = 1)
      .as[(String, String, Int)].collect().map(x => x._1 -> x._2).toMap
    assert(rt == Map("s1" -> "A", "s2" -> "B", "m" -> "A"), s"got $rt")
  }
}
