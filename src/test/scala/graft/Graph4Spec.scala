package graft

import graft.api.GraftOps
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Round-4 graph additions: multi-source BFS hop distance, k-core
  * peeling, neighborhood Jaccard. The registered queries run fixed
  * unrolls (oracle-exact by construction); these specs pin the
  * SEMANTICS — hand-checked small graphs, and fixpoint assertions
  * proving the fixed round counts exceed convergence at test scale. */
class Graph4Spec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // path 0-1-2-3-4 plus an isolated edge (10, 11)
  private def path = ((0L to 3L).map(i => (i, i + 1)) ++ Seq((10L, 11L)))
    .toDF("a", "b")

  test("bfsHops: exact hop distances on a path; unreached nodes absent") {
    val d = GraftOps.bfsHops(path, "a", "b", Seq(0L), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("bfsHops: multi-source takes the minimum over sources") {
    val d = GraftOps.bfsHops(path, "a", "b", Seq(0L, 4L), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("bfsHops: capped rounds reach only the frontier within the cap") {
    val d = GraftOps.bfsHops(path, "a", "b", Seq(0L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("graph_bfs round count is past the fixpoint at test scale") {
    val und = graft.sources.Tables.lineitem(SparkSpec.spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + Graph.PartOffset).as("p"))
    def run(r: Int) = GraftOps.bfsHops(und, "s", "p", Graph.Sources, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(Graph.BfsRounds) == run(Graph.BfsRounds + 1))
  }

  test("ssspWeighted: cheap long path beats the expensive direct edge") {
    // 0→4 direct costs 10; 0→1→2→3→4 costs 4×2 = 8 — the weighted
    // optimum takes MORE hops than BFS would
    val we = ((0L to 3L).map(i => (i, i + 1, 2L)) :+ ((0L, 4L, 10L))
      .asInstanceOf[(Long, Long, Long)]).toDF("s", "d", "w")
    val dist = GraftOps.ssspWeighted(we, "s", "d", "w", Seq(0L), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(0L -> 0L, 1L -> 2L, 2L -> 4L, 3L -> 6L, 4L -> 8L))
    // with too few rounds the relaxation must still hold the best
    // found so far (direct edge), not an incomplete chain
    val capped = GraftOps.ssspWeighted(we, "s", "d", "w", Seq(0L), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(4L) == 10L && capped(2L) == 4L)
  }

  test("double sweep attains the exact diameter on a path graph") {
    // sweep 1 from the MIDDLE of path 0-1-2-3-4 reaches an end (0 or 4,
    // tie → 0); sweep 2 from that end walks the full path: estimate 4
    val und = (0L to 3L).map(i => (i, i + 1)).toDF("a", "b")
    val d1 = GraftOps.bfsHops(und, "a", "b", Seq(2L), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u = d1.toSeq.sortBy { case (v, d) => (-d, v) }.head._1
    assert(u == 0L, s"farthest-from-middle pick $u")
    val d2 = GraftOps.bfsHops(und, "a", "b", Seq(u), rounds = 6)
      .collect().map(_.getLong(1)).max
    assert(d2 == 4L)
  }

  test("graph_sssp round count is past the fixpoint at test scale") {
    val we = Graph.weightedPairCosts(SparkSpec.spark, sf)
    def run(r: Int) = GraftOps.ssspWeighted(we, "src", "dst", "w", Graph.Sources, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(Graph.SsspRounds) == run(Graph.SsspRounds + 1))
  }

  // triangle (1,2,3) with a pendant vertex 4 hanging off 3: the 2-core
  // is exactly the triangle, found after peeling 4 (then nothing more)
  private def tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")

  test("kCore: 2-core of triangle+pendant is the triangle") {
    val core = GraftOps.kCore(tri, "a", "b", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above the max degree empties the graph") {
    assert(GraftOps.kCore(tri, "a", "b", k = 5, rounds = 3).isEmpty)
  }

  test("kCore peeling reaches a NON-TRIVIAL fixpoint within the unroll") {
    val und = graft.sources.Tables.lineitem(SparkSpec.spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + Graph.PartOffset).as("p"))
    // k=10 actually cascades at sf0.001 (peels ~1/3, keeps 134 of 210
    // vertices — measured); the registered query's k=28 empties this
    // tiny graph, which would make the fixpoint assertion vacuous
    def run(r: Int) = GraftOps.kCore(und, "s", "p", 10, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val atCap = run(Graph.KCoreRounds)
    assert(atCap == run(Graph.KCoreRounds + 1))
    assert(atCap.nonEmpty && atCap.size < und.select("s").distinct().count() +
      und.select("p").distinct().count())
    // survivors of a converged peel all meet the core degree bound
    assert(atCap.values.forall(_ >= 10))
  }

  test("hits: stronger hubs and authorities rank above weaker ones") {
    // 1 points at both parts, 2 at one; 10 is cited twice, 11 once
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("s", "d")
    val r = GraftOps.hits(edges, "s", "d", iters = 5)
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(1L)._1 > r(2L)._1, "hub(1) should beat hub(2)")
    assert(r(10L)._2 > r(11L)._2, "auth(10) should beat auth(11)")
    assert(r(10L)._1 == 0.0 && r(1L)._2 == 0.0, "sinks have no hub, sources no auth")
    // L1 normalization: hubs and auths each sum to ~1
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-6)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("labelPropagation: two cliques with one bridge form two communities") {
    val clique1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val clique2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val g = (clique1 ++ clique2 ++ Seq((3L, 4L))).toDF("a", "b")
    val comm = GraftOps.labelPropagation(g, "a", "b", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).map(comm) == Set(1L))
    assert(Set(4L, 5L, 6L).map(comm) == Set(4L))
  }

  test("wedge sampling at p=1 reproduces the exact triangle count") {
    // every wedge sampled ⇒ closed == T and the estimate is exact;
    // proves the orientation + closure logic matches triangleCount
    val und = graft.sources.Tables.lineitem(SparkSpec.spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = und.as("x").join(und.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    val exact = GraftOps.triangleCount(edges, "a", "b")
      .head().getLong(0)
    val w = GraftOps.triangleCountWedge(edges, "a", "b", p = 1.0).head()
    assert(w.getLong(0) == exact, "p=1 estimate must equal the exact count")
    assert(w.getLong(1) == exact)
    assert(w.getLong(2) == w.getLong(3), "p=1 must sample every wedge")
  }

  test("weighted PageRank with uniform weights equals the unweighted core") {
    val edges = Seq((0L, 10L), (0L, 11L), (1L, 10L), (2L, 12L), (10L, 0L))
      .toDF("s", "d")
    val uw = GraftOps.personalizedPageRank(edges, "s", "d", Seq(0L, 1L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = GraftOps.personalizedPageRankWeighted(
        edges.withColumn("wt", lit(7.5)), "s", "d", "wt", Seq(0L, 1L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uw.keySet == w.keySet)
    uw.foreach { case (v, r) => assert(math.abs(r - w(v)) < 1e-12, s"node $v") }
    assert(math.abs(w.values.sum - 1.0) < 1e-9, "mass not conserved")
  }

  test("weighted PageRank shifts rank toward the heavy edge") {
    // source 0 points at 10 (w=9) and 11 (w=1): 10 must outrank 11
    val e = Seq((0L, 10L, 9.0), (0L, 11L, 1.0)).toDF("s", "d", "wt")
    val r = GraftOps.personalizedPageRankWeighted(e, "s", "d", "wt", Seq(0L))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(10L) > r(11L))
  }

  test("connectedComponentsAuto returns empty on an empty edge list") {
    // regression: the label-sum convergence witness is NULL on an empty
    // graph — must read as converged, not NPE
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(GraftOps.connectedComponentsAuto(empty, "a", "b").isEmpty)
  }

  test("cosineTopK supports non-numeric id columns (window fallback)") {
    // regression: the heap aggregate CASTs its payload to BIGINT, which
    // nulls string ids; string-id corpora must take the window form
    // with the identical (cos DESC, id ASC) tie-break
    val df = Seq(
      ("a", Array(1.0f, 0.0f)), ("b", Array(1.0f, 0.1f)),
      ("c", Array(0.0f, 1.0f)), ("q", Array(1.0f, 0.05f))
    ).toDF("doc_id", "emb")
    val r = GraftOps.cosineTopK(df, "doc_id", "emb",
        queries = df.filter(col("doc_id") === "q"), k = 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2)))
    assert(r.map(_._3).toSeq == Seq("b", "a"),
      s"expected neighbors (b, a), got ${r.toSeq}")
  }

  test("graphJaccard: hand-checked neighborhood similarity") {
    // suppliers {1,2} share part 10 of their two parts each:
    // common=1, |N(1)|=|N(2)|=2 → J=1/3; supplier 3 shares nothing
    val sp = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 13L))
      .toDF("l_suppkey", "l_partkey")
    val j = GraftOps.neighborhoodJaccard(sp, "l_partkey", "l_suppkey",
      topN = 50, itemCap = 64).collect()
    assert(j.length == 1)
    val r = j.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getLong(2) == 1L && math.abs(r.getDouble(3) - 0.333333) < 1e-9)
  }

  test("neighborhoodJaccard: hot-item cap bounds the wedge fan-out") {
    // one hot part (100) with 12 suppliers, plus a normal part (200)
    // shared by suppliers {1, 2}. With itemCap = 4 the hot part
    // contributes at most C(4,2) = 6 pairs instead of C(12,2) = 66.
    val hot = (1L to 12L).map(s => (s, 100L))
    val sp = (hot ++ Seq((1L, 200L), (2L, 200L)))
      .toDF("l_suppkey", "l_partkey")
    val capped = GraftOps.neighborhoodJaccard(sp, "l_partkey", "l_suppkey",
      topN = 1000, itemCap = 4).collect()
    // pairs from the hot part ≤ 6; the (1,2) pair may gain common=1
    // from part 200 — total distinct pairs is bounded by 6 + 1
    assert(capped.length <= 7, s"cap leaked: ${capped.length} pairs")
    assert(capped.map(_.getLong(2)).forall(_ <= 2))
    // uncapped control: all C(12,2) = 66 distinct pairs survive (the
    // (1,2) pair folds part 200 into common=2, still one pair)
    val full = GraftOps.neighborhoodJaccard(sp, "l_partkey", "l_suppkey",
      topN = 1000, itemCap = 64).collect()
    assert(full.length == 66,
      s"uncapped should yield all C(12,2) hot pairs, got ${full.length}")
  }

  test("scc: cycle with tail plus a separate 2-cycle") {
    // SCCs: {1,2,3} (the cycle), {4} (the tail), {10,11} (the 2-cycle)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (10L, 11L), (11L, 10L))
      .toDF("s", "d")
    val r = GraftOps.stronglyConnectedComponents(e, "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      10L -> 10L, 11L -> 10L))
  }

  test("scc: a pure chain is all singletons (adversarial peel order)") {
    // condensation = a path of 10 singleton SCCs — the case where
    // id-ordered peeling would need 10 outer rounds; md5 priorities
    // must still exhaust it within the outer-round budget
    val e = (1L to 9L).map(i => (i, i + 1)).toDF("s", "d")
    val r = GraftOps.stronglyConnectedComponents(e, "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == (1L to 10L).map(v => v -> v).toMap)
  }

  test("scc: chain with pendants — trim peels degree-0 layers, and is semantics-free") {
    // core 3-cycle {1,2,3}; out-pendant chain 3→4→5→6 (trim peels the
    // degree-0 tail layer by layer), in-pendant chain 7→8→1 (peels from
    // the head), and a detached edge 20→21 — everything but the cycle
    // should fall to the trim stage before any sweep runs
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 1L), (20L, 21L)).toDF("s", "d")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 6L,
      7L -> 7L, 8L -> 8L, 20L -> 20L, 21L -> 21L)
    val r = GraftOps.stronglyConnectedComponents(e, "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == want)
    // trim disabled (maxTrim = 0) must give the identical answer: the
    // stage is an optimization, never a semantics change
    val r0 = GraftOps.stronglyConnectedComponents(e, "s", "d", maxTrim = 0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r0 == want)
  }

  test("scc: two cycles bridged by a one-way edge stay separate") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("s", "d")
    val r = GraftOps.stronglyConnectedComponents(e, "s", "d")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("scc condensation contains no 2-cycles (components were maximal)") {
    // a→b and b→a surviving contraction would mean two "SCCs" are
    // mutually reachable — i.e. the peeling under-merged them
    val c = Graph.graphSccCondensation(SparkSpec.spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c.nonEmpty)
    assert(c.forall { case (a, b) => !c.contains((b, a)) },
      "condensation contains a mutual pair")
  }

  test("topo levels: longest-path stages on a hand DAG; fixpoint at test scale") {
    // 1→2→3 plus shortcut 1→3: level(3) must follow the LONG path (2)
    val dag = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val l = Graph.topoLevelsOf(dag, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // registered round count exceeds the condensation's depth
    val ce = Graph.graphSccCondensation(SparkSpec.spark, sf)
      .select(col("src_scc").as("src"), col("dst_scc").as("dst"))
    def levels(r: Int) = Graph.topoLevelsOf(ce, r).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(levels(Graph.SccChainLen) == levels(Graph.SccChainLen + 1))
  }

  test("anf: k > |V| makes the KMV curve exact on a path graph") {
    // path 1-2-3-4-5, k = 8 > 5: every sketch stays unsaturated, so
    // each per-vertex estimate is the EXACT |B(v,h)| and the curve is
    // N(0)=5, N(1)=13, N(2)=19, N(3)=23, then 25 at the diameter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = GraftOps.anfSketch(path, "a", "b", k = 8, rounds = 5).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r == Map(0 -> 5.0, 1 -> 13.0, 2 -> 19.0, 3 -> 23.0, 4 -> 25.0, 5 -> 25.0))
  }

  test("anf: saturated sketches estimate within the KMV error bound on a clique") {
    // K12 clique: true |B(v,1)| = 12 for every vertex, sketches
    // saturate at k = 4; the (k-1)/x_k estimator's relative standard
    // error is ~1/sqrt(k-2) — assert a generous 3-sigma band
    val clique = (1L to 12L).flatMap(i => ((i + 1) to 12L).map(i -> _)).toDF("a", "b")
    val r = GraftOps.anfSketch(clique, "a", "b", k = 4, rounds = 1).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(0) == 12.0) // hop 0 is always exact (singleton sketches)
    val est = r(1) / 12.0 // per-vertex estimate of 12
    assert(est > 12.0 / (1 + 3.0 / math.sqrt(2)) && est < 12.0 * (1 + 3.0 / math.sqrt(2)),
      s"clique estimate $est out of band")
  }

  test("anf effective diameter agrees with the curve readout at test scale") {
    val curve = Graph.graphAnf(SparkSpec.spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val total = curve(Graph.BfsRounds)
    val want = curve.filter(_._2 >= Graph.EffDiamAlpha * total).keys.min
    val row = Graph.graphAnfDiameter(SparkSpec.spark, sf).head()
    assert(row.getInt(0) == want)
    assert(row.getDouble(1) == total)
  }

  test("betweenness: K ≥ |V| reduces to exact Brandes on path and star") {
    // path 0-1-2: only the middle vertex carries shortest paths
    val path3 = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    val bc = GraftOps.betweennessSampled(path3, "a", "b", k = 10, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bc == Map(0L -> 0.0, 1L -> 1.0, 2L -> 0.0))
    // star: the hub carries every leaf pair — C(4,2) = 6
    val star = (1L to 4L).map(i => (0L, i)).toDF("a", "b")
    val sc = GraftOps.betweennessSampled(star, "a", "b", k = 10, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc(0L) == 6.0 && (1L to 4L).forall(i => sc(i) == 0.0))
  }

  test("closeness: K ≥ |V| reduces to exact closeness on a path") {
    // path 0-1-2: d-sums 3 / 2 / 3 → closeness 1.0 / 1.5 / 1.0
    val e = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    val r = GraftOps.closenessSampled(e, "a", "b", k = 10, rounds = 6)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map(0L -> ((3L, 3L, 1.0)), 1L -> ((3L, 2L, 1.5)),
      2L -> ((3L, 3L, 1.0))))
  }

  test("harmonic: K ≥ |V| reduces to exact harmonic centrality on a path") {
    // path 0-1-2 with all 3 vertices as sources: harmonic(0) = 1/1 +
    // 1/2 = 1.5 (micro-units: 1000000 + 500000), harmonic(1) = 2.0,
    // and the d=0 self rows are excluded from n_reaching
    val e = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    val r = GraftOps.harmonicOf(
        GraftOps.sourceDistancesSampled(e, "a", "b", k = 10, rounds = 6))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r == Map(0L -> ((2L, 1.5)), 1L -> ((2L, 2.0)), 2L -> ((2L, 1.5))))
  }

  test("closeness: the md5 source sample is deterministic and sized k") {
    val e = (0L to 9L).map(i => (i, i + 1)).toDF("a", "b")
    def run() = GraftOps.closenessSampled(e, "a", "b", k = 3, rounds = 12)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val r = run()
    assert(r == run(), "sampled closeness must be reproducible")
    // every vertex is reached by at most (here: exactly) the 3 sources
    // on a connected path within the round budget
    assert(r.forall(_._2 == 3L))
  }

  test("neighborhoodJaccard: cap above the max item degree is a no-op") {
    val sp = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 10L),
      (3L, 11L), (4L, 12L)).toDF("l_suppkey", "l_partkey")
    def run(cap: Int) = GraftOps.neighborhoodJaccard(
      sp, "l_partkey", "l_suppkey", topN = 100, itemCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(run(3) == run(1000), "cap ≥ max deg must not change the output")
  }
}
