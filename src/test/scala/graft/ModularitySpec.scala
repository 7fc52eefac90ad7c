package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** GraftOps.modularity: exact value on a planted two-clique graph,
  * detection through LPA labels, and the null case (one community ⇒
  * Q ≈ 0) that the registered supplier↔part query exhibits.
  */
class ModularitySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val rows = es.map { case (a, b) => org.apache.spark.sql.Row(a, b) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.LongType))))
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))

  // two K5 cliques bridged by one edge
  private val cliqueA = Seq(0L, 1L, 2L, 3L, 4L)
  private val cliqueB = Seq(10L, 11L, 12L, 13L, 14L)
  private val bridged = clique(cliqueA) ++ clique(cliqueB) :+ (4L, 10L)

  test("exact hand-computed Q on two bridged 5-cliques with known labels") {
    val und = edgeDf(bridged)
    val labels = edgeDf((cliqueA.map((_, 0L)) ++ cliqueB.map((_, 1L))))
      .select(col("s").as("v"), col("p").as("comm"))
    val out = GraftOps.modularity(und, "s", "p", labels)
      .orderBy("comm").collect()
    assert(out.length == 2)
    // m = 21, each community: L_c = 10, d_c = 21
    // q_term = 10/21 − (21/42)² = (4·21·10 − 441)/(4·441)
    val expected = BigDecimal((4.0 * 21 * 10 - 441.0) / (4.0 * 441.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 5)
      assert(r.getAs[Long]("internal_edges") == 10)
      assert(r.getAs[Long]("degree_sum") == 21)
      assert(r.getAs[Double]("q_term") == expected)
    }
    val q = out.map(_.getAs[Double]("q_term")).sum
    assert(q > 0.44 && q < 0.46)
  }

  test("LPA labels on the bridged cliques recover high modularity") {
    val und = edgeDf(bridged)
    val lbl = GraftOps.labelPropagation(und, "s", "p", rounds = 4)
    val q = GraftOps.modularity(und, "s", "p", lbl)
      .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    assert(q > 0.4, s"two planted cliques should score Q > 0.4, got $q")
  }

  test("Louvain recovers the planted bridged cliques at full modularity") {
    val und = edgeDf(bridged)
    val lbl = GraftOps.louvain(und, "s", "p", l1Rounds = 8, l2Rounds = 4)
    // exactly two communities, each one clique, canonical min-member labels
    val comms = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comms.values.toSet.size == 2, s"expected 2 communities, got $comms")
    assert(cliqueA.map(comms).toSet.size == 1 && cliqueB.map(comms).toSet.size == 1)
    val q = GraftOps.modularity(und, "s", "p", lbl)
      .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    assert(q > 0.44 && q < 0.46, s"Louvain Q $q off the hand-computed optimum")
  }

  test("Louvain recovers planted BIPARTITE blocks (communities span both sides) at Q ≥ LPA's") {
    // two complete-bipartite 5×5 blocks + one bridge — the stylized
    // corpus shape: a community is a supplier+part cluster, which a
    // purely synchronous sweep would two-color instead
    val blocks =
      (for (a <- 0L to 4L; b <- 100L to 104L) yield (a, b)) ++
        (for (a <- 10L to 14L; b <- 110L to 114L) yield (a, b)) :+ (4L -> 110L)
    val und = edgeDf(blocks)
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      GraftOps.modularity(und, "s", "p", labels)
        .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    val lbl = GraftOps.louvain(und, "s", "p", l1Rounds = 8, l2Rounds = 4)
    val comms = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comms.values.toSet == Set(0L, 10L), s"expected blocks {0, 10}, got $comms")
    assert((0L to 4L).forall(comms(_) == 0L) && (100L to 104L).forall(comms(_) == 0L))
    assert((10L to 14L).forall(comms(_) == 10L) && (110L to 114L).forall(comms(_) == 10L))
    val qLouvain = q(lbl)
    val qLpa = q(GraftOps.labelPropagation(und, "s", "p", rounds = 4))
    info(f"planted bipartite blocks: lpa Q $qLpa%.4f, louvain Q $qLouvain%.4f")
    assert(qLouvain >= qLpa && qLouvain > 0.45)
  }

  test("Louvain finds positive Q on the corpus supplier↔part graph where LPA collapses to 0") {
    val dir = "/root/testdata/sf0.01"
    val und = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + graft.operators.Graph.PartOffset).as("p"))
      .distinct()
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      GraftOps.modularity(und, "s", "p", labels)
        .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    val qLpa = q(GraftOps.labelPropagation(und, "s", "p", rounds = 4))
    val qLouvain = q(GraftOps.louvain(und, "s", "p", l1Rounds = 8, l2Rounds = 4))
    // honest calibration: this near-random bipartite graph's Louvain
    // ceiling is small — networkx louvain_communities reaches Q ≈
    // 0.046, a converged sequential local-move Q ≈ 0.029 — so any
    // solidly positive Q is structure found, where LPA's one giant
    // community scores exactly 0
    info(f"corpus Q: lpa $qLpa%.4f, louvain $qLouvain%.4f (nx ceiling ≈ 0.046)")
    assert(qLouvain > qLpa,
      s"Louvain Q $qLouvain did not beat LPA Q $qLpa on the corpus graph")
    assert(qLouvain > 0.005, s"Louvain Q $qLouvain found no structure at all")
  }

  test("Leiden refinement: every refined community is connected; Q never decreases") {
    val dir = "/root/testdata/sf0.01"
    val und = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + graft.operators.Graph.PartOffset).as("p"))
      .distinct().localCheckpoint()
    val ref = graft.operators.Graph.graphLouvainRefined(spark, dir).localCheckpoint()
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      GraftOps.modularity(und, "s", "p", labels)
        .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    val qBefore = q(ref.select(col("v"), col("comm")))
    val qAfter = q(ref.select(col("v"), col("rcomm").as("comm")))
    info(f"Q before refinement $qBefore%.4f, after $qAfter%.4f")
    assert(qAfter >= qBefore - 1e-9,
      s"splitting disconnected communities lowered Q: $qBefore -> $qAfter")
    // connectivity: within each refined community, CC over its own
    // edges must find ONE component (checked via a fresh min-label run
    // on the refined-intra subgraph at generous depth)
    val intra = und
      .join(ref.select(col("v").as("s"), col("rcomm").as("ra")), Seq("s"))
      .join(ref.select(col("v").as("p"), col("rcomm").as("rb")), Seq("p"))
      .filter(col("ra") === col("rb")).select("s", "p")
    val cc = GraftOps.connectedComponents(intra, "s", "p", 16)
    val split = ref.join(cc, Seq("v"), "left")
      .select(col("rcomm"), coalesce(col("comp"), col("v")).as("c2"))
      .groupBy("rcomm").agg(countDistinct(col("c2")).as("nc"))
      .filter(col("nc") > 1)
    assert(split.count() == 0, "a refined community is still disconnected")
  }

  test("single community scores Q ≈ 0 (the null case)") {
    val und = edgeDf(clique(cliqueA))
    val labels = edgeDf(cliqueA.map((_, 7L)))
      .select(col("s").as("v"), col("p").as("comm"))
    val out = GraftOps.modularity(und, "s", "p", labels).collect()
    assert(out.length == 1)
    // all edges internal, d_c = 2m ⇒ q = 1 − 1 = 0
    assert(math.abs(out(0).getAs[Double]("q_term")) < 1e-9)
  }
}
