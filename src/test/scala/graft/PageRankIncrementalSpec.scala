package graft

import graft.api.GraftOps
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Warm-start (incremental) PageRank: the exact-equality property that
  * pins the refactored core, and the convergence property that makes
  * the incremental path worth running. */
class PageRankIncrementalSpec extends SparkSpec {

  private def edges = graft.sources.Tables.lineitem(spark, sf)
    .select(col("l_suppkey").as("src"),
      (col("l_partkey") + Graph.PartOffset).as("dst"))
    .distinct()

  private def ranksMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("warm start with no delta IS continued iteration (exact)") {
    // iterate 3 cold rounds, then 2 warm rounds from those ranks on the
    // SAME graph — must equal 5 cold rounds bit-for-bit (same float ops
    // in the same order; only the initial table differs by identity)
    val e = edges.localCheckpoint()
    val cold5 = ranksMap(GraftOps
      .personalizedPageRank(e, "src", "dst", Graph.Sources, Graph.Alpha, 5))
    val r3 = GraftOps
      .personalizedPageRank(e, "src", "dst", Graph.Sources, Graph.Alpha, 3)
    val warm = ranksMap(GraftOps
      .personalizedPageRankFrom(e, "src", "dst", Graph.Sources, r3, Graph.Alpha, 2))
    assert(warm == cold5)
  }

  test("warm rounds after a delta move ranks TOWARD the new fixpoint") {
    val full = edges.localCheckpoint()
    val base = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 < Graph.IncCut)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") + Graph.PartOffset).as("dst"))
      .distinct().localCheckpoint()
    // "converged" reference: many cold rounds on the full graph
    val ref = ranksMap(GraftOps
      .personalizedPageRank(full, "src", "dst", Graph.Sources, Graph.Alpha, 12))
    val baseRanks = GraftOps
      .personalizedPageRank(base, "src", "dst", Graph.Sources, Graph.Alpha, Graph.Iters)
    val before = ranksMap(GraftOps
      .personalizedPageRankFrom(full, "src", "dst", Graph.Sources, baseRanks,
        Graph.Alpha, 0)) // 0 warm rounds = base ranks mapped onto full nodes
    val after = ranksMap(GraftOps
      .personalizedPageRankFrom(full, "src", "dst", Graph.Sources, baseRanks,
        Graph.Alpha, Graph.IncIters))
    def l1(a: Map[Long, Double]): Double =
      ref.map { case (v, r) => math.abs(r - a.getOrElse(v, 0.0)) }.sum
    assert(l1(after) < l1(before),
      s"warm rounds did not improve: ${l1(after)} vs ${l1(before)}")
    // PageRank's power iteration contracts L1 distance to the fixpoint
    // by ≤ (1−α) per round — two warm rounds must show ~(0.85)² ≈ 0.72
    // (slack for ref itself being a 12-round approximation, and for the
    // 0-round base carrying dangling-mass differences)
    assert(l1(after) < 0.8 * l1(before) + 0.01,
      s"contraction too weak: ${l1(after)} vs ${l1(before)}")
  }
}
