package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** r15 verdict item 2: the bench JSON now records which Louvain arm
  * dispatched (`louvain_arm`), because the r15 reading (raw 29.74 s =
  * the delta-OFF arm's clean minimum, vs 18.4 s measured delta-ON)
  * could not be attributed without knowing the arm. This spec pins the
  * two halves of that report:
  *   1. the auto-dispatch predicate FIRES on the real bench-SF
  *      (sf0.1) edge count — the L1 graph's edge mass is above
  *      LouvainDeltaAutoEdges, so a default-conf bench runs delta;
  *   2. the dispatch log records every level's (m, deltaOn) decision,
  *      below-threshold graphs record the full arm, and the explicit
  *      conf override is what the log reports.
  */
class LouvainArmSpec extends SparkSpec {

  private def corpusGraph(dir: String) =
    graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + graft.operators.Graph.PartOffset).as("p"))
      .distinct().localCheckpoint()

  test("delta arm auto-dispatches on the bench-SF (sf0.1) edge count") {
    GraftOps.clearLouvainDispatches()
    val und = corpusGraph("/root/testdata/sf0.1")
    // 1+1 rounds: the dispatch decision is made before any sweep and
    // is round-count-independent, so one round per level proves the
    // predicate on the REAL bench graph without the 8+4-round cost
    GraftOps.louvain(und, "s", "p", 1, 1)
    val ds = GraftOps.louvainDispatches
    assert(ds.nonEmpty, "louvain run recorded no dispatch")
    val (m, deltaOn) = ds.maxBy(_._1) // L1 = the big graph
    assert(m >= GraftOps.LouvainDeltaAutoEdges,
      s"bench-SF L1 edge mass $m fell below the auto threshold " +
        s"${GraftOps.LouvainDeltaAutoEdges} — the Bench no longer runs delta")
    assert(deltaOn, s"delta arm did not dispatch at m=$m")
  }

  test("below-threshold graphs record the full arm; conf override is logged") {
    val und = corpusGraph(sf)
    GraftOps.clearLouvainDispatches()
    GraftOps.louvain(und, "s", "p", 1, 1)
    val auto = GraftOps.louvainDispatches
    assert(auto.nonEmpty && auto.forall { case (m, on) =>
      on == (m >= GraftOps.LouvainDeltaAutoEdges) },
      s"auto dispatch disagreed with the predicate: $auto")
    assert(!auto.maxBy(_._1)._2, "sf0.001 L1 should stay on the full arm")

    GraftOps.clearLouvainDispatches()
    spark.conf.set("spark.graft.louvainDelta", "true")
    try GraftOps.louvain(und, "s", "p", 1, 1)
    finally spark.conf.unset("spark.graft.louvainDelta")
    val forced = GraftOps.louvainDispatches
    assert(forced.nonEmpty && forced.forall(_._2),
      s"conf override not reflected in the dispatch log: $forced")
  }
}
