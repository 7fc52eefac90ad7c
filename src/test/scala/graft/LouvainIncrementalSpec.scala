package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** The incremental Louvain claim: two warm parity sweeps from the base
  * labels retain (or beat) the modularity a cold 8+4-round full run
  * reaches on the updated graph — delta ingest without re-optimizing
  * from singletons. */
class LouvainIncrementalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("warm restart retains the cold run's Q at a sixth of the rounds") {
    val full = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + graft.operators.Graph.PartOffset).as("p"))
      .distinct().localCheckpoint()
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      GraftOps.modularity(full, "s", "p", labels)
        .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    val qWarm = q(graft.operators.Graph.graphLouvainIncremental(spark, dir)
      .select(col("v"), col("comm")))
    val qCold = q(GraftOps.louvain(full, "s", "p",
      graft.operators.Graph.LouvainL1Rounds, graft.operators.Graph.LouvainL2Rounds))
    info(f"full-graph Q: cold 12-round $qCold%.4f vs warm 2-round $qWarm%.4f")
    assert(qWarm > 0, s"warm path found no structure: $qWarm")
    assert(qWarm >= qCold - 0.01,
      s"warm Q $qWarm fell more than 0.01 below cold Q $qCold")
  }

  test("warm restart is a no-op when there is no delta (stability)") {
    val und = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + graft.operators.Graph.PartOffset).as("p"))
      .distinct().localCheckpoint()
    val base = GraftOps.louvain(und, "s", "p", 8, 4).localCheckpoint()
    val warm = GraftOps.louvainWarm(und, "s", "p", base, rounds = 2)
    def q(l: org.apache.spark.sql.DataFrame): Double =
      GraftOps.modularity(und, "s", "p", l)
        .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    val (qb, qw) = (q(base), q(warm))
    info(f"no-delta: base Q $qb%.4f, after warm sweeps $qw%.4f")
    // warm sweeps on an unchanged graph must not damage the solution
    assert(qw >= qb - 1e-6, s"warm sweeps degraded a settled solution: $qb -> $qw")
  }
}
