package graft

import org.apache.spark.sql.functions._

/** The one-text-both-engines recursive BFS oracle (r12, q59's
  * recursiveReachSql discipline applied to graph_bfs): the SAME SQL
  * string DuckDB replays as the oracle must, when Spark executes it,
  * reproduce the hand-written delta-iteration loop row for row. That
  * closes the dialect-drift gap the unrolled d0..d8 generator left
  * open — there is now exactly one statement of the BFS recursion. */
class RecursiveOracleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("Spark executing the recursive bfsOracle text matches the BFS loop row for row") {
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(graft.operators.Graph.bfsOracle)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val viaLoop = graft.operators.Graph.graphBfs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(viaSql == viaLoop,
      s"recursive-CTE text diverged from the loop: sql ${viaSql.size} rows, loop ${viaLoop.size}")
    assert(viaSql.nonEmpty)
    // every seed that exists in the graph is at distance 0, and no
    // distance exceeds the round cap
    assert(viaSql.forall(_._2 <= graft.operators.Graph.BfsRounds))
  }

  test("q59 recursion guard is derived from the data, not a constant") {
    import graft.operators.{Graph, ScaleOps}
    // the formula: linear in |orders| (so it scales to any SF) with the
    // stock 1M floor (so tiny inputs keep Spark's default protection)
    assert(ScaleOps.q59RecursionGuard(100) == 1000000L)
    assert(ScaleOps.q59RecursionGuard(15000) == 1000000L)
    assert(ScaleOps.q59RecursionGuard(1500000) == 1500000L * Graph.SccChainLen)
    assert(ScaleOps.q59RecursionGuard(150000000L) == 150000000L * Graph.SccChainLen)
    // the guard still PROTECTS: the provable output ceiling of the
    // acyclic chain recursion (|orders|·(SccChainLen−1)/2) stays under
    // the configured bound with slack, so legit growth never trips it,
    // while a runaway (superlinear in input) does
    val n = 1500000L
    val provableCeiling = n * (Graph.SccChainLen - 1) / 2
    assert(provableCeiling < ScaleOps.q59RecursionGuard(n))
    // and the guard is o(N²): at no realistic size does it approach the
    // row count an unbounded self-join runaway would produce
    assert(ScaleOps.q59RecursionGuard(n) < n * n / 1000)
  }
}
