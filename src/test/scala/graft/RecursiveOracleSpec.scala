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
}
