package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Deterministic random walks: structural invariants (value parity vs
  * the unrolled DuckDB oracle is the Verify gate). */
class WalksSpec extends SparkSpec {

  test("graph_walks: one full-length walk per node, every hop a real edge") {
    val out = Graph.graphWalks(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = Graph.persistedSymEdges(spark, sf)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.map(_._1)
    // the symmetric graph has no dangling node, so no walk ever dies:
    // every node owns exactly WalkLen+1 rows, steps 0..WalkLen
    val byWalk = out.groupBy(_._1)
    assert(byWalk.size == nodes.size)
    for ((wid, rows) <- byWalk) {
      val path = rows.sortBy(_._2)
      assert(path.map(_._2).toSeq == (0L to Graph.WalkLen.toLong))
      assert(path.head._3 == wid) // walks start at their own node
      for (Array((_, _, a), (_, _, b)) <- path.sliding(2))
        assert(edges.contains((a, b)), s"walk $wid hop $a->$b is not an edge")
    }
    // determinism: the md5 pick rule makes reruns bit-identical
    val again = Graph.graphWalks(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }
}
