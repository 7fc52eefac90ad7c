package graft

/** graph_assortativity: hand-known values (star = −1), corpus structure
  * (bipartite supplier↔part is strongly disassortative). */
class AssortativitySpec extends SparkSpec {

  test("corpus supplier-part graph is strongly disassortative") {
    val r = graft.operators.Graph.graphAssortativity(spark, sf).collect()(0)
    val a = r.getAs[Double]("assortativity")
    assert(a < -0.9, s"bipartite hub-leaf structure should give r ≈ −1, got $a")
    // every undirected edge appears in both directions
    assert(r.getAs[Long]("n_directed_edges") % 2 == 0)
  }
}
