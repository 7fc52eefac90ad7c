package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Certifies graph_mst against an INDEPENDENT driver-side Kruskal
  * (union-find over edges sorted by the same (w, a, b) total order) —
  * a different algorithm reaching the same unique MSF, so agreement is
  * real evidence, not replay. */
class MstSpec extends SparkSpec {

  private def canonicalEdges: Seq[(Long, Long, Long)] =
    Graph.weightedPairCosts(spark, sf)
      .filter(col("src") < col("dst")) // suppliers < PartOffset ≤ parts
      .select("src", "dst", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val mst = scala.collection.mutable.Set[(Long, Long, Long)]()
    edges.sortBy { case (a, b, w) => (w, a, b) }.foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; mst += ((a, b, w)) }
    }
    mst.toSet
  }

  test("graph_mst equals the unique Kruskal MSF under the (w,a,b) order") {
    val edges = canonicalEdges
    val expected = kruskal(edges)
    val got = Graph.graphMst(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")),
        r.getLong(r.fieldIndex("w")))).toSet
    assert(got == expected,
      s"MSF mismatch: ${got.size} picked vs ${expected.size} expected; " +
        s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  test("MSF size identity: |edges| = |V| - #components") {
    val edges = canonicalEdges
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // component count via the same union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val nComps = vs.map(find).distinct.size
    val n = Graph.graphMst(spark, sf).count()
    assert(n == vs.size - nComps, s"$n MSF edges for ${vs.size} vertices, $nComps components")
  }
}
