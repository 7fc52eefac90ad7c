package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** k-NN graph: structural shape + measured recall of the LSH-bucketed
  * graph against the exact brute-force neighbors. */
class KnnGraphSpec extends SparkSpec {

  test("sim_knn_graph: every node ranked, recall@1 beats the random floor") {
    graft.functions.VectorExpressions.register(spark)
    val out = Similarity.simKnnGraph(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = out.map(_._1).distinct
    // per-node rnk sequences are 1..k' (k' ≤ KnnK — sparse buckets may
    // yield fewer candidates than k)
    for ((q, rs) <- out.groupBy(_._1))
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length.toLong))
    // exact top-1 per node by brute force
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact1 = vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .maxBy { case (o, ov) => (cos(v, ov), -o) }._1
    }.toMap
    val graphTop = out.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val hits = nodes.count(q => graphTop.get(q).contains(exact1(q)))
    val recall = hits.toDouble / vecs.length
    info(f"knn-graph coverage ${nodes.length}/${vecs.length}, recall@1 $recall%.2f")
    // random top-1 would hit ~1/N; require a real signal margin and
    // near-full node coverage (isolated LSH singletons are allowed)
    assert(nodes.length >= vecs.length * 9 / 10)
    assert(recall >= 0.3, s"recall@1 $recall below floor")
  }

  test("sim_nn_descent: one refinement round improves (or preserves) recall@1") {
    graft.functions.VectorExpressions.register(spark)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact1 = vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .maxBy { case (o, ov) => (cos(v, ov), -o) }._1
    }.toMap
    def recall1(rows: Array[(Long, Long, Long)]): Double = {
      val top = rows.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
      vecs.count { case (id, _) => top.get(id).contains(exact1(id)) }.toDouble / vecs.length
    }
    val base = Similarity.simKnnGraph(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nd = Similarity.simNnDescent(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (rb, rn) = (recall1(base), recall1(nd))
    info(f"recall@1 lsh-graph $rb%.2f -> nn-descent $rn%.2f")
    assert(rn >= rb, s"nn-descent recall $rn fell below the LSH graph's $rb")
    // the refined graph must keep (at least) the same node coverage
    assert(nd.map(_._1).distinct.length >= base.map(_._1).distinct.length)
  }
}
