package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** SemDeDup: the keep verdict must be exactly "no lower-id neighbor at
  * cos ≥ τ within my cluster" — certified against an independent
  * brute-force recomputation from the query's own assignment. */
class SemDedupSpec extends SparkSpec {

  test("cur_semdedup verdicts match a brute-force within-cluster check") {
    graft.functions.VectorExpressions.register(spark)
    val out = Similarity.curSemdedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(out.length == nVecs)
    // independent recomputation: exact cosines from the raw parquet,
    // clusters taken from the query's own (cid) output
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = out.groupBy(_._2)
    var drops = 0
    for ((_, members) <- byCluster; (id, _, isKeep) <- members) {
      val hasLowerNeighbor = members.exists { case (o, _, _) =>
        o < id && BigDecimal(cos(vecs(o), vecs(id)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP) >= Similarity.SemThreshold
      }
      assert(isKeep == !hasLowerNeighbor, s"vec $id: is_keep=$isKeep but lower-id neighbor=$hasLowerNeighbor")
      if (!isKeep) drops += 1
    }
    // the corpus has cos ≈ 0.45+ neighbors (the dedup_embedding tier
    // feeds on them) — a zero-drop run would mean the threshold never
    // fired and the test is vacuous
    assert(drops > 0, "expected at least one semantic duplicate at sf0.001")
  }
}
