package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization ANN: quality bounds the oracle can't express
  * (the oracle proves both engines compute the SAME answer; these prove
  * the answer is a GOOD one). */
class PqSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rnk"), r.getAs[Long]("neighbor")))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(_._3).toSeq
      }

  /** Exact L2 top-k by the same surrogate score (2·q·x − x·x). */
  private def exactL2(dir: String): Map[Long, Seq[Long]] = {
    graft.functions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val q = e.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("2 * dot_product(qv, v) - dot_product(v, v)").as("score"))
    topk(graft.api.GraftOps
      .topKPerGroupAgg(scored, "qid", "score", "vec_id", Similarity.TopK)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor")))
  }

  test("PQ degenerates to the exact answer when the shortlist covers the corpus") {
    // shortlist ≥ |corpus|: the ADC stage can drop nothing, so the
    // exact re-rank must return the true top-k
    val n = graft.sources.Tables.embeddings(spark, sf).count().toInt
    assert(topk(Similarity.annPq(spark, sf, shortlistK = n + 1)) == exactL2(sf))
  }

  test("PQ shortlist recall@5 clears the floor at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    val pq = topk(Similarity.annPq(spark, dir))
    val recall = exact.map { case (q, ids) =>
      ids.toSet.intersect(pq.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    // measured 0.58 (K=16, R=50, N=500); floor leaves variance margin
    assert(recall >= 0.4, s"recall@5 $recall below 0.4")
  }

  test("PQ is deterministic across runs") {
    assert(topk(Similarity.annPq(spark, sf)) == topk(Similarity.annPq(spark, sf)))
  }

  test("IVF-PQ residual shortlist recall@5 clears the floor at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    val ivfpq = topk(Similarity.annIvfPq(spark, dir))
    val recall = exact.map { case (q, ids) =>
      ids.toSet.intersect(ivfpq.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    // NProbe=2 of 4 cells caps attainable recall; the residual codes
    // must still find a solid share of the true neighbors
    assert(recall >= 0.4, s"IVF-PQ recall@5 $recall below 0.4")
  }

  test("IVF-PQ is deterministic across runs") {
    assert(topk(Similarity.annIvfPq(spark, sf)) == topk(Similarity.annIvfPq(spark, sf)))
  }

  test("permuted-dimension PQ: exact when the shortlist covers the corpus; deterministic; recall floor") {
    // permutation leaves true distances unchanged, so the degenerate
    // full-shortlist case must still return the exact top-k
    val n = graft.sources.Tables.embeddings(spark, sf).count().toInt
    assert(topk(Similarity.annPqPerm(spark, sf, shortlistK = n + 1)) == exactL2(sf))
    assert(topk(Similarity.annPqPerm(spark, sf)) == topk(Similarity.annPqPerm(spark, sf)))
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    val pq = topk(Similarity.annPqPerm(spark, dir))
    val recall = exact.map { case (q, ids) =>
      ids.toSet.intersect(pq.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.4, s"permuted-PQ recall@5 $recall below 0.4")
  }

  test("Newton-Schulz polar sweep matches the LAPACK SVD polar factor") {
    // the value-oracle iteration (polarNS) must land on the same
    // Procrustes optimum LAPACK finds — a DIFFERENT algorithm agreeing
    // to 1e-6, so oracle-greenness isn't self-referential. Trial 3
    // scales entries by 0.01 to exercise the normalize-then-iterate
    // path on small magnitudes.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val d = 64
      val scale = if (trial == 3) 0.01 else 10.0
      val m = Array.tabulate(d, d)((_, _) => (rnd.nextDouble() - 0.5) * scale)
      val ns = Similarity.polarNS(m)
      // column-major constructor holds Mᵀ; svd(Mᵀ) = UΣVᵀ ⇒ polar(M) = V·Uᵀ
      val bm = new breeze.linalg.DenseMatrix(d, d, m.flatten)
      val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(bm)
      val pol = vt.t * u.t
      var maxdiff = 0.0
      for (i <- 0 until d; j <- 0 until d)
        maxdiff = math.max(maxdiff, math.abs(ns(i)(j) - pol(i, j)))
      assert(maxdiff < 1e-6, s"trial $trial: NS vs SVD polar factor diff $maxdiff")
    }
  }

  test("OPQ: learned rotation is orthogonal; deterministic; degenerates to exact; recall ≥ plain PQ") {
    // orthogonality: RᵀR = I (the polar factor is orthogonal by
    // construction — this guards the NS convergence + grid plumbing)
    val r = Similarity.learnOpqRotation(spark, sf)
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"R'R[$i][$j] = $dot not ${if (i == j) 1 else 0}")
    }
    // streaming-fold training (no rotated-corpus checkpoint): two
    // independent learns must reproduce the rotation bit-for-bit — the
    // recompute-instead-of-materialize plan changes nothing numerically
    val r2 = Similarity.learnOpqRotation(spark, sf)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(r(i)(j) - r2(i)(j)) <= 1e-9,
        s"rotation not reproducible at [$i][$j]: ${r(i)(j)} vs ${r2(i)(j)}")
    // rotation preserves dot products ⇒ full-shortlist OPQ = exact
    val n = graft.sources.Tables.embeddings(spark, sf).count().toInt
    assert(topk(Similarity.annOpq(spark, sf, shortlistK = n + 1)) == exactL2(sf))
    assert(topk(Similarity.annOpq(spark, sf)) == topk(Similarity.annOpq(spark, sf)))
    // the learned rotation must not LOSE recall vs unrotated PQ — the
    // entire point of spending the alternation
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    def recall(m: Map[Long, Seq[Long]]): Double = exact.map { case (q, ids) =>
      ids.toSet.intersect(m.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    val plain = recall(topk(Similarity.annPq(spark, dir)))
    val opq = recall(topk(Similarity.annOpq(spark, dir)))
    assert(opq >= plain, s"OPQ recall $opq below plain-PQ recall $plain")
    assert(opq >= 0.4, s"OPQ recall $opq below the 0.4 floor")
  }

  test("SQ8: degenerates to exact with a full shortlist; deterministic; near-lossless recall") {
    val n = graft.sources.Tables.embeddings(spark, sf).count().toInt
    assert(topk(Similarity.annSq8(spark, sf, shortlistK = n + 1)) == exactL2(sf))
    assert(topk(Similarity.annSq8(spark, sf)) == topk(Similarity.annSq8(spark, sf)))
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    val sq = topk(Similarity.annSq8(spark, dir))
    val recall = exact.map { case (q, ids) =>
      ids.toSet.intersect(sq.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    // 8 bits per dimension is near-lossless for top-k ordering: the
    // quantization error per dim is Δ/510, far under typical inter-
    // neighbor score gaps — SQ8 should dominate every PQ tier's recall
    info(f"sq8 recall@5 = $recall%.4f")
    assert(recall >= 0.9, s"SQ8 recall@5 $recall below 0.9 — quantizer is broken, not lossy")
  }

  test("rotation+IVF composition: recall measured against plain IVF-PQ at equal probe budget") {
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    def recall(m: Map[Long, Seq[Long]]): Double = exact.map { case (q, ids) =>
      ids.toSet.intersect(m.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    val plain = recall(topk(Similarity.annIvfPq(spark, dir)))
    val rotated = recall(topk(Similarity.annOpqIvf(spark, dir)))
    info(f"ivfpq recall@5 = $plain%.4f, opq+ivfpq recall@5 = $rotated%.4f (NProbe equal)")
    // the rotated space must at minimum stay usable; whether the delta
    // justifies a registered operator is recorded in SURVEY.md
    assert(rotated >= 0.4, s"opq+ivf recall $rotated below the 0.4 floor")
  }

  test("per-cell residual codebooks recall ≥ shared-codebook recall at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val exact = exactL2(dir)
    def recall(r: Map[Long, Seq[Long]]): Double = exact.map { case (q, ids) =>
      ids.toSet.intersect(r.getOrElse(q, Seq()).toSet).size.toDouble / ids.size
    }.sum / exact.size
    val shared = recall(topk(Similarity.annIvfPq(spark, dir)))
    val perCell = recall(topk(Similarity.annIvfPqPerCell(spark, dir)))
    // local codebooks fit each cell's residual geometry — the whole
    // point of the per-cell refinement is that this inequality holds
    assert(perCell >= shared,
      s"per-cell recall $perCell below shared-codebook recall $shared")
    assert(perCell >= 0.4, s"per-cell recall $perCell below the 0.4 floor")
  }
}
