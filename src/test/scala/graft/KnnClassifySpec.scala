package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** ml_knn_classify: the corpus labels are geometry-free (accuracy ≈
  * chance there — documented at the operator), so the classifier is
  * proven on PLANTED clusters: three orthogonal-axis clusters with a
  * deterministic perturbation must classify near-perfectly, and the
  * majority vote must be deterministic under re-computation.
  */
class KnnClassifySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // 60 points, 3 clusters along axes 0/1/2 of a 4-dim space; the
  // perturbation is a fixed per-id ramp so the dataset is reproducible
  private def planted() = {
    val rows = (0 until 60).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0.05 * ((i * 7) % 5))
      base(c) += 10.0
      org.apache.spark.sql.Row(i.toLong, base.toSeq, c)
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType)),
      StructField("label", IntegerType))))
  }

  test("planted clusters classify near-perfectly") {
    graft.functions.VectorExpressions.register(spark)
    val out = Similarity.knnClassifyOn(planted()).collect()
    // test split = vec_id % 10 == 0 → 6 queries
    assert(out.length == 6)
    val acc = out.count(_.getAs[Boolean]("correct")).toDouble / out.length
    assert(acc == 1.0, s"expected perfect accuracy on planted clusters, got $acc")
  }

  test("prediction is deterministic across re-computation") {
    graft.functions.VectorExpressions.register(spark)
    val a = Similarity.knnClassifyOn(planted()).collect().map(_.toString)
    val b = Similarity.knnClassifyOn(planted()).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("corpus run emits one verdict per held-out vector") {
    val out = Similarity.mlKnnClassify(spark, sf).collect()
    val expected = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % Similarity.KnnTestMod === 0).count()
    assert(out.length == expected)
    assert(out.forall(r => r.getAs[Int]("pred_label") >= 0))
  }
}
