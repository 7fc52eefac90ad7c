package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

/** ml_silhouette: near-1 on well-separated planted clusters with their
  * true centroids; well-formed bounded scores on the corpus run. */
class SilhouetteSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("v", ArrayType(DoubleType))))
  private val centSchema = StructType(Seq(
    StructField("cid", LongType), StructField("cv", ArrayType(DoubleType))))

  test("planted orthogonal clusters with true centroids score near 1") {
    graft.functions.VectorExpressions.register(spark)
    // 30 points in 3 tight clusters along axes 0/1/2 of 4-dim space
    val pts = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(4)(0.01 * ((i * 3) % 4))
      base(c) += 5.0
      org.apache.spark.sql.Row(i.toLong, base.toSeq)
    }
    val cents = (0 until 3).map { c =>
      val cv = Array.fill(4)(0.0); cv(c) = 1.0
      org.apache.spark.sql.Row(c.toLong, cv.toSeq)
    }
    val out = Similarity.silhouetteOn(
        spark.createDataFrame(pts.asJava, vecSchema),
        spark.createDataFrame(cents.asJava, centSchema))
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") == 10)
      assert(r.getAs[Double]("silhouette") > 0.9,
        s"cluster ${r.getAs[Long]("cid")}: ${r.getAs[Double]("silhouette")}")
    }
  }

  test("corpus silhouette: bounded scores, all clusters populated") {
    val out = Similarity.mlSilhouette(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getAs[Double]("silhouette")
      assert(s >= -1.0 && s <= 1.0)
      assert(r.getAs[Long]("n_members") > 0)
    }
  }
}
