package graft

import org.apache.spark.sql.types._
import graft.operators.{Graph, TextProfile}

/** graph_butterflies (hand-computed K2,2 cases) + text_zipf_fit
  * (well-formed measurement on the corpus). */
class BipartiteSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def liDf(es: Seq[(Long, Long)]) = {
    val rows = es.map { case (s, p) => org.apache.spark.sql.Row(s, p) }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("s", LongType), StructField("p", LongType))))
  }

  test("K2,2 is exactly one butterfly with clustering 1.0") {
    val r = Graph.butterfliesOn(liDf(Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))).collect()(0)
    assert(r.getAs[Long]("n_butterflies") == 1L)
    assert(r.getAs[Long]("n_caterpillars") == 4L)
    assert(r.getAs[Double]("bf_clustering") == 1.0)
  }

  test("a pendant edge adds caterpillars but no butterflies") {
    val r = Graph.butterfliesOn(liDf(Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L)))).collect()(0)
    assert(r.getAs[Long]("n_butterflies") == 1L)
    // edge (3,10): (1-1)(3-1)=0; edges at p=10 gain from dP=3:
    // (1,10):(2-1)(3-1)=2, (2,10):2, (1,11):(2-1)(2-1)=1, (2,11):1 → 6
    assert(r.getAs[Long]("n_caterpillars") == 6L)
    assert(r.getAs[Double]("bf_clustering") < 1.0)
  }

  test("zipf fit: vocabulary-sized n, non-positive slope, bounded r2") {
    val r = TextProfile.zipfFit(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") > 0)
    assert(r.getAs[Double]("slope") <= 0.0, "rank-frequency slope must not be positive")
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }
}
