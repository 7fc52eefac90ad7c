package graft

import org.apache.spark.sql.types._
import graft.api.GraftOps

/** graph_clustering_coeff: hand-computed coefficients on a triangle
  * with a pendant, and consistency with the exact triangle count. */
class ClusteringCoeffSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val rows = es.map { case (a, b) => org.apache.spark.sql.Row(a, b) }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("a", LongType), StructField("b", LongType))))
  }

  test("triangle with pendant: hand-computed coefficients") {
    // triangle {0,1,2} plus pendant edge 2–3
    val out = GraftOps.clusteringCoeff(
        edgeDf(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))), "a", "b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) == ((2L, 1L, 1.0)))
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((3L, 1L, 0.333333)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("per-node triangle credits sum to 3x the exact count") {
    val und = graft.sources.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
        org.apache.spark.sql.functions.col("l_partkey").as("pk"))
      .distinct()
    val edges = und.as("x").join(und.as("y"),
        org.apache.spark.sql.functions.expr("x.ok = y.ok AND x.pk < y.pk"))
      .select(org.apache.spark.sql.functions.col("x.pk").as("a"),
        org.apache.spark.sql.functions.col("y.pk").as("b"))
      .distinct()
    val perNodeSum = GraftOps.clusteringCoeff(edges, "a", "b")
      .agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .collect()(0).getLong(0)
    val exact = GraftOps.triangleCount(edges, "a", "b")
      .collect()(0).getLong(0)
    assert(perNodeSum == 3 * exact,
      s"corner credits $perNodeSum != 3 x $exact triangles")
  }
}
