package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** GraftOps.modularity: exact value on a planted two-clique graph,
  * detection through LPA labels, and the null case (one community ⇒
  * Q ≈ 0) that the registered supplier↔part query exhibits.
  */
class ModularitySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val rows = es.map { case (a, b) => org.apache.spark.sql.Row(a, b) }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.LongType))))
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))

  // two K5 cliques bridged by one edge
  private val cliqueA = Seq(0L, 1L, 2L, 3L, 4L)
  private val cliqueB = Seq(10L, 11L, 12L, 13L, 14L)
  private val bridged = clique(cliqueA) ++ clique(cliqueB) :+ (4L, 10L)

  test("exact hand-computed Q on two bridged 5-cliques with known labels") {
    val und = edgeDf(bridged)
    val labels = edgeDf((cliqueA.map((_, 0L)) ++ cliqueB.map((_, 1L))))
      .select(col("s").as("v"), col("p").as("comm"))
    val out = GraftOps.modularity(und, "s", "p", labels)
      .orderBy("comm").collect()
    assert(out.length == 2)
    // m = 21, each community: L_c = 10, d_c = 21
    // q_term = 10/21 − (21/42)² = (4·21·10 − 441)/(4·441)
    val expected = BigDecimal((4.0 * 21 * 10 - 441.0) / (4.0 * 441.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 5)
      assert(r.getAs[Long]("internal_edges") == 10)
      assert(r.getAs[Long]("degree_sum") == 21)
      assert(r.getAs[Double]("q_term") == expected)
    }
    val q = out.map(_.getAs[Double]("q_term")).sum
    assert(q > 0.44 && q < 0.46)
  }

  test("LPA labels on the bridged cliques recover high modularity") {
    val und = edgeDf(bridged)
    val lbl = GraftOps.labelPropagation(und, "s", "p", rounds = 4)
    val q = GraftOps.modularity(und, "s", "p", lbl)
      .agg(sum(col("q_term"))).collect()(0).getDouble(0)
    assert(q > 0.4, s"two planted cliques should score Q > 0.4, got $q")
  }

  test("single community scores Q ≈ 0 (the null case)") {
    val und = edgeDf(clique(cliqueA))
    val labels = edgeDf(cliqueA.map((_, 7L)))
      .select(col("s").as("v"), col("p").as("comm"))
    val out = GraftOps.modularity(und, "s", "p", labels).collect()
    assert(out.length == 1)
    // all edges internal, d_c = 2m ⇒ q = 1 − 1 = 0
    assert(math.abs(out(0).getAs[Double]("q_term")) < 1e-9)
  }
}
