package graft

import graft.api.GraftOps
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Incremental connected components: label-contraction over a delta
  * must reproduce the cold full-graph labels EXACTLY (labels are
  * min-ids, and min composes through contraction). */
class CcIncrementalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph: delta edge merges two base components, labels exact") {
    // base: {0-1-2} and {10-11}; delta: 2-10 merges them, 20-21 is new
    val base = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val delta = Seq((2L, 10L), (20L, 21L)).toDF("a", "b")
    val bl = GraftOps.connectedComponents(base, "a", "b", 4)
    val inc = labels(GraftOps.connectedComponentsIncremental(bl, delta, "a", "b"))
    val cold = labels(GraftOps.connectedComponents(base.unionAll(delta), "a", "b", 6))
    assert(inc == cold)
    assert(inc(11L) == 0L && inc(21L) == 20L)
  }

  test("incremental equals cold full-graph CC at test scale") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"))
    def pairs(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      f(li).select(col("l_suppkey").as("s"),
        (col("l_partkey") + Graph.PartOffset).as("p")).distinct()
    val base = pairs(_.filter(col("l_orderkey") % 10 < Graph.IncCut))
    val delta = pairs(_.filter(col("l_orderkey") % 10 >= Graph.IncCut))
    val full = pairs(identity)
    val bl = GraftOps.connectedComponents(base, "s", "p", Graph.CcIters)
    val inc = labels(GraftOps
      .connectedComponentsIncremental(bl, delta, "s", "p"))
    val cold = labels(GraftOps.connectedComponents(full, "s", "p", Graph.CcIters))
    assert(inc == cold)
    assert(inc.nonEmpty)
  }
}
