package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Large-star/small-star contraction must produce labels IDENTICAL to
  * min-label propagation wherever propagation has converged — and keep
  * working on long-diameter graphs where fixed-round propagation
  * cannot. */
class CcLogNSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("identical labels to min-label propagation on the testdata graph") {
    val logn = labels(graft.operators.Graph.graphComponentsLogN(spark, sf))
    val prop = labels(graft.operators.Graph.graphComponents(spark, sf))
    assert(logn.nonEmpty && logn == prop)
  }

  test("converges on a 200-node chain (diameter far beyond any fixed round count)") {
    // propagation would need 200 rounds; contraction needs O(log 200)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val got = labels(GraftOps.connectedComponentsLogN(chain, "a", "b"))
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("multiple components + isolated pair keep distinct minima") {
    val g = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L))
      .toDF("a", "b")
    val got = labels(GraftOps.connectedComponentsLogN(g, "a", "b"))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("self-loop-only vertices keep their label (parity with propagation)") {
    val g = Seq((1L, 2L), (5L, 5L)).toDF("a", "b")
    val logn = labels(GraftOps.connectedComponentsLogN(g, "a", "b"))
    val prop = labels(GraftOps.connectedComponents(g, "a", "b", 3))
    assert(logn == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    assert(logn == prop)
  }

  test("star contraction is broadcast-independent") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val chain = (0L until 49L).map(i => (i, i + 1)).toDF("a", "b")
      val got = labels(GraftOps.connectedComponentsLogN(chain, "a", "b"))
      assert(got.size == 50 && got.values.forall(_ == 0L))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
