package graft

import graft.api.GraftOps

/** Cost-based CC dispatch: the depth probe must route a long chain to
  * star contraction and a dense low-diameter graph to propagation, and
  * the dispatched labels must equal BOTH cores' labels either way. */
class CcAutoSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 200-node chain: diameter 199 — a 6-round seed BFS cannot exhaust it
  private def chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")

  // hub-and-spoke + a second small clique: diameter 2 per component
  private def dense = ((1L to 50L).map(i => (0L, i)) ++
    Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("a", "b")

  test("probe classifies a long chain as deep and a hub graph as shallow") {
    assert(!GraftOps.ccProbeShallow(chain, "a", "b"))
    assert(GraftOps.ccProbeShallow(dense, "a", "b"))
  }

  test("deep route: auto labels on the chain equal the logN core's") {
    val auto = labels(GraftOps.connectedComponentsAuto(chain, "a", "b"))
    val logn = labels(GraftOps.connectedComponentsLogN(chain, "a", "b"))
    assert(auto.size == 200 && auto.values.forall(_ == 0L))
    assert(auto == logn)
  }

  test("shallow route: auto labels on the hub graph equal both cores'") {
    val auto = labels(GraftOps.connectedComponentsAuto(dense, "a", "b"))
    val logn = labels(GraftOps.connectedComponentsLogN(dense, "a", "b"))
    val prop = labels(GraftOps.connectedComponents(dense, "a", "b", iters = 4))
    assert(auto.size == 54)
    assert(auto.filter(_._1 >= 100L).values.forall(_ == 100L))
    assert(auto.filter(_._1 < 100L).values.forall(_ == 0L))
    assert(auto == logn && auto == prop)
  }
}
