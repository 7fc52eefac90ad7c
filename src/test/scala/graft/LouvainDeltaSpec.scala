package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** The r12 delta-iteration claim: louvainLevel's per-parity
  * candidate-weight snapshots folded forward from the move sets are
  * EXACTLY the tables the full per-round |E| join would build, so the
  * opt-in delta path (spark.graft.louvainDelta=true) and the default
  * full-sweep path produce identical labels — bit-for-bit, not just
  * equal-Q. This is what keeps the unrolled SQL oracle valid for
  * either path without mirroring the frontier logic in SQL. */
class LouvainDeltaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def corpusGraph() =
    graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + graft.operators.Graph.PartOffset).as("p"))
      .distinct().localCheckpoint()

  private def labelsWith(delta: Boolean, und: org.apache.spark.sql.DataFrame,
                         l1: Int, l2: Int): Seq[(Long, Long)] = {
    spark.conf.set("spark.graft.louvainDelta", delta.toString)
    try GraftOps.louvain(und, "s", "p", l1, l2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    finally spark.conf.unset("spark.graft.louvainDelta")
  }

  test("delta-maintained sweeps equal the full sweeps label for label (corpus graph)") {
    val und = corpusGraph()
    val full = labelsWith(delta = false, und,
      graft.operators.Graph.LouvainL1Rounds, graft.operators.Graph.LouvainL2Rounds)
    val fast = labelsWith(delta = true, und,
      graft.operators.Graph.LouvainL1Rounds, graft.operators.Graph.LouvainL2Rounds)
    assert(fast == full,
      s"delta path diverged: ${fast.diff(full).take(5)} vs ${full.diff(fast).take(5)}")
    assert(full.nonEmpty)
  }

  test("delta path also matches on a planted two-clique graph at odd round counts") {
    import scala.jdk.CollectionConverters._
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val es = clique(Seq(0L, 1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L, 14L)) :+ (4L, 10L)
    val und = spark.createDataFrame(
      es.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.LongType))))
    // 5 rounds: odd count exercises the snapshot hand-off where the
    // last round reuses a twice-updated table and skips truncation
    val full = labelsWith(delta = false, und, 5, 3)
    val fast = labelsWith(delta = true, und, 5, 3)
    assert(fast == full)
    assert(full.map(_._2).distinct.size == 2, "expected the two planted cliques")
  }
}
