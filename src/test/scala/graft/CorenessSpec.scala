package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.GraftOps
import graft.operators.Graph

/** graph_coreness (iterated H-index): hand-known coreness on a planted
  * clique+chain, fixpoint at the registered round count, and
  * cross-consistency with the fixed-k peel (coreness ≥ k ⟺ k-core
  * membership). */
class CorenessSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edgeDf(es: Seq[(Long, Long)]) = {
    val rows = es.map { case (a, b) => org.apache.spark.sql.Row(a, b) }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("s", LongType), StructField("p", LongType))))
  }

  // K5 on {0..4} with a pendant chain 4–10–11–12
  private val planted = (for (i <- 0 until 5; j <- i + 1 until 5)
    yield (i.toLong, j.toLong)) ++ Seq((4L, 10L), (10L, 11L), (11L, 12L))

  test("planted clique+chain: clique nodes coreness 4, chain nodes 1") {
    val out = GraftOps.coreness(edgeDf(planted), "s", "p", rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 4L).foreach(v => assert(out(v) == 4L, s"node $v: ${out(v)}"))
    Seq(10L, 11L, 12L).foreach(v => assert(out(v) == 1L, s"node $v: ${out(v)}"))
  }

  test("H-index iteration reaches its fixpoint within the registered rounds") {
    val und = edgeDf(planted)
    val a = GraftOps.coreness(und, "s", "p", rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraftOps.coreness(und, "s", "p", rounds = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "one more round changed coreness — not converged")
  }

  test("coreness ≥ k is exactly the k-core membership") {
    val und = edgeDf(planted)
    val cn = GraftOps.coreness(und, "s", "p", rounds = 8)
      .filter(col("c") >= 2).select("v")
      .collect().map(_.getLong(0)).toSet
    val kc = GraftOps.kCore(und, "s", "p", k = 2, rounds = 8)
      .collect().map(_.getLong(0)).toSet
    assert(cn == kc)
  }

  test("corpus coreness at the registered rounds is the fixpoint") {
    val und = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey").as("s"), (col("l_partkey") + Graph.PartOffset).as("p"))
      .distinct()
    val a = GraftOps.coreness(und, "s", "p", Graph.CorenessRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraftOps.coreness(und, "s", "p", Graph.CorenessRounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "corpus graph not converged at CorenessRounds")
  }
}
