package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Multi-source personalized PageRank.
  *
  * Reference semantics: a4/RunPersonalizedPageRankBasic.java:284-345 —
  * α = 0.15 random-jump mass returned ONLY to the source nodes (split
  * evenly), iterate a fixed number of rounds, report ranks
  * (a4/FindMaxPageRankNodes.java). The reference runs per-iteration
  * MapReduce jobs with log-space mass; we keep linear-space doubles
  * (fine at these magnitudes) and express one iteration as a single
  * join+groupBy over a cached, pre-partitioned edge table.
  *
  * Graph: the bipartite supplier↔part network from lineitem (both
  * directions, so no dangling nodes and mass is conserved exactly:
  * Σr = 1 every round).
  *
  * Scale: edges are repartitioned by src ONCE and cached; each
  * iteration then shuffles only the (node, rank) table — the classic
  * co-partitioned PageRank layout. AQE handles skewed high-degree
  * nodes. 5 iterations = 5 shuffles of |V| rows, not |E|.
  */
object Graph {
  val Alpha = 0.15
  val Iters = 5
  val PartOffset = 1000000L
  val Sources: Seq[Long] = Seq(0L, 1L, 2L)

  // converged rank table memoized per (session, dir): topk and any other
  // consumer reuse one cached computation instead of re-iterating
  private val memo = scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** Drop memoized results (benchmarks call this so a timed pass pays
    * the real computation cost). */
  def reset(): Unit = memo.clear()

  // localCheckpoint (not cache): materializes through the normal AQE
  // execution path and truncates the 5-iteration lineage; cache() would
  // plan the whole loop without AQE's runtime re-optimization.
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate(spark.sparkContext.applicationId + ":" + dir,
      computeRanks(spark, dir).localCheckpoint())

  private def computeRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cache the deduped pair set once; both edge directions derive from
    // it as narrow maps (an explicit repartition(src) would add a full
    // shuffle that AQE's runtime planning makes unnecessary here)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey")).distinct().cache()
    val fwd = li.select(col("l_suppkey").as("src"), (col("l_partkey") + PartOffset).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d")).cache()

    val srcDf = Sources.toDF("v")
      .withColumn("jump0", lit(1.0 / Sources.length))
    // sources are nodes even when absent from the edge set — otherwise
    // their jump mass would silently vanish and Σr < 1
    val nodes = edges.select(col("src").as("v"))
      .unionAll(srcDf.select(col("v"))).distinct().cache()
    // node table with its personalized-jump share, built & cached ONCE;
    // each iteration is then a single contrib join against it
    val base = nodes.join(srcDf, Seq("v"), "left")
      .select(col("v"), coalesce(col("jump0"), lit(0.0)).as("jump0"))
      .cache()
    var ranks = base.select(col("v"), col("jump0").as("r"))
    // rank-with-degree is |V|-sized; broadcasting it turns the per-
    // iteration edge join into a map-side pass over the cached edge
    // partitions (one shuffle per iteration: the contrib groupBy).
    // NOTE at |V| beyond broadcast size, drop the hints and AQE picks a
    // shuffle join on the co-partitioned (src) layout instead.
    for (_ <- 1 to Iters) {
      val rd = ranks.join(deg, ranks("v") === deg("src"))
        .select(col("v").as("rv"), (col("r") / col("d")).as("rd"))
      val contrib = edges.join(broadcast(rd), edges("src") === col("rv"))
        .groupBy(col("dst").as("v"))
        .agg(sum(col("rd")).as("c"))
      ranks = base
        .join(broadcast(contrib), Seq("v"), "left")
        .select(col("v"),
          (lit(1 - Alpha) * coalesce(col("c"), lit(0.0)) +
           lit(Alpha) * col("jump0")).as("r"))
    }
    ranks.select(col("v"), round(col("r"), 8).as("rank")).orderBy("v")
  }

  /** Unrolled-iteration DuckDB oracle generated from the same constants. */
  private val oracle: String = {
    val srcList = Sources.mkString(", ")
    val jump = s"CASE WHEN n.v IN ($srcList) THEN $Alpha * (1.0 / ${Sources.length}) ELSE 0 END"
    val iterCtes = (1 to Iters).map { k =>
      s"""c$k AS (SELECT e.dst AS v, sum(r.r / d.d) AS c
                  FROM r${k - 1} r JOIN edges e ON r.v = e.src JOIN deg d ON r.v = d.src
                  GROUP BY 1),
          r$k AS (SELECT n.v, ${1 - Alpha} * coalesce(c.c, 0) + $jump AS r
                  FROM nodes n LEFT JOIN c$k c ON n.v = c.v)"""
    }.mkString(",\n          ")
    s"""WITH li AS (SELECT DISTINCT l_suppkey AS s, l_partkey + $PartOffset AS p FROM lineitem),
          edges AS (SELECT s AS src, p AS dst FROM li UNION ALL SELECT p, s FROM li),
          deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
          nodes AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges
                    UNION ALL SELECT * FROM (VALUES (${Sources.mkString("), (")})) s(v))),
          r0 AS (SELECT n.v, CASE WHEN n.v IN ($srcList) THEN 1.0 / ${Sources.length} ELSE 0 END AS r
                 FROM nodes n),
          $iterCtes
        SELECT v, round(r, 8) AS rank FROM r$Iters ORDER BY v"""
  }

  /** a4/FindMaxPageRankNodes.java: top-k nodes by rank. Ordering on the
    * ROUNDED rank (ties broken by node id) keeps the cutoff deterministic
    * across engines despite last-ulp float differences. */
  def pagerankTopk(spark: SparkSession, dir: String): DataFrame =
    pagerank(spark, dir)
      .orderBy(col("rank").desc, col("v"))
      .limit(20)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("pagerank", pagerank, Some(oracle)),
    QueryDef("pagerank_topk", pagerankTopk, Some(
      s"""WITH pr AS ($oracle)
          SELECT v, rank FROM pr ORDER BY rank DESC, v LIMIT 20""")),
  )
}
