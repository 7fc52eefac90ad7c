package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables

/** Density-based clustering (DBSCAN, Ester et al. KDD'96) over the
  * embedding corpus, with cosine similarity as the neighborhood
  * relation — the unsupervised sibling of ml_kmeans that needs no k
  * and labels sparse points as noise (exactly what a curation
  * pipeline wants: dense semantic clusters = topical cores, noise =
  * long-tail singletons).
  *
  * At-scale shape: the ε-neighborhood graph comes from the SAME
  * sign-bit LSH candidate generation as dedup_embedding (shuffle ∝
  * tables×N, never N²) — this operator is DBSCAN on the LSH candidate
  * graph, the standard distributed form (exact ε-graph DBSCAN is
  * inherently all-pairs); the oracle replays the identical
  * hyperplanes so the approximation itself is verified. Core-point
  * detection is one degree aggregate; cluster formation is connected
  * components over the CORE-core subgraph only (a small fraction of
  * candidates); border points attach via one min-aggregate join.
  * Every stage is |pairs|- or |V|-sized — nothing quadratic, nothing
  * driver-side.
  */
object Dbscan {
  /** Cosine-similarity neighborhood threshold (≥ DbEps ⇒ neighbors),
    * and the core-point bar: ≥ DbMinNb NEIGHBORS (the classic minPts
    * counts the point itself; minPts = DbMinNb + 1). */
  val DbEps = 0.35
  val DbMinNb = 3
  /** Label-propagation rounds for the core-subgraph CC — plain
    * min-label propagation moves labels 1 hop per round, so DbCcIters
    * rounds cover components of diameter ≤ DbCcIters (the fixed-round
    * discipline the other CC users document); candidate clusters here
    * are tiny chains well inside that bound. */
  val DbCcIters = 8
  /** Candidate budget for the corpus-adaptive bit count (r13, the
    * dedup_embedding lever applied after the sf1 soak measured
    * the fixed-bit config at 48x-of-linear): bits =
    * max(EmbLsh.Bits, ⌈log₂N⌉ − 8) holds per-table candidate volume
    * ≈ 256·N as the corpus grows instead of N²/2^bits. budget 8 (the
    * recall-first setting) because ε = 0.35 sits low on the s-curve —
    * per-plane agreement ≈ 0.61, so narrow buckets cost real recall;
    * both test SFs stay on 4 bits (results unchanged), sf1 takes 7. */
  val DbBudgetLog2 = 8

  def mlDbscan(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.embeddings(spark, dir)
    val bits = graft.functions.EmbLsh.suggestedBits(df.count(), DbBudgetLog2)
    val pairs = graft.api.GraftOps.embeddingNearDupPairs(
        df, "vec_id", "embedding", DbEps,
        graft.functions.EmbLsh.Tables, bits, graft.functions.EmbLsh.Dims,
        hotThreshold = graft.functions.EmbLsh.SaltHotBucket,
        salt = graft.functions.EmbLsh.SaltWays)
      .select("a", "b")
      .memoized() // feeds sym (twice), the core filter, and CC
    val sym = pairs.select(col("a").as("v"), col("b").as("nb"))
      .unionAll(pairs.select(col("b").as("v"), col("a").as("nb")))
    val deg = sym.groupBy("v").agg(count(lit(1)).as("nnb"))
    val core = deg.filter(col("nnb") >= DbMinNb).select(col("v")).memoized()
    // CC on the core-core subgraph only: noise/border never enter the
    // iteration, so the fixpoint runs on the dense kernel of the data
    val coreEdges = pairs
      .join(core.select(col("v").as("a")), "a", "left_semi")
      .join(core.select(col("v").as("b")), "b", "left_semi")
    val cc = graft.api.GraftOps.connectedComponents(coreEdges, "a", "b", DbCcIters)
    val coreLabel = core
      .join(cc, Seq("v"), "left")
      .select(col("v"), coalesce(col("comp"), col("v")).as("cluster"))
      .memoized() // consumed by core output AND the border join
    // border points: non-core with ≥1 core neighbor adopt the MIN
    // neighboring cluster id (deterministic tie-break)
    val border = sym
      .join(core.withColumnRenamed("v", "__c"), col("v") === col("__c"), "left_anti")
      .join(coreLabel.select(col("v").as("nb"), col("cluster")), "nb")
      .groupBy("v").agg(min(col("cluster")).as("cluster"))
    Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(coreLabel.select(col("v").as("vec_id"), col("cluster").as("c1"),
        lit(true).as("k1")), Seq("vec_id"), "left")
      .join(border.select(col("v").as("vec_id"), col("cluster").as("c2")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("c1"), col("c2"), lit(-1L)).as("cluster"),
        coalesce(col("k1"), lit(false)).as("is_core"))
      .orderBy("vec_id")
  }

  /** DuckDB replay: inlined LSH hyperplanes (the dedup_embedding
    * oracle's discipline) → candidate pairs → degrees → core set →
    * unrolled min-label CC on the core subgraph → border adoption. */
  private lazy val oracle: String = {
    import graft.functions.EmbLsh
    // dynamic-plane arm (the dedup_embedding oracle technique):
    // the bit count derives from the corpus size IN SQL and the
    // md5-derived hyperplanes regenerate for whatever it yields, so
    // this one text stays exact at every SF
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          bb AS (SELECT greatest(${EmbLsh.Bits},
                   length(bin((count(*) - 1)::BIGINT)) - $DbBudgetLog2) AS bits FROM e),
          planes AS MATERIALIZED (
            SELECT t.t, j.j,
                   list(CASE WHEN ('0x' || substr(md5('plane_' || t.t::VARCHAR || '_' ||
                          j.j::VARCHAR || '_' || d.d::VARCHAR), 1, 8))::BIGINT % 2 = 1
                        THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY d.d) AS w
            FROM range(${EmbLsh.Tables}) t(t),
                 (SELECT j FROM range(64) r(j), bb WHERE j < bits) j,
                 range(${EmbLsh.Dims}) d(d)
            GROUP BY 1, 2),
          proj AS (SELECT e.vec_id, p.t,
                          CASE WHEN list_dot_product(e.v, p.w) > 0 THEN 1 << p.j ELSE 0 END AS bit
                   FROM e, planes p),
          buck AS (SELECT vec_id, t, sum(bit) AS bv FROM proj GROUP BY 1, 2),
          cp AS (SELECT DISTINCT ba.vec_id AS a, bb.vec_id AS b
                 FROM buck ba JOIN buck bb ON ba.t = bb.t AND ba.bv = bb.bv
                 WHERE ba.vec_id < bb.vec_id),
          pairs AS MATERIALIZED (
            SELECT p.a, p.b
            FROM cp p JOIN e ea ON p.a = ea.vec_id JOIN e eb ON p.b = eb.vec_id
            WHERE round(list_dot_product(ea.v, eb.v) /
                    (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)
                  >= $DbEps),
          sym AS MATERIALIZED (SELECT a AS v, b AS nb FROM pairs
                 UNION ALL SELECT b, a FROM pairs),
          core AS MATERIALIZED (SELECT v FROM (SELECT v, count(*) AS nnb FROM sym GROUP BY 1)
                 WHERE nnb >= $DbMinNb),
          edges AS MATERIALIZED (
            SELECT p.a AS src, p.b AS dst FROM pairs p
            WHERE p.a IN (SELECT v FROM core) AND p.b IN (SELECT v FROM core)
            UNION ALL
            SELECT p.b, p.a FROM pairs p
            WHERE p.a IN (SELECT v FROM core) AND p.b IN (SELECT v FROM core)),
          l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS comp FROM edges),
          ${Graph.ccUnrolledCtes(DbCcIters)}
          , clab AS MATERIALIZED (
            SELECT c.v, coalesce(l.comp, c.v) AS cluster
            FROM core c LEFT JOIN l$DbCcIters l ON c.v = l.v),
          border AS (
            SELECT s.v, min(cl.cluster) AS cluster
            FROM sym s JOIN clab cl ON s.nb = cl.v
            WHERE s.v NOT IN (SELECT v FROM core)
            GROUP BY 1)
        SELECT emb.vec_id,
               coalesce(cl.cluster, bo.cluster, -1) AS cluster,
               cl.v IS NOT NULL AS is_core
        FROM e emb
        LEFT JOIN clab cl ON emb.vec_id = cl.v
        LEFT JOIN border bo ON emb.vec_id = bo.v
        ORDER BY emb.vec_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ml_dbscan", mlDbscan, Some(oracle)),
  )
}
