package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables
import graft.functions.HashingScheme._

/** Deduplication for large-scale training-data pipelines.
  *
  * Four tiers, in increasing scale-tolerance:
  *  - exact: content-hash groupBy (one shuffle on the hash).
  *  - n-gram Jaccard: exact set similarity over 3-gram shingles —
  *    quadratic in docs-per-shared-shingle; the ground truth the
  *    approximate tiers are judged against.
  *  - MinHash + LSH: 16 permutations, 4 bands × 4 rows; candidate
  *    generation joins on (band, band-signature) so shuffle volume is
  *    bands×docs, never docs² — the 100 TB path.
  *  - SimHash: 32-bit weighted-vote fingerprint + banded Hamming join
  *    (4 bytes; Hamming ≤ 3 ⇒ at least one byte equal, so the band
  *    join is exact, not heuristic).
  *
  * All hashes derive from md5 (see TextFns.hash32 / HashingScheme) so
  * every tier is reproducible in the DuckDB oracle with identical bits.
  */
object Dedup {
  val JaccardThreshold = 0.5
  val HammingMax = 3

  /** 3-gram shingle relation over any docs relation (doc_id, text). */
  def shingleSqlFrom(rel: String): String =
    s"""SELECT DISTINCT doc_id, u.sh AS sh
       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $rel),
            unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    for i in generate_series(1, len(toks) - 2)]) AS u(sh)"""
  private val shingleSql = shingleSqlFrom("documents")

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** Exact dedup: group identical content, keep the smallest doc_id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.dedupExact(docs(spark, dir), "doc_id", "text")
      .orderBy("keep_id")

  /** Exact 3-gram-shingle Jaccard near-dup pairs (≥ threshold). */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.ngramJaccardPairs(docs(spark, dir), "doc_id", "text",
        n = 3, threshold = JaccardThreshold)
      .orderBy("a", "b")

  /** Asymmetric containment pairs (GraftOps.containmentPairs): directed
    * (a contained-in b) where |S_a∩S_b|/|S_a| ≥ ContainmentThreshold —
    * catches small-doc-inside-big-doc that symmetric Jaccard misses. */
  val ContainmentThreshold = 0.8
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.containmentPairs(docs(spark, dir), "doc_id", "text",
        n = 3, threshold = ContainmentThreshold)
      .orderBy("a", "b")

  /** Persisted MinHash layout — the LSH analog of Graph's persisted
    * src-bucketed edge layout (PartitionGraph re-expressed): two managed
    * tables written ONCE per (session, dir) and shared by the whole
    * minhash family (dedup_minhash / _salted / dedup_cluster), then by
    * any later session over the same corpus:
    *  - graft_mh_sigs_b*: (doc_id, mh0..mh15) bucketed+sorted on doc_id
    *    — the corpus is shingled and hashed exactly once; the pair-score
    *    join reads the signature side without an Exchange;
    *  - graft_mh_cand_b*: (doc_id, bj, bv) bucketed+sorted on (bj, bv)
    *    — the band self-join reads BOTH sides from the bucketed scan's
    *    reported hash partitioning, so candidate enumeration starts
    *    shuffle-free, and the salted variant's bucket-count pass rides
    *    the same layout.
    * At 100 TB this is the production shape: signatures are ids + 16
    * ints and candidates ids + a band hash — both ∝ |docs|, never
    * corpus bytes — and the layout outlives the session, so incremental
    * re-dedup never re-shingles the corpus. Values are unchanged (the
    * stored relations are bit-identical to the in-plan ones), so all
    * three consumers keep their existing oracle. */
  private val layoutMemo =
    scala.collection.concurrent.TrieMap[String, (String, String)]()
  def persistedMinhashLayout(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (st, ct) = layoutMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + ":" + dir, {
        val k = ScaleOps.dirKey(dir)
        val (sigsT, candT) = (s"graft_mh_sigs_b$k", s"graft_mh_cand_b$k")
        ScaleOps.dropStale(spark, sigsT); ScaleOps.dropStale(spark, candT)
        Tables.writeBucketed(
          graft.api.GraftOps.minhashSignatures(docs(spark, dir), "doc_id", "text"),
          sigsT, Seq("doc_id"), ScaleOps.NBuckets)
        Tables.writeBucketed(
          graft.api.GraftOps.bandCandidates(spark.table(sigsT), "doc_id"),
          candT, Seq("bj", "bv"), ScaleOps.NBuckets)
        (sigsT, candT)
      })
    (spark.table(st), spark.table(ct))
  }

  /** MinHash + LSH candidate pairs with estimated Jaccard, over the
    * persisted signature/band layout. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val (sigs, cand) = persistedMinhashLayout(spark, dir)
    graft.api.GraftOps.minhashCandidatesFrom(sigs, cand, "doc_id")
      .orderBy("a", "b")
  }

  /** The skew-safe salted band join (GraftOps.minhashCandidatesSalted):
    * band buckets over SaltHotThreshold rows spread their pair
    * enumeration across SaltWays reducers. The candidate set is
    * IDENTICAL to dedup_minhash by construction, so this registration
    * verifies through the SAME unsalted oracle — and the threshold is
    * deliberately tiny (production default: 10000) so the salted path
    * actually executes, not just plans, at the test SFs. */
  val SaltHotThreshold = 2L
  val SaltWays = 4
  /** Production-scale salting knobs for the always-registered simhash
    * tier: only buckets/families past 100k rows pay the spread. */
  val SaltHotThresholdProd = 100000L
  val SaltWaysProd = 8
  def dedupMinhashSalted(spark: SparkSession, dir: String): DataFrame = {
    val (sigs, cand) = persistedMinhashLayout(spark, dir)
    graft.api.GraftOps.minhashCandidatesFrom(sigs, cand, "doc_id",
        hotThreshold = SaltHotThreshold, salt = SaltWays)
      .orderBy("a", "b")
  }

  /** INCREMENTAL minhash dedup — the persisted layout's reason to
    * exist: a delta batch (hash-selected tenth of the corpus, standing
    * in for newly-arrived docs) is shingled and signed IN-PLAN, while
    * the base corpus is read from the persisted signature/band tables
    * with a filter — the base is never re-shingled. Candidates =
    * delta×base band collisions ∪ delta×delta, scored against the
    * union of persisted base signatures and fresh delta signatures.
    * Result ≡ dedup_minhash's pairs restricted to pairs touching the
    * delta (signatures are per-doc, so membership can't change values)
    * — the oracle IS that restriction of the full replay, making the
    * equivalence the verified property, the pagerank_incremental
    * discipline. At 100 TB: delta cost ∝ |delta| corpus bytes + a
    * band join against the layout; zero base re-hash. */
  val DeltaMod = 10L
  def dedupMinhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (sigsP, candP) = persistedMinhashLayout(spark, dir)
    def isDelta(c: org.apache.spark.sql.Column) =
      graft.functions.TextFns.hash32(c.cast("string")) % DeltaMod === 0L
    val deltaSigs = graft.api.GraftOps
      .minhashSignatures(docs(spark, dir).filter(isDelta(col("doc_id"))), "doc_id", "text")
      .memoized() // consumed twice: band expansion + scoring
    val deltaCand = graft.api.GraftOps.bandCandidates(deltaSigs, "doc_id")
    val baseCand = candP.filter(!isDelta(col("doc_id")))
    val db = deltaCand.select(col("doc_id").as("x"), col("bj"), col("bv"))
      .join(baseCand.select(col("doc_id").as("y"), col("bj"), col("bv")), Seq("bj", "bv"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
    val dd = deltaCand.select(col("doc_id").as("a"), col("bj"), col("bv"))
      .join(deltaCand.select(col("doc_id").as("b"), col("bj"), col("bv")), Seq("bj", "bv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    val pairs = db.unionAll(dd).distinct()
    val sigs = sigsP.filter(!isDelta(col("doc_id"))).unionAll(deltaSigs)
    graft.api.GraftOps.scoreCandidatePairs(sigs, pairs, "doc_id")
      .orderBy("a", "b")
  }

  private val minhashIncrementalOracle: String = {
    val matchSum = (0 until NumHashes)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    def deltaSql(c: String) =
      s"('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 8))::BIGINT % $DeltaMod = 0"
    s"""WITH ${minhashPairCtesFrom("documents")}
        SELECT p.a AS a, p.b AS b, round(($matchSum) / CAST($NumHashes AS DOUBLE), 6) AS est_jaccard
        FROM pairs p JOIN sigs sa ON p.a = sa.doc_id JOIN sigs sb ON p.b = sb.doc_id
        WHERE ${deltaSql("p.a")} OR ${deltaSql("p.b")}
        ORDER BY a, b"""
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed — THE registered
    * production path: candidates collide in ≥1 of EmbTables sign-bit
    * buckets, exact cosine only within buckets — shuffle ∝ tables×docs,
    * never docs². Bits are chosen from the corpus size at plan time
    * (EmbLsh.suggestedBits with the near-dup candidate budget
    * AutoBudgetLog2 = 6: bits = max(4, ⌈log₂N⌉ − 6)) — §5's "raise
    * bits with log N" knob exercised end-to-end, holding per-table
    * candidate volume ≈ 64·N as the corpus grows. The count() is a
    * one-time plan-construction decision (the ccProbeShallow pattern),
    * not a per-row collect. The oracle derives the SAME bit count from
    * length(bin(n−1)) and regenerates the md5 hyperplanes dynamically
    * for whatever bits that yields, so one static SQL text stays exact
    * at EVERY SF — and the two test SFs actually take DIFFERENT arms:
    * sf0.01 (N=500) → 4 bits (identical to the fixed tier's config),
    * sf0.1 (N=2000) → 5 bits (the dynamic-plane branch). Registered as
    * `dedup_embedding` since r14: the sf1 soak measured the fixed-bit
    * sibling at 42× this tier's cost on the same corpus (occupancy ∝ N
    * ⇒ within-bucket join ∝ N²), so the adaptive rule owns the
    * production name and the fixed config lives on as
    * `dedup_embedding_fixed`, the recorded contrast. */
  val EmbThreshold = 0.45
  // single source of truth (functions.EmbLsh): the GraftOps defaults,
  // the implicit syntax, and the oracle's inlined planes all follow it
  val EmbTables: Int = graft.functions.EmbLsh.Tables
  val EmbBits: Int = graft.functions.EmbLsh.Bits
  val EmbDims: Int = graft.functions.EmbLsh.Dims
  val AutoBudgetLog2 = 6
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.embeddings(spark, dir)
    val bits = graft.functions.EmbLsh.suggestedBits(df.count(), AutoBudgetLog2)
    graft.api.GraftOps.embeddingNearDupPairs(df, "vec_id", "embedding",
        EmbThreshold, EmbTables, bits, EmbDims,
        hotThreshold = graft.functions.EmbLsh.SaltHotBucket,
        salt = graft.functions.EmbLsh.SaltWays)
      .orderBy("a", "b")
  }

  /** Fixed-bit contrast tier: 16 tables × 4 bits REGARDLESS of corpus
    * size — the configuration the sf1 soak measured at 179.5 s vs 3.6 s
    * for the adaptive rule on the same corpus (SOAK_r13.md item 1);
    * constant bucket count ⇒ per-bucket occupancy ∝ N ⇒ candidate
    * join ∝ N².
    *
    * r15: the registered query now runs on a FIXED-SIZE input — the
    * first [[FixedTierCap]] vectors by vec_id (a TakeOrderedAndProject,
    * linear in the scan) — so the known-quadratic plan stops charging
    * its N² to every sweep/soak/bench past sf0.1 (it alone burned
    * 174 s = 14.5% of the r14 sf1 bench). At sf0.01/sf0.1 the corpus
    * (500/2000 vectors) sits under the cap, so the capped query equals
    * the uncapped one and the oracle values are unchanged; past the
    * cap the input is a fixed 2048-vector prefix and the cost is a
    * constant. The cap is LOGGED whenever it binds. The UNCAPPED
    * fixed-bit contrast stays measurable spec-side
    * (EmbeddingDedupSpec / AbConf) via GraftOps.embeddingNearDupPairs
    * with explicit bits — the 42×/109× lesson lives there now. */
  val FixedTierCap = 2048L
  def dedupEmbeddingFixed(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(spark, dir)
    val n = all.count() // parquet-metadata count, plan-time only
    if (n > FixedTierCap)
      println(s"[graft] dedup_embedding_fixed: corpus $n vectors > cap " +
        s"$FixedTierCap — contrast tier runs on the first $FixedTierCap by vec_id")
    graft.api.GraftOps.embeddingNearDupPairs(
        all.orderBy("vec_id").limit(FixedTierCap.toInt),
        "vec_id", "embedding", EmbThreshold, EmbTables, EmbBits, EmbDims)
      .orderBy("a", "b")
  }

  /** Brute-force ground truth: ALL (a < b) pairs at/above the threshold
    * via an O(N²) cross join. Oracle-exact at test SFs and the recall
    * baseline for the bucketed path (EmbeddingDedupSpec) — not the
    * at-scale entry. */
  def dedupEmbeddingExact(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    e.select(col("vec_id").as("a"), col("v").as("va"))
      .join(e.select(col("vec_id").as("b"), col("v").as("vb")), col("a") < col("b"))
      .withColumn("cos", round(expr("cosine_sim(va, vb)"), 6))
      .filter(col("cos") >= EmbThreshold)
      .select("a", "b", "cos")
      .orderBy("a", "b")
  }

  /** DuckDB mirror of the LSH bucket assignment: the md5-derived ±1
    * hyperplanes (graft.functions.LshBucket.planes) inlined as literal
    * DOUBLE[] rows, one per (table, plane). */
  private lazy val embLshOracle: String = {
    val planeRows = (0 until EmbTables).flatMap { t =>
      val ps = graft.functions.LshBucket.planes(EmbBits, EmbDims, t)
      (0 until EmbBits).map { j =>
        s"($t, $j, [${ps(j).map(w => if (w > 0) "1.0" else "-1.0").mkString(",")}]::DOUBLE[])"
      }
    }.mkString(",\n            ")
    s"""WITH planes(t, j, w) AS (VALUES
            $planeRows),
          e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v
               FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $FixedTierCap)),
          proj AS (SELECT e.vec_id, p.t,
                          CASE WHEN list_dot_product(e.v, p.w) > 0 THEN 1 << p.j ELSE 0 END AS bit
                   FROM e, planes p),
          buck AS (SELECT vec_id, t, sum(bit) AS bv FROM proj GROUP BY 1, 2),
          pairs AS (SELECT DISTINCT ba.vec_id AS a, bb.vec_id AS b
                    FROM buck ba JOIN buck bb ON ba.t = bb.t AND ba.bv = bb.bv
                    WHERE ba.vec_id < bb.vec_id),
          scored AS (SELECT p.a, p.b,
                            round(list_dot_product(ea.v, eb.v) /
                              (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos
                     FROM pairs p JOIN e ea ON p.a = ea.vec_id JOIN e eb ON p.b = eb.vec_id)
        SELECT a, b, cos FROM scored WHERE cos >= $EmbThreshold ORDER BY a, b"""
  }

  /** End-to-end near-dup resolution: MinHash+LSH candidate pairs →
    * connected components → one keeper per cluster (the min doc_id).
    * This is THE production dedup step — pairs alone don't dedup; a
    * doc chained A≈B≈C must collapse to one cluster even when A,C never
    * pair directly. Singletons keep themselves.
    * Scale: the pair graph is far smaller than the corpus (only near-
    * dups appear), so the CC rounds run on a tiny edge set; the final
    * assignment is one left join on doc_id. */
  val ClusterIters = 6
  def dedupCluster(spark: SparkSession, dir: String): DataFrame = {
    val (sigs, cand) = persistedMinhashLayout(spark, dir)
    val pairs = graft.api.GraftOps
      .minhashCandidatesFrom(sigs, cand, "doc_id")
      .select(col("a"), col("b"))
    val cc = graft.api.GraftOps.connectedComponents(pairs, "a", "b", ClusterIters)
    docs(spark, dir).select(col("doc_id"))
      .join(cc, col("doc_id") === cc("v"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster"))
      .withColumn("is_keep", col("doc_id") === col("cluster"))
      .orderBy("doc_id")
  }

  private val clusterOracle: String =
    s"""WITH $minhashPairCtes,
          edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b, a FROM pairs),
          l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS comp FROM edges),
          ${Graph.ccUnrolledCtes(ClusterIters)}
        SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS cluster,
               (d.doc_id = coalesce(l.comp, d.doc_id)) AS is_keep
        FROM documents d LEFT JOIN l$ClusterIters l ON d.doc_id = l.v
        ORDER BY d.doc_id"""

  /** Per-source duplication report — the readout a corpus owner reads
    * BEFORE setting mixing rates: for each source, how many docs
    * collapse into someone else's cluster (duplicate rate) and how
    * many of those keepers live in a DIFFERENT source (cross-source
    * leakage — the signal that two feeds crawl the same sites).
    * Composes the production cluster chain ([[dedupCluster]]'s
    * persisted-minhash → CC → keeper assignment) with one narrow
    * doc_id→source join and a keeper-source lookup; everything after
    * the (tiny) pair graph is |docs|-row narrow joins. */
  def dedupSourceReport(spark: SparkSession, dir: String): DataFrame = {
    val assign = dedupCluster(spark, dir)
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
    val keeperSrc = assign.filter(col("is_keep"))
      .select(col("cluster"), col("source").as("keeper_source"))
    assign.join(keeperSrc, "cluster")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("is_keep"), 1L).otherwise(0L)).as("n_dups"),
        sum(when(!col("is_keep") && col("keeper_source") =!= col("source"), 1L)
          .otherwise(0L)).as("n_cross_source"))
      .select(col("source"), col("n_docs"), col("n_dups"),
        round(col("n_dups").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        col("n_cross_source"))
      .orderBy("source")
  }

  private val sourceReportOracle: String =
    s"""WITH $minhashPairCtes,
          edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b, a FROM pairs),
          l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS comp FROM edges),
          ${Graph.ccUnrolledCtes(ClusterIters)},
          asg AS (SELECT d.doc_id, d.source,
                         coalesce(l.comp, d.doc_id) AS cluster,
                         (d.doc_id = coalesce(l.comp, d.doc_id)) AS is_keep
                  FROM documents d LEFT JOIN l$ClusterIters l ON d.doc_id = l.v),
          ks AS (SELECT a.cluster, a.source AS keeper_source FROM asg a WHERE a.is_keep)
        SELECT a.source, count(*)::BIGINT AS n_docs,
               sum(CASE WHEN NOT a.is_keep THEN 1 ELSE 0 END)::BIGINT AS n_dups,
               round(sum(CASE WHEN NOT a.is_keep THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
               sum(CASE WHEN NOT a.is_keep AND k.keeper_source <> a.source
                        THEN 1 ELSE 0 END)::BIGINT AS n_cross_source
        FROM asg a JOIN ks k ON a.cluster = k.cluster
        GROUP BY 1 ORDER BY a.source"""

  /** Winnowing common-substring candidate pairs (GraftOps.winnowPairs):
    * docs sharing ≥ WinnowMinShared selected k-gram fingerprints under a
    * w-window winnowing scheme — detects literal copied runs of
    * ≥ w+k−1 = 7 tokens that set-based Jaccard dilutes away on long
    * docs. Hot fingerprints (> WinnowMaxDf docs) dropped pre-join. */
  val WinnowK = 4
  val WinnowW = 4
  val WinnowMinShared = 2L
  val WinnowMaxDf = 100L
  def dedupSubstringWinnow(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.winnowPairs(docs(spark, dir), "doc_id", "text",
        k = WinnowK, w = WinnowW, minShared = WinnowMinShared, maxDf = WinnowMaxDf)
      .orderBy("a", "b")

  /** DuckDB mirror of the winnowing selection: same md5-derived shingle
    * hashes, same (hash·2²⁰ + pos) packed tie-break, window minima via
    * a ROWS frame, identical df cap and shared-count threshold. */
  private val winnowOracle: String = {
    val C = 1L << 20
    val shingle = (0 until WinnowK).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                      WHERE len(string_split(text, ' ')) < $C),
          sh AS (SELECT doc_id, i AS pos,
                        ('0x' || substr(md5($shingle), 1, 8))::BIGINT * $C + i AS key
                 FROM toks, unnest(generate_series(1, greatest(len(t) - ${WinnowK - 1}, 0))) AS u(i)),
          wm AS (SELECT doc_id, pos,
                        min(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS m,
                        count(*) OVER (PARTITION BY doc_id) AS nsh
                 FROM sh),
          fps AS MATERIALIZED (SELECT DISTINCT doc_id, m // $C AS fp
                 FROM wm WHERE pos <= nsh - ${WinnowW - 1}),
          rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= $WinnowMaxDf),
          kept AS MATERIALIZED (SELECT f.doc_id, f.fp FROM fps f JOIN rare r USING (fp)),
          pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
                    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
        SELECT a, b, n_shared FROM pairs WHERE n_shared >= $WinnowMinShared
        ORDER BY a, b"""
  }

  /** SimHash banded Hamming near-dup pairs. The finite hotThreshold
    * arms the salt-slotted enumerator for BOTH the band buckets and
    * the identical-signature family expansion (r15): a mega dup
    * family at 100 TB spreads its pair enumeration across SaltWaysProd
    * reducers instead of one; at bench SFs no family crosses the
    * threshold, so every row takes slot 0 (the plain join) and the
    * pair set — and oracle — are unchanged. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.simhashCandidates(docs(spark, dir), "doc_id", "text",
        maxHamming = HammingMax,
        hotThreshold = SaltHotThresholdProd, salt = SaltWaysProd)
      .orderBy("a", "b")

  // ---- generated DuckDB oracles (same constants via HashingScheme) ----

  /** Shared CTE chain ending in `pairs` (a < b candidate pairs) —
    * reused by the pair oracle and the cluster oracle. sigs/pairs are
    * MATERIALIZED: both are referenced more than once downstream. */
  /** CTE chain ending in `pairs` (a < b candidate pairs) over any docs
    * relation — reused by the pair oracle, the cluster oracle, and the
    * composed pipeline oracle. sigs/pairs are MATERIALIZED: both are
    * referenced more than once downstream. */
  def minhashPairCtesFrom(rel: String): String = {
    val mins = (0 until NumHashes)
      .map(i => s"${minhashSql("h", i)} AS mh$i").mkString(",\n                 ")
    val bandSelects = (0 until Bands).map { j =>
      val parts = (0 until RowsPerBand).map(r => s"mh${j * RowsPerBand + r}").mkString(", ")
      s"SELECT doc_id, $j AS bj, concat_ws('_', $parts) AS bv FROM sigs"
    }.mkString("\n                 UNION ALL ")
    s"""sh AS (${shingleSqlFrom(rel)}),
          hashed AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
          sigs AS MATERIALIZED (SELECT doc_id,
                 $mins
                 FROM hashed GROUP BY doc_id),
          cand AS ($bandSelects),
          pairs AS MATERIALIZED (SELECT DISTINCT ca.doc_id AS a, cb.doc_id AS b
                    FROM cand ca JOIN cand cb ON ca.bj = cb.bj AND ca.bv = cb.bv
                    WHERE ca.doc_id < cb.doc_id)"""
  }
  // lazy: referenced by clusterOracle, which is declared earlier in the
  // object body (a strict val here would still be null at that point)
  private lazy val minhashPairCtes: String = minhashPairCtesFrom("documents")

  /** Recall of the minhash-LSH candidate generation vs the EXACT
    * n-gram-Jaccard pairs, per jaccard band — the banding s-curve as a
    * VALUE-VERIFIED operator (the sim_recall_report discipline brought
    * to the dedup tier): the number a corpus pipeline monitors to know
    * what its near-dup pass is missing, not just a spec assertion
    * (LshSweepSpec measures the same curve in-test). Both sides are
    * the registered operators' own plans; the oracle recomputes both
    * from one shared shingle relation and intersects. Band b covers
    * jaccard [b/10, (b+1)/10) (0.9+ capped into band 9); band −1 is
    * the corpus total. */
  /** r16 (verdict item 4): the EXACT arm runs on a fixed-budget logged
    * document sample — the [[FixedTierCap]] discipline applied to the
    * last registered uncapped quadratic. The shingle-sharing self-join
    * measured exactly quadratic at scale (Σ df² candidates 113M →
    * 1.02B, sf1 → sf3, SOAK_r15.md §1) and kept the entry out of
    * decade soaks; on the fixed sample its cost is a constant.
    *
    * r17 (advice): the sample is a SYSTEMATIC HASH sample, not a
    * doc_id prefix — docs whose md5(doc_id) (first 8 hex digits as a
    * BIGINT, the engine-portable hash idiom simhash/winnowing already
    * use) is ≡ 0 mod ceil(n/cap). A prefix sample is biased whenever
    * duplicate structure correlates with insertion order (generated
    * corpora append dup copies late — the prefix saw only originals);
    * the hash scrambles family offsets, and the identical predicate
    * replays in DuckDB, so the sampled oracle mirrors the plan at ANY
    * corpus size (mod = 1 ⇒ no-op below the cap — same rows as the
    * unsampled query, oracle values unchanged at sf0.001/0.01/0.1).
    * MEASURED on the sampled relation only: recall is over exact
    * pairs with BOTH endpoints in the sample (pairs with one endpoint
    * outside are invisible to the exact arm by construction — an
    * unbiased estimator of the corpus band recall, since the
    * candidate arm stays the FULL-corpus production minhash plan and
    * per-doc band signatures make "candidate within the sample"
    * identical under either corpus). The cap is LOGGED whenever it
    * binds. */
  val RecallSampleCap = 8192L
  /** Engine-portable doc_id hash-sample predicate: Spark side. The
    * DuckDB mirror lives inline in [[dedupRecallOracle]]. */
  private def hashSampleExpr(mod: Long) =
    expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)") % mod === 0L
  def recallExactSample(spark: SparkSession, dir: String): DataFrame = {
    val allDocs = docs(spark, dir)
    val n = allDocs.count() // parquet-metadata count, plan-time only
    if (n <= RecallSampleCap) allDocs
    else {
      val mod = (n + RecallSampleCap - 1) / RecallSampleCap
      println(s"[graft] dedup_recall_report: corpus $n docs > cap " +
        s"$RecallSampleCap — exact arm measured on the md5(doc_id) % $mod == 0 sample")
      allDocs.filter(hashSampleExpr(mod))
    }
  }
  def dedupRecallReport(spark: SparkSession, dir: String): DataFrame = {
    val exact = graft.api.GraftOps.ngramJaccardPairs(
        recallExactSample(spark, dir), "doc_id", "text",
        n = 3, threshold = JaccardThreshold)
      .select(col("a"), col("b"), col("jaccard"))
      .memoized()
    val cand = dedupMinhash(spark, dir).select(col("a"), col("b"))
    val marked = exact.join(cand.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
      .select(least(floor(col("jaccard") * 10), lit(9L)).cast("long").as("band"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .memoized() // feeds the per-band rows AND the total
    val per = marked.groupBy("band")
      .agg(count(lit(1)).as("n_exact"), sum(col("hit")).as("n_hit"))
    val tot = marked.agg(count(lit(1)).as("n_exact"), sum(col("hit")).as("n_hit"))
      .select(lit(-1L).as("band"), col("n_exact"), col("n_hit"))
    per.unionAll(tot)
      .withColumn("recall", round(col("n_hit") / col("n_exact"), 6))
      .orderBy("band")
  }

  // sdoc/ssh mirror the Spark plan's RecallSampleCap hash sample: the
  // identical md5(doc_id) % ceil(n/cap) == 0 predicate (mod computed
  // from the corpus count IN SQL, so it is 1 — a no-op — at/below the
  // cap, i.e. at every correctness SF, and the same systematic hash
  // sample above it). `pairs` (the candidate arm) stays full-corpus,
  // exactly like the registered plan.
  private lazy val dedupRecallOracle: String =
    s"""WITH $minhashPairCtes,
          smod AS (SELECT CAST(ceil(count(*) / $RecallSampleCap.0) AS BIGINT) AS md
                   FROM documents),
          sdoc AS (SELECT d.* FROM documents d, smod m
                   WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                         % m.md = 0),
          ssh AS (${shingleSqlFrom("sdoc")}),
          sizes AS (SELECT doc_id, count(*) AS sz FROM ssh GROUP BY 1),
          inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                    FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
          exact AS MATERIALIZED (
            SELECT i.a, i.b, round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
            FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
            WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 6) >= $JaccardThreshold),
          mk AS MATERIALIZED (
            SELECT least(CAST(floor(e.jaccard * 10) AS BIGINT), 9) AS band,
                   CASE WHEN p.a IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM exact e LEFT JOIN pairs p ON e.a = p.a AND e.b = p.b),
          per AS (SELECT band, count(*) AS n_exact, sum(hit) AS n_hit FROM mk GROUP BY 1),
          allr AS (SELECT band, n_exact, n_hit FROM per
                   UNION ALL SELECT -1, count(*), sum(hit) FROM mk)
        SELECT band, n_exact::BIGINT AS n_exact, n_hit::BIGINT AS n_hit,
               round(n_hit / CAST(n_exact AS DOUBLE), 6) AS recall
        FROM allr ORDER BY band"""

  private val minhashOracle: String = {
    val matchSum = (0 until NumHashes)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $minhashPairCtes
        SELECT p.a AS a, p.b AS b, round(($matchSum) / CAST($NumHashes AS DOUBLE), 6) AS est_jaccard
        FROM pairs p JOIN sigs sa ON p.a = sa.doc_id JOIN sigs sb ON p.b = sb.doc_id
        ORDER BY a, b"""
  }

  private val simhashOracle: String = {
    val votes = (0 until SimHashBits)
      .map(j => s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN tf ELSE -tf END) AS v$j")
      .mkString(",\n                 ")
    val sigExpr = (0 until SimHashBits)
      .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val bandSelects = (0 until 4).map(j =>
      s"SELECT doc_id, sig, $j AS bj, (sig // ${1L << (8 * j)}) % 256 AS bv FROM sigs")
      .mkString("\n                 UNION ALL ")
    s"""WITH tf AS (SELECT doc_id, t, count(*) AS tf, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h
                    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
                    WHERE t <> '' GROUP BY doc_id, t),
          v AS (SELECT doc_id,
                 $votes
                 FROM tf GROUP BY doc_id),
          sigs AS (SELECT doc_id, CAST($sigExpr AS BIGINT) AS sig FROM v),
          bands AS ($bandSelects),
          pairs AS (SELECT DISTINCT ca.doc_id AS a, ca.sig AS siga, cb.doc_id AS b, cb.sig AS sigb
                    FROM bands ca JOIN bands cb ON ca.bj = cb.bj AND ca.bv = cb.bv
                    WHERE ca.doc_id < cb.doc_id)
        SELECT a, b, CAST(bit_count(xor(siga, sigb)) AS BIGINT) AS hamming
        FROM pairs WHERE bit_count(xor(siga, sigb)) <= $HammingMax
        ORDER BY a, b"""
  }

  /** Dynamic-bits mirror of embLshOracle: instead of inlining plane
    * literals for a FIXED bit count, the SQL derives bits from the
    * corpus size (length(bin(n−1)) − AutoBudgetLog2, floored at 4 —
    * exactly EmbLsh.suggestedBits' integer ceil-log2) and regenerates
    * the md5-derived ±1 hyperplanes for that count, so the same text
    * verifies every SF. Plane component (t, j, d) =
    * sign(md5("plane_t_j_d")[:4] mod 2) on both engines. */
  private lazy val embLshAutoOracle: String =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          bb AS (SELECT greatest(4, length(bin((count(*) - 1)::BIGINT)) - $AutoBudgetLog2) AS bits FROM e),
          planes AS MATERIALIZED (
            SELECT t.t, j.j,
                   list(CASE WHEN ('0x' || substr(md5('plane_' || t.t::VARCHAR || '_' ||
                          j.j::VARCHAR || '_' || d.d::VARCHAR), 1, 8))::BIGINT % 2 = 1
                        THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY d.d) AS w
            FROM range($EmbTables) t(t),
                 (SELECT j FROM range(64) r(j), bb WHERE j < bits) j,
                 range($EmbDims) d(d)
            GROUP BY 1, 2),
          proj AS (SELECT e.vec_id, p.t,
                          CASE WHEN list_dot_product(e.v, p.w) > 0 THEN 1 << p.j ELSE 0 END AS bit
                   FROM e, planes p),
          buck AS (SELECT vec_id, t, sum(bit) AS bv FROM proj GROUP BY 1, 2),
          pairs AS (SELECT DISTINCT ba.vec_id AS a, bb2.vec_id AS b
                    FROM buck ba JOIN buck bb2 ON ba.t = bb2.t AND ba.bv = bb2.bv
                    WHERE ba.vec_id < bb2.vec_id),
          scored AS (SELECT p.a, p.b,
                            round(list_dot_product(ea.v, eb.v) /
                              (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cos
                     FROM pairs p JOIN e ea ON p.a = ea.vec_id JOIN e eb ON p.b = eb.vec_id)
        SELECT a, b, cos FROM scored WHERE cos >= $EmbThreshold ORDER BY a, b"""

  /** Edit-distance fuzzy join over the distinct part-name dictionary —
    * the string-cleaning sibling of the token-level tiers: all pairs of
    * distinct names within Levenshtein distance ≤ FuzzK, found WITHOUT
    * an all-pairs scan via the deletion-neighborhood signature
    * (SymSpell): every string emits its ≤ FuzzK-deletion variants, and
    * any pair within distance k provably shares a common variant (align
    * the pair; delete the ≤ k substituted/inserted positions from each
    * side — the filter is EXACT, no recall loss, which the brute-force
    * oracle independently certifies). Candidates then verify with one
    * `levenshtein` call. Scale: signatures per string are
    * O(L choose k) — TPC-H p_name runs ~30–35 chars, so k = 2 emits
    * ~(35 choose 2) ≈ 600 variants per name. To keep that affordable
    * the join key is the 64-bit xxhash of each variant, not the variant
    * string itself: shuffle is |dict|×600 8-byte longs, never |dict|²
    * and never 30-byte strings. Hash collisions can only ADD candidate
    * pairs (each is then verified by `levenshtein`), so exactness is
    * preserved; the dictionary shape (distinct names, not corpus rows)
    * is exactly how fuzzy joins run in cleaning pipelines. */
  val FuzzK = 2
  def dedupFuzzyNames(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name").as("name")).distinct()
    // variants with 0, 1, or 2 character deletions, built in-row and
    // immediately hashed to 64 bits (see scaladoc: collisions are safe)
    val sigs = names.select(col("name"), explode(expr(
      """concat(
           array(name),
           transform(sequence(1, length(name)), i ->
             concat(substr(name, 1, i - 1), substr(name, i + 1))),
           flatten(transform(sequence(1, length(name)), i ->
             CASE WHEN i < length(name) THEN
               transform(sequence(i + 1, length(name)), j ->
                 concat(substr(name, 1, i - 1), substr(name, i + 1, j - i - 1), substr(name, j + 1)))
             ELSE CAST(array() AS ARRAY<STRING>) END)))""")).as("sigstr"))
      .select(col("name"), xxhash64(col("sigstr")).as("sig"))
      .distinct()
    sigs.select(col("name").as("a"), col("sig"))
      .join(sigs.select(col("name").as("b"), col("sig")), "sig")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= FuzzK)
      .orderBy("a", "b")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("dedup_exact", dedupExact, Some(
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY keep_id""")),
    QueryDef("dedup_ngram_jaccard", dedupNgramJaccard, Some(
      s"""WITH sh AS ($shingleSql),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
          SELECT i.a AS a, i.b AS b,
                 round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
          FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
          WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 6) >= $JaccardThreshold
          ORDER BY a, b""")),
    // brute-force oracle ON PURPOSE: an independent all-pairs scan
    // certifies the deletion-signature filter loses no pair
    QueryDef("dedup_fuzzy_names", dedupFuzzyNames, Some(
      s"""WITH n AS (SELECT DISTINCT p_name AS name FROM part)
          SELECT a.name AS a, b.name AS b,
                 levenshtein(a.name, b.name) AS dist
          FROM n a, n b
          WHERE a.name < b.name AND levenshtein(a.name, b.name) <= $FuzzK
          ORDER BY a, b""")),
    QueryDef("dedup_minhash", dedupMinhash, Some(minhashOracle)),
    QueryDef("dedup_recall_report", dedupRecallReport, Some(dedupRecallOracle)),
    QueryDef("dedup_minhash_incremental", dedupMinhashIncremental,
      Some(minhashIncrementalOracle)),
    QueryDef("dedup_minhash_salted", dedupMinhashSalted, Some(minhashOracle)),
    QueryDef("dedup_cluster", dedupCluster, Some(clusterOracle)),
    QueryDef("dedup_source_report", dedupSourceReport, Some(sourceReportOracle)),
    QueryDef("dedup_embedding", dedupEmbedding, Some(embLshAutoOracle)),
    QueryDef("dedup_embedding_fixed", dedupEmbeddingFixed, Some(embLshOracle)),
    QueryDef("dedup_embedding_exact", dedupEmbeddingExact, Some(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            p AS (SELECT a.vec_id AS a, b.vec_id AS b,
                         round(list_dot_product(a.v, b.v) /
                           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
                  FROM e a JOIN e b ON a.vec_id < b.vec_id)
          SELECT a, b, cos FROM p WHERE cos >= $EmbThreshold ORDER BY a, b""")),
    QueryDef("dedup_simhash", dedupSimhash, Some(simhashOracle)),
    QueryDef("dedup_substring_winnow", dedupSubstringWinnow, Some(winnowOracle)),
    QueryDef("dedup_containment", dedupContainment, Some(
      s"""WITH sh AS ($shingleSql),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
                      GROUP BY 1, 2)
          SELECT i.a AS a, i.b AS b,
                 round(i.inter / sa.sz, 6) AS containment
          FROM inter i JOIN sizes sa ON i.a = sa.doc_id
          WHERE round(i.inter / sa.sz, 6) >= $ContainmentThreshold
          ORDER BY a, b""")),
  )
}
