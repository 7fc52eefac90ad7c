package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables
import graft.functions.TextFns

/** Per-document text profiling for training-data curation: language-ID
  * heuristic, quality scoring, token counting, fingerprinting.
  *
  * Pure per-row column expressions — embarrassingly parallel, no
  * shuffle at all (the ORDER BY is for oracle determinism only and
  * would be dropped in a production pipeline). Everything stays inside
  * whole-stage codegen: these run at full scan speed on 100 TB.
  */
object TextProfile {
  val StopWords: Seq[String] = Seq("the", "a")
  val EnThreshold = 0.05
  val QualityCutoff = 0.5

  private def base(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), split(col("text"), " ").as("toks"))

  private val stopPred = StopWords.map(w => s"t = '$w'").mkString(" OR ")

  /** Stopword-ratio language heuristic (reported next to the true label). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .withColumn("stop_ratio",
        round(expr(s"size(filter(toks, t -> $stopPred))") / size(col("toks")), 6))
      .withColumn("predicted",
        when(col("stop_ratio") >= EnThreshold, lit("en")).otherwise(lit("unk")))
      .select(col("doc_id"), col("lang"), col("stop_ratio"), col("predicted"))
      .orderBy("doc_id")

  /** Composite quality score: length, lexical diversity, stopword load. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .withColumn("n_toks", size(col("toks")))
      .withColumn("distinct_ratio", expr("size(array_distinct(toks)) / size(toks)"))
      .withColumn("stop_ratio", expr(s"size(filter(toks, t -> $stopPred)) / size(toks)"))
      .withColumn("quality", round(
        lit(0.4) * least(lit(1.0), col("n_toks") / 100.0) +
        lit(0.3) * col("distinct_ratio") +
        lit(0.3) * (lit(1.0) - col("stop_ratio")), 6))
      .select(col("doc_id"), col("n_toks").cast("long").as("n_toks"),
        round(col("distinct_ratio"), 6).as("distinct_ratio"),
        round(col("stop_ratio"), 6).as("stop_ratio"),
        col("quality"),
        (col("quality") >= QualityCutoff).as("pass"))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens, BPE-ish regex pieces, chars. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]+|[^a-z0-9 ]")).cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("chars"))
      .orderBy("doc_id")

  /** Fingerprint: full content hash + min-shingle-hash sketch (a 1-row
    * MinHash, usable as a cheap near-dup prefilter key). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir)
      .withColumn("sh", expr(
        "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), " +
        "i -> array_join(slice(toks, i, 3), ' ')) ELSE array() END"))
      .select(col("doc_id"), md5(col("text")).as("content_hash"),
        expr("array_min(transform(sh, s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)))")
          .as("sketch"))
      .orderBy("doc_id")

  private val stopPredSql = StopWords.map(w => s"t = '$w'").mkString(" OR ")

  /** Zipf-law fit of the corpus word-frequency distribution: OLS of
    * log-frequency against log-rank (both floored onto a 1e-6 grid so
    * the moments are exact integers — [[Classify.linearFit]]'s
    * discipline on transformed variables; the micro-units cancel in
    * the slope, which IS the Zipf exponent). Natural text fits slope
    * ≈ −1 with high r²; a near-uniform synthetic vocabulary honestly
    * reports a shallow slope — either way the MEASUREMENT is the
    * deliverable. Vocabulary-sized ranking window, 5 moment
    * aggregates, zero corpus-sized shuffles beyond the word count. */
  val ZipfGrid = 1000000.0
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val ranked = wc.withColumn("rnk",
      row_number().over(Window.orderBy(col("cnt").desc, col("w"))).cast("long"))
    Classify.linearFit(ranked.select(
      floor(log(col("rnk").cast("double")) * ZipfGrid).cast("long").as("x"),
      floor(log(col("cnt").cast("double")) * ZipfGrid).cast("long").as("y")))
  }

  /** Heaps'-law fit — vocabulary growth V(n) ≈ K·n^β, the companion
    * law to Zipf: distinct TRIGRAM-type count vs tokens seen at ten
    * doc-id-ordered corpus prefixes, fit log-log through the shared
    * exact-moment linearFit core (logs on the 1e-6 grid). The
    * synthetic corpus has a CLOSED ~31-word unigram vocabulary (and a
    * near-saturated bigram space) — zero/low variance, unfittable — so
    * the law is measured on TRIGRAM types, whose 31³-sized space the
    * corpus never exhausts; the estimator is identical either way. A type's FIRST doc (one
    * min-groupBy) makes every prefix a filtered count — no per-prefix
    * rescan, the one-pass way to draw the whole growth curve. */
  val HeapsDeciles = 10
  def heapsFit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        expr("size(filter(toks, t -> t <> ''))").cast("long").as("nt"),
        col("toks"))
      .memoized() // feeds token totals, first-docs, and the spine
    val nDocs = docs.agg(max(col("doc_id")).as("mx"))
    val spine = spark.range(1, HeapsDeciles + 1).select(col("id").as("p"))
      .crossJoin(broadcast(nDocs))
      .select(col("p"), expr(s"CAST(ceil((mx + 1) * p / $HeapsDeciles.0) AS BIGINT)").as("cut"))
    val toksSeen = docs.crossJoin(broadcast(spine))
      .filter(col("doc_id") < col("cut"))
      .groupBy("p").agg(sum(col("nt")).as("tokens"))
    val firstDoc = docs
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))")).as("w"))
      .groupBy("w").agg(min(col("doc_id")).as("fd"))
    val vocabSeen = firstDoc.crossJoin(broadcast(spine))
      .filter(col("fd") < col("cut"))
      .groupBy("p").agg(count(lit(1)).as("vocab"))
    Classify.linearFit(toksSeen.join(vocabSeen, "p").select(
      floor(log(col("tokens").cast("double")) * ZipfGrid).cast("long").as("x"),
      floor(log(col("vocab").cast("double")) * ZipfGrid).cast("long").as("y")))
  }

  private val heapsOracle: String =
    s"""WITH docs AS (SELECT doc_id,
                          len(list_filter(string_split(text, ' '), t -> t <> '')) AS nt,
                          string_split(text, ' ') AS toks
                   FROM documents),
          mxd AS (SELECT max(doc_id) AS mx FROM docs),
          spine AS (SELECT u.p, CAST(ceil((mxd.mx + 1) * u.p / $HeapsDeciles.0) AS BIGINT) AS cut
                    FROM mxd, unnest(generate_series(1, $HeapsDeciles)) u(p)),
          ts AS (SELECT s.p, sum(d.nt) AS tokens FROM docs d, spine s
                 WHERE d.doc_id < s.cut GROUP BY 1),
          fd AS (SELECT w, min(doc_id) AS fd FROM (
                   SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS w
                   FROM docs, unnest(generate_series(1, len(toks) - 2)) u(i)
                   WHERE len(toks) >= 3)
                 GROUP BY 1),
          vs AS (SELECT s.p, count(*) AS vocab FROM fd, spine s
                 WHERE fd.fd < s.cut GROUP BY 1),
          b AS (SELECT CAST(floor(ln(ts.tokens::DOUBLE) * $ZipfGrid) AS BIGINT) AS x,
                       CAST(floor(ln(vs.vocab::DOUBLE) * $ZipfGrid) AS BIGINT) AS y
                FROM ts JOIN vs USING (p)),
          s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
                FROM b)
        SELECT n,
               round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                     (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
               round((sy::DOUBLE -
                      ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                       (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                     / n::DOUBLE, 4) AS intercept,
               round(((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) *
                      (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)) /
                     ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
                      (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 8) AS r2
        FROM s"""

  private val zipfOracle: String =
    s"""WITH wc AS (SELECT w, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY 1),
          rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rnk FROM wc),
          b AS (SELECT CAST(floor(ln(rnk::DOUBLE) * $ZipfGrid) AS BIGINT) AS x,
                       CAST(floor(ln(cnt::DOUBLE) * $ZipfGrid) AS BIGINT) AS y
                FROM rk),
          s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
                FROM b)
        SELECT n,
               round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                     (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
               round((sy::DOUBLE -
                      ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
                       (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                     / n::DOUBLE, 4) AS intercept,
               round(((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) *
                      (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)) /
                     ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
                      (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 8) AS r2
        FROM s"""

  /** Per-SOURCE Jensen–Shannon divergence from the corpus unigram
    * distribution — the domain-shift gauge a mixture-tuning pass reads
    * ("which slices look least like the blend"). Per-(source, word)
    * terms p·log₂(p/m) and q·log₂(q/m) are floored onto a 1e-9 grid
    * and summed as exact BIGINTs (order-free — the SGD/DSIR grid
    * discipline), one double halving + round at the end. The grid is
    * sources × vocabulary (LEFT-joined counts — absent words carry
    * p = 0 and still contribute their q·log₂2 mass), built from ONE
    * token-count groupBy; |sources| is small, so the grid is
    * vocabulary-sized, never corpus-sized. */
  val JsGrid = 1000000000.0
  def jsDivergence(spark: SparkSession, dir: String): DataFrame =
    jsDivergenceOn(Tables.documents(spark, dir))

  /** The JS core over any (source, text) frame — spec entry point. */
  def jsDivergenceOn(docs: DataFrame): DataFrame = {
    val sw = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("n"))
    val stot = sw.groupBy("source").agg(sum(col("n")).as("ns"))
    val cw = sw.groupBy("w").agg(sum(col("n")).as("nw"))
    val ct = cw.agg(sum(col("nw")).as("nn"))
    val g = stot.crossJoin(cw)
      .join(sw, Seq("source", "w"), "left")
      .select(col("source"), col("ns"), col("nw"),
        coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(ct))
    val p = col("n").cast("double") / col("ns")
    val q = col("nw").cast("double") / col("nn")
    val m = (p + q) / lit(2)
    val t = g.select(col("source"), col("ns"),
      when(col("n") > 0, floor(p * log2(p / m) * JsGrid).cast("long"))
        .otherwise(lit(0L)).as("t1"),
      floor(q * log2(q / m) * JsGrid).cast("long").as("t2"))
    t.groupBy("source")
      .agg(max(col("ns")).as("n_tokens"),
        (sum(col("t1")) + sum(col("t2"))).as("snano"))
      .select(col("source"), col("n_tokens"),
        round((col("snano").cast("double") / lit(2)) / lit(JsGrid), 6).as("js"))
      .orderBy("source")
  }

  private val jsOracle: String =
    s"""WITH tok AS (SELECT source, w FROM (
            SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> ''),
          sw AS MATERIALIZED (SELECT source, w, count(*) AS n FROM tok GROUP BY 1, 2),
          stot AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM sw GROUP BY 1),
          cw AS (SELECT w, CAST(sum(n) AS BIGINT) AS nw FROM sw GROUP BY 1),
          ct AS (SELECT CAST(sum(nw) AS BIGINT) AS nn FROM cw),
          g AS (SELECT st.source, st.ns, c.nw, coalesce(s.n, 0) AS n
                FROM stot st CROSS JOIN cw c
                LEFT JOIN sw s ON s.source = st.source AND s.w = c.w),
          t AS (SELECT source, ns,
                       CASE WHEN n > 0 THEN CAST(floor((n::DOUBLE / ns) *
                              log2((n::DOUBLE / ns) /
                                   (((n::DOUBLE / ns) + (nw::DOUBLE / nn)) / 2)) *
                              $JsGrid) AS BIGINT)
                            ELSE 0 END AS t1,
                       CAST(floor((nw::DOUBLE / nn) *
                              log2((nw::DOUBLE / nn) /
                                   (((n::DOUBLE / ns) + (nw::DOUBLE / nn)) / 2)) *
                              $JsGrid) AS BIGINT) AS t2
                FROM g, ct),
          a AS (SELECT source, max(ns) AS n_tokens,
                       CAST(sum(t1) + sum(t2) AS BIGINT) AS snano
                FROM t GROUP BY 1)
        SELECT source, n_tokens, round((snano::DOUBLE / 2) / $JsGrid, 6) AS js
        FROM a ORDER BY source"""

  /** Pairwise source VOCABULARY Jaccard (r12) — the corpus-drift /
    * source-near-duplication diagnostic a mixing pipeline reads
    * before setting rates: two sources whose vocabularies overlap
    * heavily are near-redundant and double-count their distribution.
    * \|A∩B\| via a self-join of the distinct (source, word) postings
    * on word (shuffle ∝ postings — never \|docs\|²), \|A∪B\| by
    * inclusion–exclusion from the per-source vocab sizes; one exact
    * division at the end. Output restricted to jaccard ≥
    * [[SourceJaccardFloor]] — at 100 TB the interesting pairs are the
    * anomalously-similar few, not the \|sources\|² grid. */
  val SourceJaccardFloor = 0.3
  def sourceJaccard(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .memoized() // both join sides + the size table read it
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("sz"))
    vocab.select(col("source").as("a"), col("w"))
      .join(vocab.select(col("source").as("b"), col("w")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("source").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"), col("inter"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= SourceJaccardFloor)
      .orderBy("a", "b")
  }

  private lazy val sourceJaccardOracle: String =
    s"""WITH vocab AS (SELECT DISTINCT source, w FROM (
              SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> ''),
          sizes AS (SELECT source, count(*) AS sz FROM vocab GROUP BY 1),
          pairs AS (SELECT x.source AS a, y.source AS b, count(*) AS inter
                    FROM vocab x JOIN vocab y ON x.w = y.w AND x.source < y.source
                    GROUP BY 1, 2)
        SELECT p.a, p.b, p.inter,
               round(CAST(p.inter AS DOUBLE) /
                     CAST(sa.sz + sb.sz - p.inter AS DOUBLE), 6) AS jaccard
        FROM pairs p JOIN sizes sa ON p.a = sa.source JOIN sizes sb ON p.b = sb.source
        WHERE round(CAST(p.inter AS DOUBLE) /
                    CAST(sa.sz + sb.sz - p.inter AS DOUBLE), 6) >= $SourceJaccardFloor
        ORDER BY a, b"""

  /** Feature-hashed document embeddings (Weinberger et al. 2009 — the
    * hashing trick): every token lands in dim = hash32(t) mod
    * [[EmbedDims]] with sign 1−2·(next hash bit), weight = signed term
    * frequency — a model-free text→vector bridge whose vectors are
    * EXACT INTEGERS (no float path anywhere in the embedding itself).
    * Emitted in sparse (doc, dim, w≠0) long form — the 100 TB storage
    * shape; densification is the consumer's (cheap, in-row) step.
    * Scale: one explode + one (doc, dim) groupBy, shuffle ∝ corpus
    * nnz ≤ docs×[[EmbedDims]]. */
  val EmbedDims = 64
  def hashEmbedSparse(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .selectExpr("doc_id",
        "CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) AS h")
      .selectExpr("doc_id", s"CAST(h % $EmbedDims AS INT) AS dim",
        s"(1 - ((h div $EmbedDims) % 2) * 2) AS sign")
      .groupBy("doc_id", "dim").agg(sum(col("sign")).as("w"))
      .filter(col("w") =!= 0)

  def textHashEmbedding(spark: SparkSession, dir: String): DataFrame =
    hashEmbedSparse(spark, dir).orderBy("doc_id", "dim")

  private val hashEmbedCtes: String =
    s"""tokh AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE t <> ''),
        sp AS MATERIALIZED (SELECT doc_id, CAST(h % $EmbedDims AS INT) AS dim,
                   CAST(sum(1 - ((h // $EmbedDims) % 2) * 2) AS BIGINT) AS w
            FROM tokh GROUP BY 1, 2 HAVING sum(1 - ((h // $EmbedDims) % 2) * 2) <> 0)"""

  private val hashEmbeddingOracle: String =
    s"""WITH $hashEmbedCtes
        SELECT doc_id, dim, w FROM sp ORDER BY doc_id, dim"""

  /** Top-k similar documents over the hashed embeddings — the
    * text-native ANN ground truth: densify the sparse vectors in-row
    * (a 64-slot map lookup), then the standard broadcast-queries
    * cosine top-k. Dot products are exact integer arithmetic in
    * doubles (vectors are signed counts), cosine's two sqrt/divide at
    * the edge — bit-identical cross-engine. */
  val EmbedKnnQueries = 10
  val EmbedKnnK = 5
  def textEmbedKnn(spark: SparkSession, dir: String): DataFrame = {
    val dense = hashEmbedSparse(spark, dir)
      .groupBy(col("doc_id").as("vec_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("w")))).as("m"))
      .selectExpr("vec_id",
        s"transform(sequence(0, ${EmbedDims - 1}), i -> CAST(coalesce(element_at(m, i), 0L) AS DOUBLE)) AS embedding")
    graft.api.GraftOps.cosineTopK(dense, "vec_id", "embedding",
        dense.filter(col("vec_id") < EmbedKnnQueries), k = EmbedKnnK)
      .orderBy("qid", "rnk")
  }

  private val embedKnnOracle: String =
    s"""WITH $hashEmbedCtes,
        dims AS (SELECT unnest(generate_series(0, ${EmbedDims - 1})) AS dim),
        dv AS (SELECT d.doc_id, m.dim, coalesce(s.w, 0) AS w
               FROM (SELECT DISTINCT doc_id FROM sp) d CROSS JOIN dims m
               LEFT JOIN sp s ON s.doc_id = d.doc_id AND s.dim = m.dim),
        vec AS MATERIALIZED (SELECT doc_id, list(CAST(w AS DOUBLE) ORDER BY dim) AS v
               FROM dv GROUP BY 1),
        q AS (SELECT doc_id AS qid, v AS qv FROM vec WHERE doc_id < $EmbedKnnQueries),
        c AS (SELECT q.qid, e.doc_id AS neighbor,
                     list_dot_product(q.qv, e.v) /
                       (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
              FROM q, vec e WHERE e.doc_id <> q.qid),
        r AS (SELECT qid, neighbor, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor) AS rnk
              FROM c)
        SELECT qid, rnk, neighbor, round(cos, 6) AS cos
        FROM r WHERE rnk <= $EmbedKnnK ORDER BY qid, rnk"""

  /** Per-source lexical-diversity profile — the corpus-health numbers
    * next to zipf/heaps: token count, vocabulary size, type-token
    * ratio, and the hapax rate (share of the vocabulary occurring
    * once — the classic productivity signal; a scraped-boilerplate
    * source shows low TTR and low hapax). All exact integer counts;
    * two rounded divisions per source at the edge.
    * Scale: one (source, word) count agg (map-side combined, shuffle
    * ∝ per-source vocab), then a |sources|-row fold. */
  def textLexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"), 6)
          .as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6)
          .as("hapax_rate"))
      .orderBy("source")

  private val lexicalDiversityOracle: String =
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
         c AS (SELECT source, w, count(*)::BIGINT AS n FROM w WHERE w <> '' GROUP BY 1, 2),
         a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                      count(*)::BIGINT AS n_types,
                      sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
               FROM c GROUP BY 1)
       SELECT source, n_tokens, n_types,
              round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
              round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_rate
       FROM a ORDER BY source"""

  /** Per-doc novelty score — the incremental-ingest curation signal
    * ("how much of this doc has the corpus already seen"): the share
    * of a doc's distinct trigram shingles whose FIRST occurrence
    * (min doc_id — the deterministic stand-in for arrival order) is
    * this doc. Near-1 = fresh content, near-0 = recombined
    * boilerplate; dedup's set-similarity misses exactly this
    * accumulated-partial-overlap case. Emitted as the per-source
    * novelty profile (mean over docs, cross-multiplied exact).
    * Scale: one (shingle → min doc) agg (shuffle ∝ distinct
    * shingles, the suffix/winnow family's volume), one narrow join
    * back, one fold per source. */
  def curNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"),
        explode(array_distinct(TextFns.shingles("toks", 3))).as("sh"))
    val firstDoc = sh.groupBy("sh").agg(min(col("doc_id")).as("fd"))
    val perDoc = sh.join(firstDoc, "sh")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("n_shingles"), sum(col("n_novel")).as("n_novel"))
      .select(col("source"), col("n_docs"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6)
          .as("novelty"))
      .orderBy("source")
  }

  private val noveltyOracle: String =
    s"""WITH sh AS (SELECT DISTINCT d.doc_id, d.source, u.sh
                FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents) d,
                     unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             for i in generate_series(1, len(toks) - 2)]) AS u(sh)
                WHERE len(toks) >= 3),
        fd AS (SELECT sh, min(doc_id) AS fd FROM sh GROUP BY 1),
        pd AS (SELECT s.doc_id, s.source, count(*)::BIGINT AS n_sh,
                      sum(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel
               FROM sh s JOIN fd f ON s.sh = f.sh GROUP BY 1, 2)
       SELECT source, count(*)::BIGINT AS n_docs,
              CAST(sum(n_sh) AS BIGINT) AS n_shingles,
              CAST(sum(n_novel) AS BIGINT) AS n_novel,
              round(CAST(sum(n_novel) AS DOUBLE) / CAST(sum(n_sh) AS DOUBLE), 6) AS novelty
       FROM pd GROUP BY 1 ORDER BY source"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("cur_novelty", curNovelty, Some(noveltyOracle)),
    QueryDef("text_lexical_diversity", textLexicalDiversity, Some(lexicalDiversityOracle)),
    QueryDef("text_hash_embedding", textHashEmbedding, Some(hashEmbeddingOracle)),
    QueryDef("text_embed_knn", textEmbedKnn, Some(embedKnnOracle)),
    QueryDef("cur_source_jaccard", sourceJaccard, Some(sourceJaccardOracle)),
    QueryDef("text_js_divergence", jsDivergence, Some(jsOracle)),
    QueryDef("text_zipf_fit", zipfFit, Some(zipfOracle)),
    QueryDef("text_heaps_fit", heapsFit, Some(heapsOracle)),
    QueryDef("text_langid", langId, Some(
      s"""SELECT doc_id, lang,
                 round(len(list_filter(string_split(text, ' '), t -> $stopPredSql))
                       / len(string_split(text, ' ')), 6) AS stop_ratio,
                 CASE WHEN round(len(list_filter(string_split(text, ' '), t -> $stopPredSql))
                       / len(string_split(text, ' ')), 6) >= $EnThreshold
                      THEN 'en' ELSE 'unk' END AS predicted
          FROM documents ORDER BY doc_id""")),
    QueryDef("text_quality", quality, Some(
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            m AS (SELECT doc_id, len(toks) AS n_toks,
                         len(list_distinct(toks)) / len(toks) AS distinct_ratio,
                         len(list_filter(toks, t -> $stopPredSql)) / len(toks) AS stop_ratio
                  FROM b),
            s AS (SELECT doc_id, n_toks, distinct_ratio, stop_ratio,
                         round(0.4 * least(1.0, n_toks / 100.0)
                               + 0.3 * distinct_ratio
                               + 0.3 * (1.0 - stop_ratio), 6) AS quality
                  FROM m)
          SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
                 round(distinct_ratio, 6) AS distinct_ratio,
                 round(stop_ratio, 6) AS stop_ratio, quality,
                 quality >= $QualityCutoff AS pass
          FROM s ORDER BY doc_id""")),
    QueryDef("text_tokens", tokenCounts, Some(
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
                CAST(length(text) AS BIGINT) AS chars
         FROM documents ORDER BY doc_id""")),
    QueryDef("text_fingerprint", fingerprint, Some(
      """WITH b AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
         SELECT doc_id, md5(text) AS content_hash,
                list_min([('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 8))::BIGINT
                          for i in generate_series(1, len(toks) - 2)]) AS sketch
         FROM b ORDER BY doc_id""")),
  )
}
