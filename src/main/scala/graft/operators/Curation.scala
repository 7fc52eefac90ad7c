package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables
import graft.functions.TextFns

/** Training-data curation: the selection/packing steps between raw
  * corpus and training batches.
  *
  * All three are DETERMINISTIC (content-hash driven, not RNG driven):
  * the same corpus always yields the same sample/split/packing on any
  * cluster size — reproducibility that `rand()`-based sampling cannot
  * give across retries/re-partitions, and the property that lets the
  * DuckDB oracle verify them value-for-value.
  *
  *  - `sampleHash`: keep rows whose md5-derived hash lands under pct%.
  *  - `splitHash`: 80/10/10 train/val/test assignment from hash ranges.
  *  - `packSequences`: greedy token-budget packing — per source, docs
  *    (in stable doc_id order) are assigned to consecutive bins via the
  *    running token total div budget; one window pass, no driver loop.
  */
object Curation {
  val SamplePct = 10L
  val TokenBudget = 512L

  /** Deterministic pct% sample of any DataFrame by a key column. */
  def sampleHash(df: DataFrame, key: String, pct: Long): DataFrame =
    df.filter(TextFns.hash32(col(key).cast("string")) % 100 < pct)

  /** Deterministic STRATIFIED sample: per-stratum keep-percentages
    * realized through the same md5 hash ladder as `sampleHash`, so each
    * stratum is downsampled (or kept) at its own rate — the shape of
    * real corpus mixing, where web crawl is cut hard and curated
    * sources survive. Strata absent from the map fall back to
    * `defaultPct`. Reproducible on any cluster size. */
  def sampleStratified(df: DataFrame, key: String, stratum: String,
                       pcts: Map[String, Long],
                       defaultPct: Long = 0L): DataFrame = {
    val pctCol = pcts.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(stratum) === s, lit(p)).otherwise(acc)
    }
    df.filter(TextFns.hash32(col(key).cast("string")) % 100 < pctCol)
  }

  /** Deterministic train/val/test split (80/10/10) by key hash. */
  def splitHash(df: DataFrame, key: String): DataFrame =
    df.withColumn("bucket", TextFns.hash32(col(key).cast("string")) % 100)
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .drop("bucket")

  def sampleDocs(spark: SparkSession, dir: String): DataFrame =
    sampleHash(Tables.documents(spark, dir), "doc_id", SamplePct)
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  def splitDocs(spark: SparkSession, dir: String): DataFrame =
    splitHash(Tables.documents(spark, dir), "doc_id")
      .groupBy("split").agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** Token-budget packing: (doc_id, source, n_tokens, bin). Bin id =
    * exclusive running token total div budget, per source partition. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bin", expr(s"(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id " +
        s"ROWS UNBOUNDED PRECEDING) - n_tokens) div $TokenBudget"))
      .orderBy("source", "doc_id")
  }

  // split thresholds + the DuckDB mirror of TextFns.hash32 — public:
  // composed oracles (cur_pipeline) must reference the SAME definitions
  // or a retune here silently breaks their parity
  val TrainUpper = 80L
  val ValUpper = 90L
  val hashSql = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"

  /** Curated-mix rates: a couple of "high-value" sources kept at high
    * rates, the long tail cut to the default — the corpus-mixing shape. */
  val StratPcts: Map[String, Long] = Map("src0" -> 80L, "src1" -> 50L, "src2" -> 20L)
  val StratDefaultPct = 10L

  def sampleStratifiedDocs(spark: SparkSession, dir: String): DataFrame =
    sampleStratified(Tables.documents(spark, dir), "doc_id", "source",
        StratPcts, StratDefaultPct)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  /** Overlapping passage chunking (the retrieval/RAG prep step):
    * ChunkLen-token windows at Stride-token steps over each doc,
    * entirely IN-ROW (sequence → transform → explode — codegen'd,
    * ZERO shuffle; the one at-scale shape for a pure per-doc
    * restructuring). A trailing start whose remainder is already
    * fully inside the previous chunk (n − start ≤ overlap) is
    * skipped — no chunk is a suffix of its predecessor. */
  val ChunkLen = 32
  val ChunkStride = 24
  def chunkPassages(spark: SparkSession, dir: String): DataFrame = {
    val overlap = ChunkLen - ChunkStride
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n"), col("toks"))
      .select(col("doc_id"), explode(expr(
        s"""filter(
              transform(sequence(0, greatest(CAST(ceil(n / $ChunkStride) AS INT) - 1, 0)),
                i -> struct(i AS chunk_id,
                            slice(toks, i * $ChunkStride + 1,
                                  least($ChunkLen, n - i * $ChunkStride)) AS ch)),
              c -> c.chunk_id * $ChunkStride < n AND
                   (c.chunk_id = 0 OR n - c.chunk_id * $ChunkStride > $overlap))"""))
        .as("c"))
      .select(col("doc_id"), col("c.chunk_id").cast("long").as("chunk_id"),
        size(col("c.ch")).cast("long").as("n_tokens"),
        concat_ws(" ", col("c.ch")).as("passage"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic WEIGHTED sampling without replacement (r12 —
    * Efraimidis–Spirakis A-ES, the reservoir algorithm every
    * distributed engine uses for weighted takes): doc key =
    * u^(1/w) with u a deterministic md5-derived uniform and w the
    * doc's weight (n_chars — sample long docs proportionally more),
    * top-[[WeightedK]] keys per source win. Ranked on the MONOTONE
    * transform ln(u)/w (same order, better float behavior near 1),
    * 12-dp-rounded with a doc_id tie-break so a last-ulp libm
    * divergence cannot flip ranks between engines. Where
    * `sampleHash` realizes per-stratum RATES, this realizes exact
    * per-stratum COUNTS under weights — the "take the best k by
    * importance" half of corpus mixing (DSIR-style importance takes).
    * Scale: one scan + a bounded per-source top-k (map-side partial
    * heap via window over the |sources| partitioning); no global
    * sort, no RNG — re-runs and retries land the identical sample on
    * any cluster size. */
  val WeightedK = 5
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(log((TextFns.hash32(col("doc_id").cast("string")).cast("double") + 0.5d) /
            4294967296.0d) / col("n_chars"), 12).as("es_key"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("es_key").desc, col("doc_id"))
    keyed.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= WeightedK)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy("source", "rnk")
  }

  private val sampleWeightedOracle: String =
    s"""WITH keyed AS (
          SELECT doc_id, source, n_chars,
                 round(ln(($hashSql::DOUBLE + 0.5) / 4294967296.0) / n_chars, 12) AS es_key
          FROM documents WHERE n_chars > 0),
          r AS (SELECT source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source
                         ORDER BY es_key DESC, doc_id) AS rnk
                FROM keyed)
        SELECT source, rnk, doc_id, n_chars
        FROM r WHERE rnk <= $WeightedK ORDER BY source, rnk"""

  private val chunkOracle: String = {
    val overlap = ChunkLen - ChunkStride
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                          len(string_split(text, ' ')) AS n
                   FROM documents),
          ch AS (SELECT doc_id, u.i AS chunk_id,
                        toks[u.i * $ChunkStride + 1 :
                             u.i * $ChunkStride + least($ChunkLen, n - u.i * $ChunkStride)] AS ck
                 FROM d, unnest(generate_series(0, greatest(CAST(ceil(n / $ChunkStride) AS INT) - 1, 0))) u(i)
                 WHERE u.i * $ChunkStride < n AND
                       (u.i = 0 OR n - u.i * $ChunkStride > $overlap))
        SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(len(ck) AS BIGINT) AS n_tokens,
               array_to_string(ck, ' ') AS passage
        FROM ch ORDER BY doc_id, chunk_id"""
  }

  /** Budget-constrained corpus selection — "spend a token budget on
    * the highest-quality documents": rank docs by a deterministic
    * quality score (lexical-diversity ratio on a 1e-6 grid — the
    * qualityFilter rounding discipline) and admit WHOLE SCORE BUCKETS
    * from the top down while the cumulative token count fits the
    * budget (3/5 of the corpus total, computed in-plan so the
    * operator is scale-relative). NO global row sort: the admission
    * frontier is a cumulative window over the DISTINCT-SCORE
    * histogram (the q64/ml_lift_curve discipline — grid-bounded, a
    * constant independent of corpus size), exactly how a 100 TB
    * selection has to run. Bucket granularity is the honest contract:
    * the report shows the budget, the admitted cutoff score, and the
    * unspent remainder.
    * Scale: one scan to (score, tokens) pairs, one map-side-combined
    * histogram agg, constant-sized window + broadcast total. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("toks"))
      .select(size(col("toks")).cast("long").as("n_toks"),
        expr("CAST(round(size(array_distinct(toks)) / size(toks) * 1e6) AS BIGINT)")
          .as("score"))
    val hist = scored.groupBy("score")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("toks"))
    val tot = hist.agg(sum(col("toks")).as("total_toks"))
    val w = Window.orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("cum_toks", sum(col("toks")).over(w))
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr("total_toks * 3 div 5"))
      .filter(col("cum_toks") <= col("budget"))
      .groupBy()
      .agg(max(col("budget")).as("budget"),
        min(col("score")).as("cutoff_score"),
        max(col("cum_docs")).as("n_docs"),
        max(col("cum_toks")).as("tokens_selected"))
      .select(col("budget"), col("cutoff_score"), col("n_docs"),
        col("tokens_selected"),
        round(col("tokens_selected").cast("double") / col("budget").cast("double"), 6)
          .as("utilization"))
  }

  private val tokenBudgetOracle: String =
    """WITH sc AS (SELECT len(toks) AS n_toks,
                          CAST(round(len(list_distinct(toks)) / len(toks) * 1e6) AS BIGINT) AS score
                   FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
         hist AS (SELECT score, count(*)::BIGINT AS n_docs,
                         CAST(sum(n_toks) AS BIGINT) AS toks
                  FROM sc GROUP BY 1),
         tot AS (SELECT CAST(sum(toks) AS BIGINT) AS total_toks FROM hist),
         cum AS (SELECT score,
                        sum(toks) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS cum_toks,
                        sum(n_docs) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS cum_docs
                 FROM hist),
         sel AS (SELECT t.total_toks * 3 // 5 AS budget, c.score, c.cum_toks, c.cum_docs
                 FROM cum c, tot t
                 WHERE c.cum_toks <= t.total_toks * 3 // 5)
       SELECT CAST(max(budget) AS BIGINT) AS budget,
              CAST(min(score) AS BIGINT) AS cutoff_score,
              CAST(max(cum_docs) AS BIGINT) AS n_docs,
              CAST(max(cum_toks) AS BIGINT) AS tokens_selected,
              round(CAST(max(cum_toks) AS DOUBLE) / CAST(max(budget) AS DOUBLE), 6) AS utilization
       FROM sel"""

  /** Token-budget ADMISSION over ANY (doc_id, text) pool — the
    * selection seam cur_pipeline_v7 composes: the admitted set is all
    * docs whose quality score clears the histogram-frontier cutoff
    * (equivalently, the maximal top-down whole-bucket prefix within
    * 3/5 of the pool's tokens — a distinct-score prefix IS a
    * score ≥ cutoff filter). */
  def tokenBudgetAdmit(docsDf: DataFrame): DataFrame = {
    val scored = docsDf
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        expr("CAST(round(size(array_distinct(toks)) / size(toks) * 1e6) AS BIGINT)")
          .as("score"))
    val hist = scored.groupBy("score").agg(sum(col("n_toks")).as("toks"))
    val w = Window.orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cut = hist
      .withColumn("cum", sum(col("toks")).over(w))
      .crossJoin(broadcast(hist.agg(expr("sum(toks) * 3 div 5").as("budget"))))
      .filter(col("cum") <= col("budget"))
      .agg(min(col("score")).as("cutoff"))
    scored.crossJoin(broadcast(cut))
      .filter(col("score") >= col("cutoff"))
      .select(col("doc_id"))
  }

  /** DuckDB mirror of [[tokenBudgetAdmit]] over relation `rel`
    * (emits CTEs ending in `admitted(doc_id)`). */
  def tokenBudgetAdmitCtesFrom(rel: String): String =
    s"""tbsc AS MATERIALIZED (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                 CAST(round(len(list_distinct(string_split(text, ' ')))
                            / len(string_split(text, ' ')) * 1e6) AS BIGINT) AS score
          FROM $rel),
        tbh AS (SELECT score, CAST(sum(n_toks) AS BIGINT) AS toks FROM tbsc GROUP BY 1),
        tbc AS (SELECT score,
                       sum(toks) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS cum
                FROM tbh),
        tbt AS (SELECT CAST(sum(toks) AS BIGINT) * 3 // 5 AS budget FROM tbh),
        tbcut AS (SELECT min(score) AS cutoff FROM tbc, tbt WHERE cum <= budget),
        admitted AS (SELECT doc_id FROM tbsc, tbcut WHERE score >= cutoff)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("cur_token_budget", tokenBudget, Some(tokenBudgetOracle)),
    QueryDef("cur_chunk_passages", chunkPassages, Some(chunkOracle)),
    QueryDef("cur_sample_hash", sampleDocs, Some(
      s"""SELECT doc_id, n_chars FROM documents
          WHERE $hashSql % 100 < $SamplePct ORDER BY doc_id""")),
    QueryDef("cur_sample_weighted", sampleWeighted, Some(sampleWeightedOracle)),
    QueryDef("cur_sample_stratified", sampleStratifiedDocs, Some {
      val ladder = StratPcts.toSeq.sortBy(_._1)
        .map { case (s, p) => s"WHEN source = '$s' THEN $p" }.mkString(" ")
      s"""SELECT doc_id, source FROM documents
          WHERE $hashSql % 100 < (CASE $ladder ELSE $StratDefaultPct END)
          ORDER BY doc_id"""
    }),
    QueryDef("cur_split_hash", splitDocs, Some(
      s"""SELECT CASE WHEN $hashSql % 100 < $TrainUpper THEN 'train'
                      WHEN $hashSql % 100 < $ValUpper THEN 'val'
                      ELSE 'test' END AS split, count(*) AS n_docs
          FROM documents GROUP BY 1 ORDER BY split""")),
    QueryDef("cur_pack_sequences", packSequences, Some(
      s"""SELECT doc_id, source, n_tokens,
                 CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens) // $TokenBudget AS BIGINT) AS bin
          FROM (SELECT doc_id, source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                FROM documents)
          ORDER BY source, doc_id""")),
  )
}
