package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.TextFns

/** Corpus mixture control: the two selection passes that decide HOW MUCH
  * of each slice of a raw corpus a training run sees.
  *
  *  - `mixTemperature`: temperature-scaled language mixing (the
  *    mT5/unimax shape): sampling rate per language ∝ n^(α−1) with
  *    α = 1/2, normalized so the smallest language is kept whole —
  *    head languages are cut toward uniform, tail languages survive.
  *    Rates are realized by the deterministic md5 hash ladder (no
  *    rand()), so the same corpus yields the same sample at any
  *    cluster size or retry count.
  *  - `dsir`: data selection with importance resampling (hashed-n-gram
  *    importance weights): per-token hashed-bucket (B = 128) unigram
  *    counts give a target distribution (here: the `en` slice — the
  *    "looks like the language I want" target) and a raw distribution
  *    (the rest); each document scores Σ_f n_df · log(p_t[f]/p_r[f]),
  *    Laplace-smoothed. The per-bucket log-ratio is floored onto a
  *    1e-6 grid and the per-doc sum is then pure BIGINT arithmetic —
  *    order-independent, exact, and replayable value-for-value in
  *    DuckDB (the SGD grid-replay discipline; residual risk is a
  *    cross-libm ln() ulp landing exactly on a grid boundary).
  *
  * Scale: both are scan + small-agg shapes. mixTemperature shuffles one
  * count-groupBy (|langs| rows) and filters the corpus against a
  * broadcast rate table — no global sort, no per-doc shuffle. dsir's
  * only corpus-sized shuffle is the (doc, bucket) count groupBy, ≤ B
  * rows per doc regardless of doc length; the B-row log-ratio model
  * broadcasts back, the weight is a map-side-combinable integer sum.
  * At 100 TB both are two scans and two tiny broadcasts.
  *
  * Both expose relation-parameterized cores (Spark: `dsirWeights` /
  * `temperatureRates`; SQL: `dsirCtesFrom` / `mixTempCtesFrom`) so the
  * composed corpus build (cur_pipeline_v4) runs the SAME code and the
  * SAME replay inside its chain.
  */
object Mixing {
  /** Rate grid: basis points of 1/10000 — floor() keeps realized rates
    * exactly representable and the hash comparison integer-only. */
  val RateGrid = 10000L
  /** DSIR hashed feature-space size (buckets over unigram hash). */
  val DsirBuckets = 128L
  /** DSIR log-ratio quantization grid (micro-units). */
  val DsirGrid = 1000000.0
  val TargetLang = "en"

  private val hashSql = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"

  /** Per-stratum temperature rates over any frame: (stratum, n_docs,
    * rate_bp) with rate = floor(√(n_min/n)·grid). √ and ÷ are IEEE
    * correctly-rounded on both engines → bit-identical rates. */
  def temperatureRates(df: DataFrame, stratum: String): DataFrame = {
    val counts = df.groupBy(stratum).agg(count(lit(1)).as("n_docs"))
    val nmin = counts.agg(min(col("n_docs")).as("nmin"))
    counts.crossJoin(broadcast(nmin))
      .select(col(stratum), col("n_docs"),
        floor(sqrt(col("nmin").cast("double") / col("n_docs")) * RateGrid)
          .cast("long").as("rate_bp"))
  }

  /** The kept subset of `df` under the temperature rates (md5 ladder on
    * `key`). */
  def temperatureFilter(df: DataFrame, stratum: String, key: String): DataFrame =
    df.join(broadcast(temperatureRates(df, stratum).select(col(stratum), col("rate_bp"))),
        Seq(stratum))
      .filter(TextFns.hash32(col(key).cast("string")) % RateGrid < col("rate_bp"))
      .drop("rate_bp")

  /** Temperature-scaled mixing rates by language + realized kept
    * counts — the registered demonstration query. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val rates = temperatureRates(docs, "lang")
    val kept = docs.join(broadcast(rates), Seq("lang"))
      .filter(TextFns.hash32(col("doc_id").cast("string")) % RateGrid < col("rate_bp"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("rate_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("lang")
  }

  /** SQL mirror of [[temperatureRates]]+[[temperatureFilter]] over a
    * (doc_id, lang, …) relation: CTE chain ending in `tkeep` = the
    * kept doc_ids. Names are `t`-prefixed to compose without clashes. */
  def mixTempCtesFrom(rel: String): String =
    s"""tc AS (SELECT lang, count(*) AS n_docs FROM $rel GROUP BY 1),
          tm AS (SELECT min(n_docs) AS nmin FROM tc),
          trt AS (SELECT lang, n_docs,
                       CAST(floor(sqrt(nmin::DOUBLE / n_docs) * $RateGrid) AS BIGINT) AS rate_bp
                FROM tc, tm),
          tkeep AS (SELECT r.doc_id FROM $rel r JOIN trt USING (lang)
                    WHERE ('0x' || substr(md5(CAST(r.doc_id AS VARCHAR)), 1, 8))::BIGINT
                          % $RateGrid < rate_bp)"""

  private val mixTemperatureOracle: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
          m AS (SELECT min(n_docs) AS nmin FROM c),
          r AS (SELECT lang, n_docs,
                       CAST(floor(sqrt(nmin::DOUBLE / n_docs) * $RateGrid) AS BIGINT) AS rate_bp
                FROM c, m),
          k AS (SELECT d.lang, count(*) AS n_kept
                FROM documents d JOIN r USING (lang)
                WHERE $hashSql % $RateGrid < rate_bp GROUP BY 1)
        SELECT r.lang, r.n_docs, r.rate_bp, coalesce(k.n_kept, 0) AS n_kept
        FROM r LEFT JOIN k USING (lang) ORDER BY lang"""

  /** DSIR importance weights over any (doc_id, lang, text) frame:
    * hashed-unigram LLR of target (`en`) vs raw, Laplace-smoothed,
    * 1e-6-grid-floored per bucket so the per-doc Σ n·lr is exact
    * integer math. Returns (doc_id, lang, w_micro). */
  def dsirWeights(docs: DataFrame): DataFrame = {
    val B = DsirBuckets
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), col("lang"),
        (TextFns.hash32(col("t")) % B).as("f"))
    val dfb = tok.groupBy("doc_id", "lang", "f").agg(count(lit(1)).as("n"))
    val stats = dfb.groupBy("f").agg(
      sum(when(col("lang") === TargetLang, col("n")).otherwise(0L)).as("ct"),
      sum(when(col("lang") =!= TargetLang, col("n")).otherwise(0L)).as("cr"))
    val tot = stats.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val lr = stats.crossJoin(broadcast(tot)).select(col("f"),
      floor((log((col("ct") + 1).cast("double") / (col("tt") + B)) -
             log((col("cr") + 1).cast("double") / (col("tr") + B))) * DsirGrid)
        .cast("long").as("lr"))
    dfb.join(broadcast(lr), Seq("f"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("n") * col("lr")).as("w_micro"))
  }

  /** keep = w > 0 (more target-like than raw-like) — a threshold, not
    * a global sort, so selection is a scan at any scale. */
  def dsir(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), col("w_micro"),
        (col("w_micro") > 0).as("keep"))
      .orderBy("doc_id")

  /** SQL mirror of [[dsirWeights]] over a (doc_id, lang, text)
    * relation: CTE chain ending in `dsirw` = (doc_id, lang, w_micro).
    * Names are `ds`-prefixed to compose without clashes. */
  def dsirCtesFrom(rel: String): String = {
    val B = DsirBuckets
    s"""dstok AS (SELECT doc_id, lang,
                         ('0x' || substr(md5(t), 1, 8))::BIGINT % $B AS f
                  FROM (SELECT doc_id, lang,
                               unnest(string_split(text, ' ')) AS t
                        FROM $rel)),
          dsdfb AS MATERIALIZED (SELECT doc_id, lang, f, count(*) AS n
                  FROM dstok GROUP BY 1, 2, 3),
          dsst AS (SELECT f,
                          sum(CASE WHEN lang = '$TargetLang' THEN n ELSE 0 END) AS ct,
                          sum(CASE WHEN lang <> '$TargetLang' THEN n ELSE 0 END) AS cr
                   FROM dsdfb GROUP BY 1),
          dstt AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM dsst),
          dslr AS (SELECT f,
                          CAST(floor((ln((ct + 1)::DOUBLE / (tt + $B)) -
                                      ln((cr + 1)::DOUBLE / (tr + $B))) * $DsirGrid) AS BIGINT) AS lr
                   FROM dsst, dstt),
          dsirw AS (SELECT doc_id, lang, CAST(sum(n * lr) AS BIGINT) AS w_micro
                    FROM dsdfb JOIN dslr USING (f) GROUP BY 1, 2)"""
  }

  private val dsirOracle: String =
    s"""WITH ${dsirCtesFrom("documents")}
        SELECT doc_id, lang, w_micro, w_micro > 0 AS keep FROM dsirw ORDER BY doc_id"""

  /** Temperature mixing WITH UPSAMPLING (the full UNIMAX shape):
    * per-language targets ∝ √n scaled to preserve the corpus total
    * (head languages shrink, tail languages REPLICATE — what
    * downsample-only mixing cannot do). Integer ladder throughout:
    * √n floored onto a 1e-6 grid, S = Σ exact; target = N·s/S by
    * BIGINT division; each doc emits ⌊target/n⌋ copies plus one more
    * when its hash lands under the remainder — deterministic
    * fractional replication, the same rule handles both up- and
    * down-sampling. The registered query EMITS the replicated rows
    * (sequence-explode — the plan a training run would consume) and
    * reports per-language realized counts; the oracle computes the
    * identical count in closed form (copies·n + \|{hash < rem}\|). */
  val SqrtGrid = 1000000L
  def mixUpsample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("s", floor(sqrt(col("n_docs").cast("double")) * SqrtGrid).cast("long"))
    val tot = counts.agg(sum(col("s")).as("ss"), sum(col("n_docs")).as("nn"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("target", expr("(nn * s) div ss"))
      .withColumn("copies", expr("target div n_docs"))
      .withColumn("rem", col("target") % col("n_docs"))
      .select(col("lang"), col("n_docs"), col("target"), col("copies"), col("rem"))
    val emitted = docs.join(broadcast(rates), Seq("lang"))
      .withColumn("k",
        col("copies") + when(
          TextFns.hash32(col("doc_id").cast("string")) % col("n_docs") < col("rem"), 1L)
          .otherwise(0L))
      .filter(col("k") > 0)
      .select(col("lang"), explode(expr("sequence(1, k)")).as("cp"))
      .groupBy("lang").agg(count(lit(1)).as("n_emitted"))
    rates.join(emitted, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("target"),
        coalesce(col("n_emitted"), lit(0L)).as("n_emitted"))
      .orderBy("lang")
  }

  private val mixUpsampleOracle: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs,
                          CAST(floor(sqrt(count(*)::DOUBLE) * $SqrtGrid) AS BIGINT) AS s
                   FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(s) AS BIGINT) AS ss, CAST(sum(n_docs) AS BIGINT) AS nn FROM c),
          r AS (SELECT lang, n_docs,
                       (nn * s) // ss AS target,
                       ((nn * s) // ss) // n_docs AS copies,
                       ((nn * s) // ss) % n_docs AS rem
                FROM c, t),
          e AS (SELECT d.lang, count(*) FILTER (
                        ($hashSql % r.n_docs) < r.rem) AS n_extra,
                       count(*) AS n
                FROM documents d JOIN r USING (lang) GROUP BY 1)
        SELECT r.lang, r.n_docs, r.target,
               CAST(r.copies * e.n + e.n_extra AS BIGINT) AS n_emitted
        FROM r JOIN e USING (lang) ORDER BY lang"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("cur_mix_temperature", mixTemperature, Some(mixTemperatureOracle)),
    QueryDef("cur_mix_upsample", mixUpsample, Some(mixUpsampleOracle)),
    QueryDef("cur_dsir", dsir, Some(dsirOracle)),
  )
}
