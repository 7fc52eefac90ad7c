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

  /** Temperature-scaled mixing rates by language: rate = √(n_min/n),
    * i.e. post-sample counts ∝ √n (α = 1/2 temperature), smallest
    * language kept whole. √ and ÷ are IEEE correctly-rounded on both
    * engines, so the floored basis-point rate is bit-identical. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val nmin = counts.agg(min(col("n_docs")).as("nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col("lang"), col("n_docs"),
        floor(sqrt(col("nmin").cast("double") / col("n_docs")) * RateGrid)
          .cast("long").as("rate_bp"))
    val kept = docs.join(broadcast(rates), Seq("lang"))
      .filter(TextFns.hash32(col("doc_id").cast("string")) % RateGrid < col("rate_bp"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("rate_bp"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("lang")
  }

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

  /** DSIR importance weights: hashed-unigram LLR of target (`en`) vs
    * raw (everything else), Laplace-smoothed, 1e-6-grid-floored
    * per-bucket so the per-doc Σ n·lr is exact integer math. keep =
    * weight > 0 (more target-like than raw-like) — a threshold, not a
    * global sort, so selection is a scan at any scale. */
  def dsir(spark: SparkSession, dir: String): DataFrame = {
    val B = DsirBuckets
    val tok = Tables.documents(spark, dir)
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
      .select(col("doc_id"), col("lang"), col("w_micro"),
        (col("w_micro") > 0).as("keep"))
      .orderBy("doc_id")
  }

  private val dsirOracle: String = {
    val B = DsirBuckets
    s"""WITH tok AS (SELECT doc_id, lang,
                            ('0x' || substr(md5(t), 1, 8))::BIGINT % $B AS f
                     FROM (SELECT doc_id, lang,
                                  unnest(string_split(text, ' ')) AS t
                           FROM documents)),
          dfb AS (SELECT doc_id, lang, f, count(*) AS n FROM tok GROUP BY 1, 2, 3),
          st AS (SELECT f,
                        sum(CASE WHEN lang = '$TargetLang' THEN n ELSE 0 END) AS ct,
                        sum(CASE WHEN lang <> '$TargetLang' THEN n ELSE 0 END) AS cr
                 FROM dfb GROUP BY 1),
          tt AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM st),
          lr AS (SELECT f,
                        CAST(floor((ln((ct + 1)::DOUBLE / (tt + $B)) -
                                    ln((cr + 1)::DOUBLE / (tr + $B))) * $DsirGrid) AS BIGINT) AS lr
                 FROM st, tt),
          w AS (SELECT doc_id, lang, CAST(sum(n * lr) AS BIGINT) AS w_micro
                FROM dfb JOIN lr USING (f) GROUP BY 1, 2)
        SELECT doc_id, lang, w_micro, w_micro > 0 AS keep FROM w ORDER BY doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("cur_mix_temperature", mixTemperature, Some(mixTemperatureOracle)),
    QueryDef("cur_dsir", dsir, Some(dsirOracle)),
  )
}
