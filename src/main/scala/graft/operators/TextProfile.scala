package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
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

  val defs: Seq[QueryDef] = Seq(
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
