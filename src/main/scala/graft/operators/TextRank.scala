package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Term-weighting / ranked retrieval over `documents` — the scoring layer
  * the reference's inverted index (a3/BuildInvertedIndexCompressed.java)
  * exists to serve; the reference stops at boolean retrieval
  * (a3/BooleanRetrievalCompressed.java), we add the standard ranked forms.
  *
  * Spark-first shape: one tokenize, one (term, doc) groupBy for tf, a
  * window (or second small groupBy) for df, then pure column arithmetic —
  * shuffle volume ∝ postings (|distinct (term,doc)|), never corpus bytes.
  * Ranking happens on values ROUNDED to 6dp with full tie-breaks so float
  * last-ulp differences can't flip a rank across engines.
  *
  * Scale: tf+df is the inverted-index build (map-side partial agg); the
  * per-doc top-k window partitions by doc_id so no state concentrates.
  * BM25 needs corpus-level N and avgdl — two scalars, broadcast joined,
  * never collected to the driver.
  */
object TextRank {
  val TopTerms = 5
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 20
  /** Query for BM25 ranking (same vocabulary as boolean retrieval). */
  val QueryTerms: Seq[String] = Seq("spark", "join", "fast")

  private def postings(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term") =!= "")

  /** TF-IDF: top-5 terms per document by tf·ln(N/df)
    * (generic core: [[graft.api.GraftOps.tfidfTopTerms]]). */
  def textTfidf(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps
      .tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text", TopTerms)
      .orderBy("doc_id", "rnk")

  /** BM25 (k1=1.2, b=0.75): top-20 docs for a fixed term query
    * (generic core: [[graft.api.GraftOps.bm25Rank]]). */
  def textBm25(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps
      .bm25Rank(Tables.documents(spark, dir), "doc_id", "text", QueryTerms,
        Bm25TopK, Bm25K1, Bm25B)

  private val termList = QueryTerms.map(t => s"'$t'").mkString(", ")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("text_tfidf", textTfidf, Some(
      s"""WITH post AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           tf AS (SELECT term, doc_id, count(*) AS tf FROM post WHERE term <> '' GROUP BY 1, 2),
           d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
           n AS (SELECT count(*) AS n_docs FROM documents),
           s AS (SELECT doc_id, term, tf, df,
                        round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
                 FROM d, n),
           r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS BIGINT) AS rnk FROM s)
          SELECT doc_id, rnk, term, tf, df, tfidf FROM r
          WHERE rnk <= $TopTerms ORDER BY doc_id, rnk""")),
    QueryDef("text_bm25", textBm25, Some(
      s"""WITH docs AS (SELECT doc_id,
                        CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS dl
                        FROM documents),
           stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
           post AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM post
                  WHERE term IN ($termList) GROUP BY 1, 2),
           df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           c AS (SELECT tf.doc_id,
                        ln(1.0 + (CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
                          * tf.tf * (CAST($Bm25K1 AS DOUBLE) + 1) /
                          (tf.tf + CAST($Bm25K1 AS DOUBLE) *
                           (1.0 - CAST($Bm25B AS DOUBLE) + CAST($Bm25B AS DOUBLE) * CAST(d.dl AS DOUBLE) / s.avgdl)) AS contrib
                 FROM tf JOIN df ON tf.term = df.term
                 JOIN docs d ON tf.doc_id = d.doc_id, stats s)
          SELECT doc_id, round(sum(contrib), 6) AS bm25, count(*) AS n_terms
          FROM c GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT $Bm25TopK""")),
  )
}
