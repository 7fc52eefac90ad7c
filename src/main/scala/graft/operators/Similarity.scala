package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Similarity search over the `embeddings` table (array<float>[64]).
  *
  * - `sim_cosine_topk`: brute-force exact top-k — the baseline. The dot
  *   product is a codegen'd `aggregate(zip_with(...))` fold (no UDF);
  *   query vectors are broadcast so the big side streams with zero
  *   shuffle until the per-query top-k.
  * - `sim_ann_lsh`: random-hyperplane LSH (signs of 8 deterministic
  *   pseudo-random hyperplanes → 8-bit bucket). Candidates only within
  *   the query's bucket — the 100 TB path: bucket join instead of a
  *   full cross product. Verified rows-only; the spec measures recall
  *   against the exact baseline.
  */
object Similarity {
  val NumQueries = 10
  val TopK = 5
  val NumPlanes = 8

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  /** Exact cosine top-k for the first NumQueries vector ids. */
  def cosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(spark, dir)
    graft.api.GraftOps.cosineTopK(all, "vec_id", "embedding",
        queries = all.filter(col("vec_id") < NumQueries), k = TopK)
      .orderBy("qid", "rnk")
  }

  /** ANN via LSH buckets: exact cosine, but only within the bucket.
    * Bucketing is the native `lsh_bucket` expression (md5-derived ±1
    * hyperplanes; see functions.LshBucket). */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("bucket", expr(s"lsh_bucket(v, $NumPlanes, 64)"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"), round(col("cos"), 6).as("cos"))
      .orderBy("qid", "rnk")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("sim_cosine_topk", cosineTopk, Some(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $NumQueries),
            c AS (SELECT q.qid, e.vec_id AS neighbor,
                         list_dot_product(q.qv, e.v) /
                           (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
                  FROM q, e WHERE e.vec_id <> q.qid),
            r AS (SELECT qid, neighbor, cos,
                         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, neighbor) AS rnk
                  FROM c)
          SELECT qid, rnk, neighbor, round(cos, 6) AS cos
          FROM r WHERE rnk <= $TopK ORDER BY qid, rnk""")),
    QueryDef("sim_ann_lsh", annLsh, None),
  )
}
