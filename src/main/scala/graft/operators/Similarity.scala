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
  // multi-table LSH: L tables of b sign-bits each; a candidate needs to
  // collide in ANY table, so top-1 recall ≈ 1-(1-p^b)^L with p the
  // per-plane agreement probability — 8×6 puts useful recall at the
  // cos ≈ 0.4–0.5 neighbors this corpus actually has
  val NumTables = 8
  val BitsPerTable = 6

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

  /** ANN via multi-table LSH: candidates collide with the query in ANY
    * of the NumTables sign-bit buckets (native `lsh_bucket` expression,
    * one seed per table), then exact cosine + top-k over the candidate
    * union. Shuffle volume ∝ tables × docs, never docs². */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e0 = emb(spark, dir)
    val buckets = (0 until NumTables).map(t =>
      expr(s"lsh_bucket(v, $BitsPerTable, 64, $t)").as(s"b$t"))
    val e = e0.select(col("vec_id") +: col("v") +: buckets: _*)
    val q = e.filter(col("vec_id") < NumQueries)
    // candidate union across tables: dedup on the bare id pair (the
    // vectors are functionally determined by the ids — carrying them
    // through the distinct would shuffle ~64 doubles per row per table),
    // then join the vectors back once
    val ids = (0 until NumTables).map { t =>
      e.select(col("vec_id"), col(s"b$t").as("bv"))
        .join(broadcast(q.select(col("vec_id").as("qid"), col(s"b$t").as("bv"))), Seq("bv"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"))
    }.reduce(_ unionAll _).distinct()
    val cand = ids
      .join(broadcast(q.select(col("vec_id").as("qid"), col("v").as("qv"))), Seq("qid"))
      .join(e0, Seq("vec_id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"), round(col("cos"), 6).as("cos"))
      .orderBy("qid", "rnk")
  }

  /** ANN via IVF (inverted-file index, training-free): every 50th vector
    * is a "centroid"; vectors are assigned to their nearest centroid
    * (one broadcast pass), and each query probes only its own NProbe
    * nearest centroid cells. At scale the assignment is a map-side pass
    * and the search shuffles only the probed cells — candidate count ∝
    * corpus/|centroids| · NProbe, not the corpus. */
  val CentroidEvery = 50
  val NProbe = 2
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") % CentroidEvery === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    // cell assignment: nearest centroid per vector (broadcast argmax)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    val assigned = e.join(broadcast(cents), lit(true))
      .withColumn("csim", expr("cosine_sim(v, cv)"))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
    // queries probe their NProbe nearest cells
    val qw = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
      .join(broadcast(cents), lit(true))
      .withColumn("csim", expr("cosine_sim(qv, cv)"))
      .withColumn("crnk", row_number().over(qw))
      .filter(col("crnk") <= NProbe)
      .select(col("qid"), col("qv"), col("cid"))
    val rw = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rnk", row_number().over(rw).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"), round(col("cos"), 6).as("cos"))
      .orderBy("qid", "rnk")
  }

  /** Radius (range) search: every corpus vector within cosine ≥ Radius
    * of each query — the fixed-threshold complement of top-k (recall
    * jobs want "all sufficiently-similar", not "best k"). Same broadcast
    * query-side scan shape as top-k; the per-query WINDOW disappears,
    * so this is a pure map-side filter over the corpus — at 100 TB it
    * runs at scan speed with zero shuffle before the final collect. */
  val Radius = 0.25
  def cosineRadius(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", round(expr("cosine_sim(qv, v)"), 6))
      .filter(col("cos") >= Radius)
      .select(col("qid"), col("vec_id").as("neighbor"), col("cos"))
      .orderBy("qid", "neighbor")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("sim_radius", cosineRadius, Some(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < $NumQueries),
            c AS (SELECT q.qid, e.vec_id AS neighbor,
                         round(list_dot_product(q.qv, e.v) /
                           (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cos
                  FROM q, e WHERE e.vec_id <> q.qid)
          SELECT qid, neighbor, cos FROM c WHERE cos >= $Radius
          ORDER BY qid, neighbor""")),
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
    QueryDef("sim_ann_ivf", annIvf, None),
  )
}
