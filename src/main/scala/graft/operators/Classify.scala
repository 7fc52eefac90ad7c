package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.TextFns

/** Online-SGD logistic regression ("spam classifier").
  *
  * Reference semantics: a5/TrainSpamClassifier.scala:52-90 — a SINGLE
  * sequential SGD pass (delta = 0.002) over instances in input order;
  * the reference forces this with groupByKey(1). We reproduce it with
  * one sorted partition + mapPartitions: identical math, identical
  * visit order, so the weights are deterministic. a5/
  * ApplySpamClassifier.scala:63-81 broadcasts the weight map and scores
  * each instance; a5/ApplyEnsembleSpamClassifier.scala:83-107 adds
  * average/vote combination of several models.
  *
  * Instances are derived from `documents` (no labeled spam corpus in
  * the testdata): label = spam iff doc_id % 3 == 0, features = distinct
  * hashed tokens (hash32 mod 1000) — deterministic, so train → apply is
  * a reproducible end-to-end pipeline.
  *
  * Scale note: sequential SGD is inherently serial — the bottleneck the
  * reference bakes in. At 100 TB you'd switch to minibatch/parameter-
  * averaging (each partition trains, average weights); `trainAveraged`
  * implements that path and the spec checks it agrees with the serial
  * model on sign (prediction) for the test corpus.
  */
object Classify {
  val Delta = 0.002
  val FeatureSpace = 1000

  /** (doc_id, isSpam, features[int], sorted distinct) */
  def instances(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % 3 === 0).as("is_spam"),
        expr(s"array_sort(array_distinct(transform(split(text, ' '), " +
          s"t -> CAST(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % $FeatureSpace AS INT))))")
          .as("features"))

  private def sgd(rows: Iterator[(Long, Boolean, Seq[Int])]): Map[Int, Double] = {
    val w = scala.collection.mutable.Map[Int, Double]()
    rows.foreach { case (_, isSpam, features) =>
      val score = features.iterator.map(f => w.getOrElse(f, 0.0)).sum
      val prob = 1.0 / (1 + math.exp(-score))
      val label = if (isSpam) 1.0 else 0.0
      features.foreach(f => w.update(f, w.getOrElse(f, 0.0) + (label - prob) * Delta))
    }
    w.toMap
  }

  // trained weights memoized per (session, dir): apply/ensemble reuse
  // the model instead of re-running the sequential pass
  private val memo = scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** Drop memoized models (benchmarks call this so a timed pass pays
    * the real training cost). */
  def reset(): Unit = memo.clear()

  /** Serial SGD (reference semantics): 1 partition, doc_id order. */
  def train(spark: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate(spark.sparkContext.applicationId + ":" + dir,
      trainUncached(spark, dir).localCheckpoint())

  private def trainUncached(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    instances(spark, dir)
      .as[(Long, Boolean, Seq[Int])]
      .repartition(1)
      .sortWithinPartitions("doc_id")
      .mapPartitions(rows => sgd(rows).iterator)
      .toDF("feature", "weight")
      .select(col("feature"), round(col("weight"), 6).as("weight"))
      .orderBy("feature")
  }

  /** Shuffled-order serial SGD — the reference's `--shuffle` option
    * (a5/TrainSpamClassifier.scala:19,44-45: instances get a random
    * sort key before the single sequential pass). The reference draws
    * Random.nextInt; we key on md5(doc_id) so the "random" visit order
    * is deterministic — reproducible weights, spec-bounded agreement
    * with the doc_id-order model (SGD visit order shifts float values
    * but rarely flips predictions). */
  def trainShuffled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    instances(spark, dir)
      .withColumn("__shuf", md5(col("doc_id").cast("string")))
      .repartition(1)
      .sortWithinPartitions("__shuf", "doc_id")
      .select(col("doc_id"), col("is_spam"), col("features"))
      .as[(Long, Boolean, Seq[Int])]
      .mapPartitions(rows => sgd(rows).iterator)
      .toDF("feature", "weight")
      .select(col("feature"), round(col("weight"), 6).as("weight"))
      .orderBy("feature")
  }

  /** Parameter-averaged SGD: each partition runs the serial pass on its
    * shard, weights averaged — the distributed path for large corpora. */
  def trainAveraged(spark: SparkSession, dir: String, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    instances(spark, dir)
      .as[(Long, Boolean, Seq[Int])]
      // hash repartition, NOT repartitionByRange: range bounds come from
      // seed-varying reservoir sampling, which would shuffle boundary
      // docs between shards across runs and make the averaged weights
      // nondeterministic — hash(doc_id) % n is fixed on any cluster
      .repartition(partitions, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .mapPartitions(rows => sgd(rows).iterator)
      .toDF("feature", "w")
      .groupBy("feature")
      .agg(round(sum(col("w")) / partitions, 6).as("weight"))
      .orderBy("feature")
  }

  /** Score all instances with the serially-trained model (broadcast join
    * of the tiny weight table onto exploded features). */
  def apply_(spark: SparkSession, dir: String): DataFrame = {
    val w = train(spark, dir)
    val feat = instances(spark, dir)
      .select(col("doc_id"), col("is_spam"), explode(col("features")).as("feature"))
    feat.join(broadcast(w), Seq("feature"), "left")
      .groupBy("doc_id", "is_spam")
      .agg(round(sum(coalesce(col("weight"), lit(0.0))), 6).as("score"))
      .withColumn("predicted", col("score") > 0)
      .orderBy("doc_id")
  }

  /** Ensemble (reference a5/ApplyEnsembleSpamClassifier.scala:83-107):
    * N models trained on disjoint shards, combined by score-average AND
    * by ±1 vote — the reference loads an arbitrary model directory, so
    * the shard count is a parameter, not a constant. Shard key
    * (doc_id div n) % n mixes labels across shards (doc_id % n would
    * put every spam doc in one shard for n = 3). */
  def ensembleN(spark: SparkSession, dir: String, n: Int): DataFrame = {
    require(n >= 1, s"ensemble needs at least one shard, got $n")
    import spark.implicits._
    val inst = instances(spark, dir)
    val models = (0 until n).map { s =>
      inst.filter(expr(s"(doc_id div $n) % $n = $s"))
        .as[(Long, Boolean, Seq[Int])]
        .repartition(1).sortWithinPartitions("doc_id")
        .mapPartitions(rows => sgd(rows).iterator)
        .toDF("feature", "w")
        // models store 6dp-rounded weights, same as the serial train()
        .select(col("feature"), round(col("w"), 6).as(s"w$s"))
    }
    val feat = inst.select(col("doc_id"), col("is_spam"), explode(col("features")).as("feature"))
    val scored = models.foldLeft(feat) { case (d, m) =>
      d.join(broadcast(m), Seq("feature"), "left")
    }
    val shardSums = (0 until n).map(s => sum(coalesce(col(s"w$s"), lit(0.0))).as(s"s$s"))
    val avg = (0 until n).map(s => col(s"s$s")).reduce(_ + _) / n
    val votes = (0 until n).map(s => when(col(s"s$s") > 0, 1).otherwise(-1)).reduce(_ + _)
    scored
      .groupBy("doc_id", "is_spam")
      .agg(shardSums.head, shardSums.tail: _*)
      .select(col("doc_id"), col("is_spam"),
        round(avg, 6).as("score_avg"),
        votes.cast("long").as("votes"))
      .withColumn("predicted_avg", col("score_avg") > 0)
      .withColumn("predicted_vote", col("votes") > 0)
      .orderBy("doc_id")
  }

  /** The registered 3-shard instance of [[ensembleN]]. */
  def ensemble(spark: SparkSession, dir: String): DataFrame =
    ensembleN(spark, dir, 3)

  /** Multinomial Naive Bayes with add-one smoothing — the classical
    * counting classifier, and (unlike sequential SGD) fully expressible
    * as relational aggregation, so train AND apply verify exactly
    * against the DuckDB oracle. Same synthetic labels as the SGD tier.
    * Scale: training is one groupBy over token occurrences (map-side
    * partial counts; shuffle ∝ vocabulary); scoring joins the broadcast
    * model onto exploded tokens — no serial bottleneck anywhere, the
    * shape sequential SGD can't achieve. */
  def nbModel(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 3 === 0).as("is_spam"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val counts = tok.groupBy("t").agg(
      sum(when(col("is_spam"), 1L).otherwise(0L)).as("cs"),
      sum(when(!col("is_spam"), 1L).otherwise(0L)).as("ch"))
    val tot = counts.agg(sum(col("cs")).as("ns"), sum(col("ch")).as("nh"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("t"),
        round(log((col("cs") + 1) / (col("ns") + col("v"))), 6).as("ll_spam"),
        round(log((col("ch") + 1) / (col("nh") + col("v"))), 6).as("ll_ham"))
  }

  def nbTrain(spark: SparkSession, dir: String): DataFrame =
    nbModel(spark, dir).orderBy("t")

  /** Score every doc with the trained model: per-token log-likelihoods
    * (the ROUNDED model values, so both engines sum identical numbers)
    * plus class log-priors; argmax prediction. */
  def nbApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 3 === 0).as("is_spam"))
    val priors = docs.agg(
      log(sum(when(col("is_spam"), 1L).otherwise(0L)) / count(lit(1))).as("lp_spam"),
      log(sum(when(!col("is_spam"), 1L).otherwise(0L)) / count(lit(1))).as("lp_ham"))
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    tok.join(broadcast(nbModel(spark, dir)), "t")
      .groupBy("doc_id")
      .agg(sum(col("ll_spam")).as("ss"), sum(col("ll_ham")).as("sh"))
      .crossJoin(broadcast(priors))
      .join(docs, "doc_id")
      .select(col("doc_id"), col("is_spam"),
        (col("ss") + col("lp_spam") > col("sh") + col("lp_ham")).as("predicted"))
      .withColumn("correct", col("predicted") === col("is_spam"))
      .orderBy("doc_id")
  }

  private val nbModelSql: String =
    """tok AS (SELECT doc_id, doc_id % 3 = 0 AS is_spam, u.t AS t
              FROM documents, unnest(string_split(text, ' ')) AS u(t)
              WHERE u.t <> ''),
       counts AS MATERIALIZED (SELECT t,
                 count(*) FILTER (is_spam) AS cs,
                 count(*) FILTER (NOT is_spam) AS ch
                 FROM tok GROUP BY 1),
       tot AS (SELECT sum(cs) AS ns, sum(ch) AS nh, count(*) AS v FROM counts),
       model AS MATERIALIZED (SELECT t,
                round(ln((cs + 1) / (CAST(ns AS DOUBLE) + v)), 6) AS ll_spam,
                round(ln((ch + 1) / (CAST(nh AS DOUBLE) + v)), 6) AS ll_ham
                FROM counts, tot)"""

  // rows oracles for the by-design rows-only tier: SGD float weights
  // aren't SQL-expressible, but the model's ROW COUNT is — one weight
  // per distinct hashed feature over the corpus (sgd touches every
  // feature it sees), replayed with the identical md5-mod-1000 hash
  private val nFeaturesSql =
    s"""SELECT count(DISTINCT ('0x' || substr(md5(t), 1, 8))::BIGINT % $FeatureSpace)
          AS expected_rows
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)"""
  private val nDocsSql =
    "SELECT count(*) AS expected_rows FROM documents"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("spam_train", train, None, rowsOracle = Some(nFeaturesSql)),
    QueryDef("spam_train_shuffled", trainShuffled, None, rowsOracle = Some(nFeaturesSql)),
    QueryDef("spam_train_avg", (s: SparkSession, d: String) => trainAveraged(s, d), None,
      rowsOracle = Some(nFeaturesSql)),
    QueryDef("spam_apply", apply_, None, rowsOracle = Some(nDocsSql)),
    QueryDef("spam_ensemble", ensemble, None, rowsOracle = Some(nDocsSql)),
    QueryDef("spam_nb_train", nbTrain, Some(
      s"""WITH $nbModelSql
          SELECT t, ll_spam, ll_ham FROM model ORDER BY t""")),
    QueryDef("spam_nb_apply", nbApply, Some(
      s"""WITH $nbModelSql,
           docs AS (SELECT doc_id, doc_id % 3 = 0 AS is_spam FROM documents),
           priors AS (SELECT ln(count(*) FILTER (is_spam) / CAST(count(*) AS DOUBLE)) AS lp_spam,
                             ln(count(*) FILTER (NOT is_spam) / CAST(count(*) AS DOUBLE)) AS lp_ham
                      FROM docs),
           scores AS (SELECT tok.doc_id, sum(m.ll_spam) AS ss, sum(m.ll_ham) AS sh
                      FROM tok JOIN model m ON tok.t = m.t GROUP BY 1)
          SELECT d.doc_id, d.is_spam,
                 (s.ss + p.lp_spam > s.sh + p.lp_ham) AS predicted,
                 (s.ss + p.lp_spam > s.sh + p.lp_ham) = d.is_spam AS correct
          FROM scores s JOIN docs d ON s.doc_id = d.doc_id, priors p
          ORDER BY d.doc_id""")),
  )
}
