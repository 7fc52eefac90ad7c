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

  /** Parameter-averaged SGD: each partition runs the serial pass on its
    * shard, weights averaged — the distributed path for large corpora. */
  def trainAveraged(spark: SparkSession, dir: String, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    instances(spark, dir)
      .as[(Long, Boolean, Seq[Int])]
      .repartitionByRange(partitions, col("doc_id"))
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
    * three models trained on disjoint shards, combined by score-average
    * AND by ±1 vote. Shard key (doc_id div 3) % 3 mixes labels across
    * shards (doc_id % 3 would put every spam doc in one shard). */
  def ensemble(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val inst = instances(spark, dir)
    val models = (0 until 3).map { s =>
      inst.filter(expr(s"(doc_id div 3) % 3 = $s"))
        .as[(Long, Boolean, Seq[Int])]
        .repartition(1).sortWithinPartitions("doc_id")
        .mapPartitions(rows => sgd(rows).iterator)
        .toDF("feature", s"w$s")
    }
    val feat = inst.select(col("doc_id"), col("is_spam"), explode(col("features")).as("feature"))
    val scored = models.zipWithIndex.foldLeft(feat) { case (d, (m, i)) =>
      d.join(broadcast(m), Seq("feature"), "left")
    }
    scored
      .groupBy("doc_id", "is_spam")
      .agg(
        sum(coalesce(col("w0"), lit(0.0))).as("s0"),
        sum(coalesce(col("w1"), lit(0.0))).as("s1"),
        sum(coalesce(col("w2"), lit(0.0))).as("s2"))
      .select(col("doc_id"), col("is_spam"),
        round((col("s0") + col("s1") + col("s2")) / 3, 6).as("score_avg"),
        (when(col("s0") > 0, 1).otherwise(-1) +
         when(col("s1") > 0, 1).otherwise(-1) +
         when(col("s2") > 0, 1).otherwise(-1)).cast("long").as("votes"))
      .withColumn("predicted_avg", col("score_avg") > 0)
      .withColumn("predicted_vote", col("votes") > 0)
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("spam_train", train, None),
    QueryDef("spam_apply", apply_, None),
    QueryDef("spam_ensemble", ensemble, None),
  )
}
