package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps.implicits._

/** Behaviors that matter at cluster scale, exercised at toy scale:
  * AQE skew-join splitting, and graceful handling of empty inputs. */
class ScaleBehaviorSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // one pathological key carrying ~99% of the rows
      val skewed = spark.range(200000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("dv"))
      val joined = skewed.join(dim, "k")
      // drive joined's OWN queryExecution (count() would plan separately)
      assert(joined.queryExecution.executedPlan.executeCollect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew handling in final plan:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("salted join neutralizes the same skew without AQE") {
    val skewed = spark.range(10000).select(lit(1L).as("k"), col("id").as("payload"))
    val dim = Seq((1L, "hot")).toDF("k", "dv")
    assert(skewed.saltedJoin(dim, "k", salt = 16).count() == 10000)
  }

  test("generic operators return empty results (not errors) on empty input") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(emptyDocs.dedupExact("doc_id", "text").count() == 0)
    assert(emptyDocs.ngramJaccardPairs("doc_id", "text").count() == 0)
    assert(emptyDocs.minhashCandidates("doc_id", "text").count() == 0)
    assert(emptyDocs.simhashCandidates("doc_id", "text").count() == 0)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(emptyVecs.cosineTopK("vec_id", "embedding", emptyVecs).count() == 0)
  }

  test("single-token and empty-string documents don't break the text pipeline") {
    val weird = Seq((1L, ""), (2L, "solo"), (3L, "a b")).toDF("doc_id", "text")
    assert(weird.ngramJaccardPairs("doc_id", "text").count() == 0) // no 3-grams exist
    val sigs = weird.simhashCandidates("doc_id", "text")
    assert(sigs.count() >= 0) // no throw; empty-string doc contributes no tokens
  }

  test("round-4-late operators return empty results (not errors) on empty input") {
    import graft.api.GraftOps
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(GraftOps.winnowPairs(emptyDocs, "doc_id", "text").count() == 0)
    assert(GraftOps.containmentPairs(emptyDocs, "doc_id", "text").count() == 0)
    val emptyEdges = Seq.empty[(Long, Long, Long)].toDF("s", "d", "w")
    // SSSP on an empty graph: only the sources themselves, at dist 0
    val d = GraftOps.ssspWeighted(emptyEdges, "s", "d", "w", Seq(7L), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(7L -> 0L))
  }

  test("mini-batch k-means with k larger than the corpus keeps all rows as seeds") {
    import graft.api.GraftOps
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = GraftOps.kmeansMiniBatch(tiny, "vec_id", "embedding",
        k = 5, batches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // both rows seed; every row is absorbed by exactly one centroid
    assert(cents.length == 2 && cents.map(_._2).sum == 2)
  }
}
