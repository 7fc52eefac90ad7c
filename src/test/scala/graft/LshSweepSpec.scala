package graft

import graft.api.GraftOps
import graft.sources.Tables

/** Band/row sweep for the MinHash LSH dedup: recall against the exact
  * n-gram-Jaccard ground truth must follow the s-curve theory — more
  * bands (fewer rows each) ⇒ higher recall at the cost of more
  * candidates — and the production config must catch every planted
  * near-dup at the 0.5 threshold. */
class LshSweepSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("recall rises with band count; production 8×2 reaches full recall") {
    val docs = Tables.documents(spark, dir)
    val exact = GraftOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val sweep = Seq((16, 1), (8, 2), (4, 4), (2, 8)).map { case (bands, rows) =>
      val cand = GraftOps.minhashCandidates(docs, "doc_id", "text", 3, bands, rows)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (cand & exact).size.toDouble / exact.size
      info(f"bands=$bands%2d rows=$rows: ${cand.size}%4d candidates, recall $recall%.2f")
      (bands, rows, cand.size, recall)
    }
    val recalls = sweep.map(_._4)
    // monotone non-increasing as rows per band grow (knee moves right)
    assert(recalls == recalls.sorted.reverse, s"recall not monotone: $sweep")
    // candidate volume shrinks the same direction
    val candCounts = sweep.map(_._3)
    assert(candCounts == candCounts.sorted.reverse, s"candidates not monotone: $sweep")
    // the production scheme (8×2, knee ≈ 0.35) must not miss a 0.5-dup
    assert(sweep.find(s => s._1 == 8 && s._2 == 2).get._4 == 1.0)
  }

  /** Corpus with a planted hot bucket: 30 copies of one boilerplate
    * text share EVERY band bucket (the hot-bucket failure mode:
    * C(30,2) pairs on one reducer), plus distinct docs and one normal
    * near-dup pair. */
  private def hotCorpus = {
    import SparkSpec.spark.implicits._
    val boiler = (0L until 30L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val near = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
    val rest = (200L until 220L).map(i => (i, s"unique document number $i with its own content entirely"))
    (boiler ++ near ++ rest).toDF("doc_id", "text")
  }

  test("salted band join ≡ plain band join, with a planted hot bucket") {
    val docs = hotCorpus
    def pairs(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = pairs(GraftOps.minhashCandidates(docs, "doc_id", "text"))
    val salted = pairs(GraftOps.minhashCandidatesSalted(docs, "doc_id", "text",
      hotThreshold = 5, salt = 4))
    assert(plain.nonEmpty && plain.exists(p => p._1 < 30 && p._2 < 30),
      "planted hot bucket produced no pairs — the hot path was not exercised")
    assert(salted == plain, "salting changed the candidate set")
    // threshold above every bucket size ⇒ pure cold path, same answer
    val allCold = pairs(GraftOps.minhashCandidatesSalted(docs, "doc_id", "text",
      hotThreshold = 10000, salt = 4))
    assert(allCold == plain)
  }

  test("the salted enumerator generalizes: simhash and embedding tiers unchanged") {
    import SparkSpec.spark.implicits._
    // simhash: the 30 identical boilerplate docs share one signature →
    // every byte-band bucket is hot at threshold 5
    def simPairs(hot: Long) = GraftOps
      .simhashCandidates(hotCorpus, "doc_id", "text", maxHamming = 3,
        hotThreshold = hot, salt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plainSim = simPairs(Long.MaxValue)
    assert(plainSim.exists(p => p._1 < 30 && p._2 < 30 && p._3 == 0L),
      "planted identical docs produced no Hamming-0 pairs")
    assert(simPairs(5L) == plainSim, "salting changed the simhash pair set")
    // embedding: 16 copies of one vector bucket together in all tables
    val dup = (0L until 16L).map(i => (i, Seq(1.0, 0.5, -0.25, 0.75)))
    val other = (100L until 110L).map(i =>
      (i, Seq(-1.0 + i * 0.01, 0.3, 0.9, -0.6 + i * 0.02)))
    val emb = (dup ++ other).toDF("vec_id", "embedding")
    def embPairs(hot: Long) = GraftOps
      .embeddingNearDupPairs(emb, "vec_id", "embedding", threshold = 0.95,
        tables = 4, bits = 2, dims = 4, hotThreshold = hot, salt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plainEmb = embPairs(Long.MaxValue)
    assert(plainEmb.count(p => p._1 < 16 && p._2 < 16) == 16 * 15 / 2,
      "identical vectors must all pair up")
    assert(embPairs(5L) == plainEmb, "salting changed the embedding pair set")
  }
}
