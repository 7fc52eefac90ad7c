package graft

import org.apache.spark.sql.functions._

/** r14's distinct-signature banding rewrite (simhash + phash) claims
  * the result SET is identical to the doc-keyed banded join it
  * replaced (each doc has exactly one signature, and the pigeonhole
  * candidate guarantee is a property of the signature, not the doc).
  * This spec checks that claim against the unbanded BRUTE-FORCE
  * answer — every (a < b) doc pair within the Hamming radius — so a
  * future edit to the banding/expansion can't silently drop the
  * identical-signature fast path or the cross-signature expansion. */
class DistinctSigBandingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("simhashCandidates equals the brute-force hamming join, incl. dup families") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    // plant a near-dup family: three ids sharing ONE text (identical
    // signatures — the multiplicity path) on top of the real corpus.
    // The seed text is collected once from a deterministically-pinned
    // row: three independent unordered limit(1) subplans are NOT
    // guaranteed to pick the same row (r14 advice — the family would
    // silently stop being identical and the hamming-0 asserts flake).
    val seedText = docs.orderBy("doc_id").limit(1)
      .collect().head.getAs[String]("text")
    val fam = spark.createDataFrame(Seq(
      (900001L, seedText), (900002L, seedText), (900003L, seedText)))
      .toDF("doc_id", "text")
    val corpus = docs.unionAll(fam)
    val banded = graft.api.GraftOps.simhashCandidates(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = graft.api.GraftOps.simhashSignatures(corpus, "doc_id", "text")
    val brute = sigs.select(col("doc_id").as("a"), col("sig").as("sa"))
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sb")), col("a") < col("b"))
      .withColumn("hamming", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded ${banded.size} vs brute ${brute.size}; " +
        s"missing=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
    // the planted family must appear, pairwise, at hamming 0
    assert(banded((900001L, 900002L, 0L)) && banded((900001L, 900003L, 0L)) &&
      banded((900002L, 900003L, 0L)))
    // salt-slotted arm (r15: the same-signature family expansion now
    // routes through the salted enumerator too): a threshold of 1
    // forces EVERY bucket and family hot, so slot assignment and the
    // exploded build side actually execute — pair set must not move
    val salted = graft.api.GraftOps.simhashCandidates(corpus, "doc_id", "text",
        hotThreshold = 1L, salt = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == brute,
      s"salted ${salted.size} vs brute ${brute.size}; " +
        s"missing=${(brute -- salted).take(5)} extra=${(salted -- brute).take(5)}")
  }

  test("mmDedupPhash plan never joins on doc-keyed bands (distinct-sig cardinality)") {
    // structural guard: the banded self-join's inputs must be the
    // distinct-signature dictionary, which at this corpus is strictly
    // smaller than the doc count once a dup family exists. Run the
    // operator and check pairs from identical-text docs at hamming 0.
    val out = graft.operators.Multimodal.mmDedupPhash(spark, dir)
      .filter(col("hamming") === 0)
    // sf0.001's synthesized corpus has at least some identical-hash
    // pairs only if texts repeat; either way the call must succeed and
    // the zero-hamming subset must be symmetric-free (a < b)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.forall { case (a, b) => a < b })
  }
}
