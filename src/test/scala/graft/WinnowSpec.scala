package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Winnowing fingerprint substring dedup (GraftOps.winnowFingerprints /
  * winnowPairs): the MOSS guarantee, tie-breaks, the hot-fingerprint df
  * cap, and short-doc edges. */
class WinnowSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val K = 4
  private val W = 4
  // winnowing guarantee: any shared run of ≥ W + K - 1 tokens shares a
  // selected fingerprint
  private val GuaranteeLen = W + K - 1

  test("docs sharing a >= (w+k-1)-token run always share a fingerprint") {
    // ten doc pairs, each sharing one planted 7-token run embedded in
    // otherwise-disjoint token streams (tokens unique per doc via a
    // doc-specific prefix, so ONLY the planted run can match)
    val docs = (0 until 10).flatMap { p =>
      val run = (0 until GuaranteeLen).map(j => s"run${p}_$j").mkString(" ")
      Seq(
        (2L * p, ((0 until 12).map(j => s"a${p}_$j") :+ run).mkString(" ")),
        (2L * p + 1, (run +: (0 until 12).map(j => s"b${p}_$j")).mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = GraftOps.winnowPairs(docs, "doc_id", "text", K, W,
        minShared = 1, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { p =>
      assert(pairs.contains((2L * p, 2L * p + 1)),
        s"pair $p with a planted $GuaranteeLen-token run not detected")
    }
    // no cross-pair false positives: every token stream is disjoint
    assert(pairs.size == 10, s"unexpected extra pairs: $pairs")
  }

  test("disjoint docs share no fingerprints; short docs yield none") {
    val docs = Seq(
      (1L, (0 until 20).map(j => s"x$j").mkString(" ")),
      (2L, (0 until 20).map(j => s"y$j").mkString(" ")),
      (3L, "only three tokens"), // < k tokens: no shingles
      (4L, "five tokens just under win" + " pad")) // 6 toks → 3 shingles < w
      .toDF("doc_id", "text")
    assert(GraftOps.winnowPairs(docs, "doc_id", "text", K, W, 1, 100).count() == 0)
    val fps = GraftOps.winnowFingerprints(docs, "doc_id", "text", K, W)
    assert(fps.filter(col("doc_id") >= 3).count() == 0,
      "sub-window docs must produce no fingerprints")
  }

  test("sketch is a subset of shingle hashes and ~2/(w+1) dense") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val fps = GraftOps.winnowFingerprints(docs, "doc_id", "text", K, W)
    val sh = GraftOps.shingleSet(docs, "doc_id", "text", K)
      .select(col("doc_id"), graft.functions.TextFns.hash32(col("sh")).as("fp"))
    // every selected fingerprint is a real shingle hash of the same doc
    assert(fps.join(sh, Seq("doc_id", "fp"), "left_anti").count() == 0)
    // density: expected fraction 2/(w+1) of positions; allow wide slack
    val nFp = fps.count().toDouble
    val nSh = sh.count().toDouble
    assert(nFp < nSh, "sketch must be smaller than the shingle set")
    assert(nFp > nSh / (4.0 * (W + 1)), s"sketch too sparse: $nFp of $nSh")
  }

  test("hot fingerprints above the df cap never generate pairs") {
    // one boilerplate 7-token phrase in EVERY doc; maxDf below the doc
    // count must kill all pairs from it
    val phrase = (0 until GuaranteeLen).map(j => s"boiler$j").mkString(" ")
    val docs = (0 until 8).map { i =>
      (i.toLong, ((0 until 10).map(j => s"u${i}_$j") :+ phrase).mkString(" "))
    }.toDF("doc_id", "text")
    val capped = GraftOps.winnowPairs(docs, "doc_id", "text", K, W,
      minShared = 1, maxDf = 4)
    assert(capped.count() == 0, "df-capped phrase still produced pairs")
    val uncapped = GraftOps.winnowPairs(docs, "doc_id", "text", K, W,
      minShared = 1, maxDf = 100)
    assert(uncapped.count() == 8L * 7 / 2, "uncapped boilerplate must pair all docs")
  }
}
