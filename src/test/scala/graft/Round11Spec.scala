package graft

import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Round-11 semantic specs. */
class Round11Spec extends SparkSpec {

  test("dedup_substring_incremental: pairs are TRUE literal overlaps at the reported positions") {
    val dir = "/root/testdata/sf0.01"
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SuffixArray.dedupSubstringIncremental(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (da, pa, db, pb, lcp) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(da % SuffixArray.SampleMod == 0 && db % SuffixArray.SampleMod == SuffixArray.DeltaResidue,
        s"pair ($da, $db) crosses the wrong slices")
      val sa = texts(da).substring(pa.toInt - 1)
      val sb = texts(db).substring(pb.toInt - 1)
      val common = sa.zip(sb).takeWhile { case (x, y) => x == y }.length
      assert(lcp >= SuffixArray.MinRep && common >= lcp,
        s"($da@$pa, $db@$pb): claimed lcp $lcp but true common prefix $common")
      assert(sa.startsWith(r.getString(5)), "snippet is not the shared prefix")
    }
  }

  test("dedup_substring_incremental reuses the persisted base layout (no rebuild)") {
    val dir = "/root/testdata/sf0.01"
    SuffixArray.reset()
    // build once via the full-corpus operator…
    SuffixArray.textSuffixArray(spark, dir).count()
    val built = SuffixArray.suffixRanks(spark, dir)
    // …then the incremental arm must read the SAME memoized table —
    // delta ingestion pays delta-sized work only
    assert(SuffixArray.suffixRanks(spark, dir) eq built,
      "suffixRanks rebuilt instead of reusing the session memo")
    val n = SuffixArray.dedupSubstringIncremental(spark, dir).count()
    assert(SuffixArray.suffixRanks(spark, dir) eq built)
    assert(n > 0)
  }
}
