package graft

import graft.operators.CurationQuality

/** CCNet bucketing: exact terciles per language, monotone score order
  * across buckets (value parity vs DuckDB is the Verify gate). */
class CcnetBucketsSpec extends SparkSpec {

  test("cur_ccnet_buckets: balanced terciles, head ≤ middle ≤ tail scores") {
    val out = CurationQuality.ccnetBuckets(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    for ((lang, rows) <- out.groupBy(_._2)) {
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
      val n = rows.length
      // integer tercile split: each bucket holds ⌊n/3⌋ or ⌈n/3⌉
      for (b <- Seq("head", "middle", "tail"))
        assert(math.abs(sizes.getOrElse(b, 0) - n / 3.0) < 1.0,
          s"$lang/$b size ${sizes.getOrElse(b, 0)} vs n=$n")
      // bucket boundaries respect the score order
      def scores(b: String) = rows.filter(_._4 == b).map(_._3)
      if (scores("head").nonEmpty && scores("tail").nonEmpty)
        assert(scores("head").max <= scores("tail").min + 1e-9)
      if (scores("middle").nonEmpty) {
        if (scores("head").nonEmpty)
          assert(scores("head").max <= scores("middle").min + 1e-9)
        if (scores("tail").nonEmpty)
          assert(scores("middle").max <= scores("tail").min + 1e-9)
      }
    }
    assert(out.map(_._4).toSet == Set("head", "middle", "tail"))
  }
}
