package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixing
import graft.sources.IoRoundtrip

/** io_format_roundtrip + cur_mix_upsample behavior. */
class IoMixSpec extends SparkSpec {

  test("roundtrip: every format preserves count, chars and text-hash sum") {
    val rows = IoRoundtrip.roundtrip(spark, sf).collect()
    assert(rows.map(_.getAs[String]("format")).toSet == IoRoundtrip.Formats.toSet)
    // all formats agree with the parquet source of truth
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count()
    val chars = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == n, s"${r.getString(0)} lost rows")
      assert(r.getAs[Long]("sum_chars") == chars, s"${r.getString(0)} lost chars")
    }
    // text hash sums identical across formats (content identical)
    assert(rows.map(_.getAs[Long]("text_hash_sum")).distinct.length == 1)
  }

  test("upsample: tail languages replicate, head shrinks, total preserved") {
    val out = Mixing.mixUpsample(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val targets = out.map(_.getAs[Long]("target")).sum
    // integer ladder rounds each target down — at most |langs| docs lost
    assert(total - targets >= 0 && total - targets <= out.length.toLong)
    val byN = out.sortBy(_.getAs[Long]("n_docs"))
    val smallest = byN.head
    val largest = byN.last
    assert(smallest.getAs[Long]("n_emitted") > smallest.getAs[Long]("n_docs"),
      s"tail language not upsampled: $smallest")
    assert(largest.getAs[Long]("n_emitted") < largest.getAs[Long]("n_docs"),
      s"head language not downsampled: $largest")
    // realized counts stay near their targets (hash-remainder variance)
    out.foreach { r =>
      val (t, e, nd) = (r.getAs[Long]("target"), r.getAs[Long]("n_emitted"),
        r.getAs[Long]("n_docs"))
      val rem = t % nd
      val sigma = math.sqrt(rem.toDouble * math.max(0.01, 1.0 - rem.toDouble / nd))
      assert(math.abs(e - t) <= 4 * sigma + 2, s"${r.getString(0)}: emitted $e vs target $t")
    }
  }
}
