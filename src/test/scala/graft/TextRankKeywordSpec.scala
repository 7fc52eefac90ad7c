package graft

import org.apache.spark.sql.functions._
import graft.operators.TextRank
import graft.sources.Tables

/** TextRank keyword extraction: structural properties of the damped
  * co-occurrence PageRank (value parity vs DuckDB is the Verify gate). */
class TextRankKeywordSpec extends SparkSpec {

  test("text_textrank: top-k shape, positive damped scores, determinism") {
    val out = TextRank.textTextrank(spark, sf).collect()
    assert(out.length == TextRank.TrTopK)
    assert(out.map(_.getLong(0)).toSeq == (1L to TextRank.TrTopK.toLong))
    // damped PageRank floor: every score ≥ (1-d); scores strictly ranked
    // non-increasing in the rounded value with term tie-break
    val scores = out.map(_.getDouble(2))
    assert(scores.forall(_ >= 1 - TextRank.TrDamping))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val again = TextRank.textTextrank(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("text_rake: phrases are stopword-free runs, k rows, deterministic") {
    val out = TextRank.textRake(spark, sf).collect()
    assert(out.length == TextRank.RakeTopK)
    for (r <- out) {
      val words = r.getString(1).split(" ")
      assert(words.nonEmpty && words.forall(w => !TextRank.RakeStop.contains(w)),
        s"phrase '${r.getString(1)}' contains a stopword delimiter")
      assert(r.getDouble(2) > 0)
    }
    val again = TextRank.textRake(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("text_textrank ranks high-degree hub terms above rare terms") {
    // the rank-1 term must be among the top-5 most frequent corpus
    // tokens: on a co-occurrence graph with near-uniform attachment,
    // TextRank correlates with weighted degree — a rank-1 term from the
    // frequency tail would mean the iteration is wrong
    val top = TextRank.textTextrank(spark, sf)
      .filter(col("rnk") === 1).collect().head.getString(1)
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("t").count().orderBy(col("count").desc)
      .limit(5).collect().map(_.getString(0)).toSet
    assert(freq.contains(top), s"rank-1 term '$top' not in top-5 by frequency $freq")
  }
}
