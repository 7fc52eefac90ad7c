package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Bpe

/** BPE tokenizer training: hand-checked merge choice and greedy-
  * leftmost overlap handling on crafted dictionaries; corpus training
  * yields a full merge ladder that actually compresses. */
class BpeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def dictDf(ws: Seq[(String, Long)]) = {
    val rows = ws.map { case (w, f) => org.apache.spark.sql.Row(w, f) }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("w", StringType), StructField("freq", LongType))))
  }

  test("first merges follow weighted pair frequency with deterministic tie-break") {
    // 'abab'×10 + 'ab'×5: (a,b) appears 2·10 + 1·5 = 25 — the clear first pick;
    // after it, (ab,</w>) has 15 vs (ab,ab) 10
    val (merges, _) = Bpe.trainOn(dictDf(Seq("abab" -> 10L, "ab" -> 5L)), rounds = 2)
    val m = merges.orderBy("step").collect()
    assert(m(0).getAs[String]("a") == "a" && m(0).getAs[String]("b") == "b")
    assert(m(0).getAs[Long]("wt") == 25L)
    assert(m(1).getAs[String]("a") == "ab" && m(1).getAs[String]("b") == Bpe.Eow)
    assert(m(1).getAs[Long]("wt") == 15L)
  }

  test("overlapping runs merge greedy-leftmost") {
    // 'aaaa': pair (a,a) has weight 3; one merge must yield [aa, aa, </w>]
    val (_, rows) = Bpe.trainOn(dictDf(Seq("aaaa" -> 1L)), rounds = 1)
    val syms = rows.orderBy("pos").collect().map(_.getAs[String]("sym")).toSeq
    assert(syms == Seq("aa", "aa", Bpe.Eow), s"got $syms")
  }

  test("corpus training: full ladder, positive weights, real compression") {
    val merges = Bpe.train(spark, sf).collect()
    assert(merges.map(_.getAs[Long]("step")).toSeq == (1L to Bpe.BpeMerges))
    assert(merges.forall(_.getAs[Long]("wt") > 0))
    val out = Bpe.apply_(spark, sf)
      .agg(sum(col("n_bpe_tokens")).as("bpe"), sum(col("n_words")).as("w"))
      .collect()(0)
    // char-level token count = Σ(len(word)+1) over occurrences
    val charLevel = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .agg(sum(length(col("w")) + 1)).collect()(0).getLong(0)
    assert(out.getAs[Long]("bpe") < charLevel,
      s"16 merges should compress below char level: ${out.getAs[Long]("bpe")} vs $charLevel")
    // and stays ≥ one token per word
    assert(out.getAs[Long]("bpe") >= out.getAs[Long]("w"))
  }
}
