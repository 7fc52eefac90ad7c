package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.TextAnalytics

/** text_skipgram_pmi: hand-computed PMI on crafted docs and
  * well-formedness on the corpus run. */
class SkipgramSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("hand-computed PMI on five identical two-word docs") {
    // "x y" ×5: ordered pairs D = 10, n12(x,y) = 5, #(x) = #(y) = 5
    // PMI = log10(5·10 / 25) = log10 2
    val rows = (0 until 5).map(i =>
      org.apache.spark.sql.Row(i.toLong, Seq("x", "y")))
    val docs = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("toks", ArrayType(StringType)))))
    val out = TextAnalytics.skipgramPmiOn(docs).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("w1") == "x" && r.getAs[String]("w2") == "y")
    assert(r.getAs[Long]("n12") == 5L)
    assert(r.getAs[Double]("pmi") == BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("corpus run: canonical pairs, threshold respected, window tighter than doc PMI") {
    val out = TextAnalytics.skipgramPmi(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("w1") <= r.getAs[String]("w2"))
      assert(r.getAs[Long]("n12") >= TextAnalytics.SkipThreshold)
    }
    // the positional window must admit far fewer co-occurrences than
    // whole-doc co-occurrence (same corpus, stricter context)
    val docPairs = TextAnalytics.pmiPairs(spark, sf).count()
    assert(out.length.toLong <= docPairs * 2,
      s"windowed pairs ${out.length} vs doc-level $docPairs")
  }
}
