package graft

import org.apache.spark.sql.types._
import graft.operators.Classify

/** ml_linear_reg: exact hand-computed moments on a tiny case, and the
  * corpus fit recovering the chars-per-token law with high r².
  */
class LinearRegSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("hand-computed three-point fit is exact") {
    val rows = Seq((1L, 2L), (2L, 4L), (3L, 7L))
      .map { case (x, y) => org.apache.spark.sql.Row(x, y) }
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("x", LongType), StructField("y", LongType))))
    val r = Classify.linearFit(df).collect()(0)
    // n=3 sx=6 sy=13 sxx=14 sxy=31 syy=69
    // slope = (3·31−6·13)/(3·14−36) = 15/6 = 2.5
    // intercept = (13 − 2.5·6)/3 = −2/3; r² = 15²/(6·38)
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Double]("slope") == 2.5)
    assert(r.getAs[Double]("intercept") == -0.6667)
    assert(r.getAs[Double]("r2") == BigDecimal(225.0 / 228.0)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("corpus fit recovers the chars-per-token law") {
    val r = Classify.mlLinearReg(spark, sf).collect()(0)
    val slope = r.getAs[Double]("slope")
    assert(slope > 4.0 && slope < 8.0, s"slope $slope outside word-length range")
    assert(r.getAs[Double]("r2") > 0.9, s"r2 ${r.getAs[Double]("r2")} too low")
  }

  test("fit is deterministic under repartitioning (order-free moments)") {
    val base = graft.sources.Tables.documents(spark, sf).select(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).cast("long").as("x"),
      org.apache.spark.sql.functions.col("n_chars").as("y"))
    val a = Classify.linearFit(base).collect()(0)
    val b = Classify.linearFit(base.repartition(13)).collect()(0)
    assert(a == b)
  }
}
