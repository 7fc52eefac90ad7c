package graft

import org.apache.spark.sql.types._
import graft.operators.TextProfile

/** text_js_divergence: identical slices score exactly 0, divergent
  * slices score positive, and all scores respect the [0, 1] log₂
  * bound. */
class JsDivergenceSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docsDf(rows: Seq[(String, String)]) = {
    val rs = rows.map { case (s, t) => org.apache.spark.sql.Row(s, t) }
    spark.createDataFrame(rs.asJava, StructType(Seq(
      StructField("source", StringType), StructField("text", StringType))))
  }

  test("identical slices diverge by exactly zero") {
    val out = TextProfile.jsDivergenceOn(docsDf(Seq(
      "a" -> "x y z", "b" -> "x y z"))).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Double]("js") == 0.0))
  }

  test("disjoint-vocabulary slices diverge strongly but stay under the log2 bound") {
    val out = TextProfile.jsDivergenceOn(docsDf(Seq(
      "a" -> "x x x", "b" -> "y y y"))).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("js")).toMap
    // slice a = {x:1}, corpus = {x:½, y:½}:
    // JS = ½·[1·log2(4/3) + ½·log2(2/3) + ½·log2(2)] ≈ 0.311278
    val expected = 0.5 * (math.log(4.0 / 3) / math.log(2) +
      0.5 * math.log(2.0 / 3) / math.log(2) + 0.5)
    assert(out.values.forall(v => math.abs(v - expected) < 1e-5),
      s"$out vs $expected")
  }

  test("corpus scores: bounded, near-uniform synthetic sources score small") {
    val out = TextProfile.jsDivergence(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getAs[Double]("js")
      assert(v >= 0.0 && v <= 1.0)
    }
  }
}
