package graft

import org.apache.spark.sql.types._
import graft.operators.Relational2

/** q47_assoc_rules: hand-computed support/confidence/lift on crafted
  * baskets, threshold pruning, and score sanity on the corpus. */
class AssocRulesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("hand-computed scores on crafted baskets") {
    // baskets: {1,2}, {1,2}, {1,3}, {2} → only pair (1,2) reaches count 2
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 2L))
      .map { case (ok, pk) => org.apache.spark.sql.Row(ok, pk) }
    val b = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("ok", LongType), StructField("pk", LongType))))
    val out = Relational2.assocRulesFrom(b).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(r.getAs[Long]("n_ab") == 2L)
    assert(r.getAs[Double]("support") == 0.5)          // 2/4
    assert(r.getAs[Double]("conf_ab") == 0.666667)     // 2/3
    assert(r.getAs[Double]("conf_ba") == 0.666667)     // 2/3
    assert(r.getAs[Double]("lift") == 0.888889)        // 8/9
  }

  test("corpus rules: scores well-formed, threshold respected") {
    val out = Relational2.q47AssocRules(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_ab") >= Relational2.AssocMinCount)
      assert(r.getAs[Double]("support") > 0 && r.getAs[Double]("support") <= 1)
      assert(r.getAs[Double]("conf_ab") > 0 && r.getAs[Double]("conf_ab") <= 1)
      assert(r.getAs[Double]("conf_ba") > 0 && r.getAs[Double]("conf_ba") <= 1)
      assert(r.getAs[Double]("lift") > 0)
    }
  }
}
