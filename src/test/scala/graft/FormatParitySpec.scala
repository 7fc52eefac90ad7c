package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** a6 `--text` input-format parity (reference a6/Q1.scala:19): the
  * reference accepts a pipe-delimited line-oriented dump of the TPC-H
  * tables next to parquet. Graft serves the same mode through the ONE
  * `Tables` read seam — a dir of `<name>.tbl` + `<name>.schema` DDL
  * sidecars — so EVERY registered query runs unchanged over text
  * input. This spec dumps the a6 tables as text and asserts q1–q4
  * produce row-for-row identical results vs the parquet dir. */
class FormatParitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("a6 --text line-format input: q1-q4 identical to parquet") {
    import java.nio.file.{Files, Paths}
    val sf = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-text").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { n =>
      val df = spark.read.parquet(s"$sf/$n.parquet")
      df.coalesce(1).write.option("sep", "|").option("header", "false")
        .mode("overwrite").csv(s"$tmp/$n.tbl")
      Files.writeString(Paths.get(tmp, s"$n.schema"), df.schema.toDDL)
    }
    def rows(q: String, dir: String): Seq[Row] =
      SparkEntry.queries(q)(spark, dir).collect().toSeq
    Seq("q1_filter_count", "q2_join_top20", "q3_broadcast_join",
      "q4_nation_count").foreach { q =>
      val (pq, tx) = (rows(q, sf), rows(q, tmp))
      assert(pq == tx, s"$q diverged between parquet and --text input")
      assert(pq.nonEmpty, s"$q returned no rows")
    }
  }
}
