package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Tables, TextFormats}

/** Round-trip: export parquet tables to the reference's `.tbl` text
  * format, read them back through TextFormats, and run the same
  * operator on both — results must agree. */
class TextFormatsSpec extends SparkSpec {

  test("lineitem.tbl round-trips and q1-style filter-count agrees") {
    val tmp = Files.createTempDirectory("graft-tbl").toString
    val li = Tables.lineitem(spark, sf)
    li.select(li.columns.map {
        case c @ "l_shipdate" => date_format(col(c), "yyyy-MM-dd HH:mm:ss").as(c)
        case c => col(c)
      }: _*)
      .coalesce(1)
      .write.option("sep", "|").csv(s"$tmp/lineitem")
    val fromText = TextFormats.tbl(spark, s"$tmp/lineitem", "lineitem")
    assert(fromText.count() == li.count())
    val d = operators.Relational.ShipDate
    val cntText = fromText.filter(to_date(col("l_shipdate")) === lit(d)).count()
    val cntParq = li.filter(to_date(col("l_shipdate")) === lit(d)).count()
    assert(cntText == cntParq)
    assert(fromText.schema == li.schema)
  }

  test("jsonl round-trips the documents table value-for-value") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf)
    TextFormats.writeJsonl(docs, s"$tmp/docs")
    val back = TextFormats.jsonl(spark, s"$tmp/docs", docs.schema)
    assert(back.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("partitioned parquet write prunes partitions on read (PartitionFilters)") {
    val tmp = Files.createTempDirectory("graft-part").toString
    TextFormats.writePartitioned(Tables.documents(spark, sf), s"$tmp/docs", "lang")
    val back = spark.read.parquet(s"$tmp/docs").filter(col("lang") === "en")
    // correctness: only the en partition's rows come back
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(back.count() === expected)
    // scale behavior: the lang predicate is a partition filter on the
    // scan (directory pruning), not a data filter over all rows
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("text corpus reader assigns stable line ids and feeds wordcount") {
    val tmp = Files.createTempDirectory("graft-corpus").toString
    Files.write(java.nio.file.Paths.get(tmp, "docs.txt"),
      "the quick fox\njumps over\nthe lazy dog".getBytes)
    val corpus = TextFormats.corpus(spark, s"$tmp/docs.txt")
    assert(corpus.count() == 3)
    assert(corpus.filter(col("doc_id") === 0).head.getString(1) == "the quick fox")
    val wc = corpus.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc("the") == 2 && wc("fox") == 1)
  }
}
