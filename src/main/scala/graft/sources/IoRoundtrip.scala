package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef

/** Multi-format source/sink surface: the documents table round-trips
  * through JSON-lines, ORC and CSV sinks and is read back through the
  * matching sources with an EXPLICIT schema (no inference in the read
  * path — inference is a second full scan at 100 TB). The registered
  * query aggregates (count, Σ n_chars, Σ text-hash) per format; the
  * oracle computes the same three invariants from the parquet table,
  * so a pass proves every format preserved the data bit-for-bit where
  * it counts (the hash sum covers full text content).
  *
  * Writes are memoized per (session, dir) under java.io.tmpdir —
  * format conversion happens once; the timed query is read + aggregate
  * (the realistic "read a foreign-format feed" path). */
object IoRoundtrip {
  val Formats: Seq[String] = Seq("csv", "json", "orc")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val memo = scala.collection.concurrent.TrieMap[String, String]()

  private def writtenRoot(spark: SparkSession, dir: String): String =
    memo.getOrElseUpdate(spark.sparkContext.applicationId + ":" + dir, {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val root = java.nio.file.Paths
        .get(sys.props("java.io.tmpdir"), "graft-io", key).toString
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      Formats.foreach { f =>
        docs.write.mode("overwrite").format(f)
          .option("header", "true").save(s"$root/$f")
      }
      root
    })

  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = writtenRoot(spark, dir)
    Formats.map { f =>
      spark.read.format(f).schema(schema).option("header", "true")
        .load(s"$root/$f")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")).as("text_hash_sum"))
        .select(lit(f).as("format"), col("n_docs"), col("sum_chars"), col("text_hash_sum"))
    }.reduce(_ unionAll _).orderBy("format")
  }

  private val roundtripOracle: String = {
    val fmts = Formats.map(f => s"('$f')").mkString(", ")
    s"""WITH a AS (SELECT count(*) AS n_docs,
                          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                          CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS text_hash_sum
                   FROM documents)
        SELECT f.fmt AS format, a.n_docs, a.sum_chars, a.text_hash_sum
        FROM a, (VALUES $fmts) f(fmt) ORDER BY format"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("io_format_roundtrip", roundtrip, Some(roundtripOracle)),
  )
}
