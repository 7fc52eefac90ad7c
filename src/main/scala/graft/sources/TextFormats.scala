package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-compatible text inputs (the reference's a6 queries read
  * pipe-delimited `.tbl` files and its a0–a5 jobs read line corpora;
  * e.g. a6/Q1.scala:47-52 splits lineitem.tbl on '\|').
  *
  * Both readers produce the SAME schemas as the parquet loaders in
  * [[Tables]], so every graft operator runs unchanged on either format —
  * the format choice the reference exposes as a --text/--parquet flag is
  * just a different `DataFrameReader` here, and CSV pushdown/pruning
  * still apply.
  */
object TextFormats {

  /** Schemas matching the parquet tables (see TESTDATA.md). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
  )

  /** Read a pipe-delimited `.tbl` file with the named table's schema.
    * Timestamps are plain TIMESTAMP (not NTZ): the whole library reads
    * naive parquet timestamps with NTZ inference off (see Tables.events)
    * so stored micros pass through as UTC instants on every session —
    * the text reader matches that posture. The session timezone is
    * pinned to UTC HERE (Tables.ensureUtc), not just in the entry
    * points, so a non-UTC caller can't read shifted instants. */
  def tbl(spark: SparkSession, path: String, table: String): DataFrame = {
    Tables.ensureUtc(spark)
    spark.read
      .schema(schemas(table))
      .option("sep", "|")
      .option("timestampFormat", "yyyy-MM-dd[ HH:mm:ss]")
      .csv(path)
  }

  /** Read a plain-text corpus: one document per line, stable line ids
    * (zipWithIndex is deterministic per file-order, unlike
    * monotonically_increasing_id across repartitions). */
  def corpus(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .map { case (text, id) => org.apache.spark.sql.Row(id, text) }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))
  }

  /** JSONL (one JSON object per line — the interchange format most
    * corpus pipelines speak). Explicit schema: schema inference would
    * cost an extra full pass over 100 TB and can mis-type sparse
    * fields. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-partitioned parquet: the at-scale table layout. Filters on
    * the partition column become directory pruning (zero IO for
    * excluded partitions — `PartitionFilters` in the scan node), and
    * each partition writes its own files so downstream jobs can process
    * partitions independently. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
