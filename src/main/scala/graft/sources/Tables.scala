package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Typed loaders for the driver-generated parquet tables.
  *
  * Every operator goes through these so schema quirks are handled once.
  * At cluster scale these would carry bucketing / partition metadata; in
  * local mode they are plain parquet scans that Catalyst prunes and
  * pushes filters into (verify via `.explain` → `PushedFilters`).
  */
object Tables {
  /** Graft's timestamp semantics are defined over a UTC session: naive
    * parquet/text timestamps are read as UTC instants so the stored
    * micros match the DuckDB oracle's `epoch_us` on ANY caller session.
    * Pinning the conf here (not just in Bench/Verify/specs) means a
    * caller on a non-UTC session can't silently read shifted instants.
    * Spark reads the session timezone per-query, so setting it at read
    * time covers the whole downstream plan. */
  private[sources] def ensureUtc(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.session.timeZone", "UTC")

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureUtc(spark)
    val pq = new java.io.File(s"$dir/$name.parquet")
    if (pq.exists) spark.read.parquet(pq.getPath)
    else {
      // The reference's `--text` line-oriented input mode (a6/Q1.scala:19)
      // at the ONE table seam every operator reads through: a dir holding
      // pipe-delimited `<name>.tbl` files with a `<name>.schema` DDL
      // sidecar serves the identical DataFrame — same downstream plans,
      // same results (FormatParitySpec asserts q1–q4 parity vs parquet).
      val ddl = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"$name.schema")), "UTF-8")
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .option("sep", "|").csv(s"$dir/$name.tbl")
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events` carries nanosecond timestamps (parquet TIMESTAMP(NANOS)),
    * which Spark's TimestampType (micros) can't hold natively. We read
    * the raw int64 nanos and expose:
    *   - `ts_us`: epoch micros (long) — exact, matches DuckDB `epoch_us`
    *   - `ts`:    TimestampType at micro precision, for window functions
    * Integer `div` (not `/`) everywhere: double division would lose
    * precision on 1e18-scale nanos.
    */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (same names the DuckDB oracle
    * uses), so the whole engine is also drivable via `spark.sql`. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else read(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    graft.functions.VectorExpressions.register(spark)
  }

  /** Write a DataFrame as a bucketed+sorted managed table: both sides of
    * a repeated equi-join bucketed on the key join WITHOUT any runtime
    * Exchange — the shuffle is paid once at write time. This is the
    * at-scale layout for fact⋈fact joins (e.g. lineitem⋈orders on
    * orderkey over 100 TB: bucket both at load, join shuffle-free ever
    * after). Buckets should be sized so each ≈ 100–200 MB at the target
    * scale. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-key variant: a join on the full key set reads the scan's
    * reported hash partitioning and skips its Exchange. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // naive (isAdjustedToUTC=false) parquet timestamps would read as
    // TIMESTAMP_NTZ, whose epoch extraction depends on the session
    // timezone; with NTZ inference off they read as plain TIMESTAMP
    // whose stored micros pass through unchanged — the same values the
    // DuckDB oracle's epoch_us sees, on any session timezone
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = read(spark, dir, "events")
    val withUs = raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts_us", expr("ts div 1000"))
      case _        => raw.withColumn("ts_us", unix_micros(col("ts")))
    }
    withUs.withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
