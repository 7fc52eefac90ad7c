package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** q55: a MERGEABLE, DETERMINISTIC, bounded-state quantile sketch —
  * the at-scale percentile path the sketch family was missing (q13's
  * KLL state is arrival-order-dependent and not oracle-replayable;
  * q45 fixes the sample RATE, so its state still grows ∝ n/4).
  *
  * Construction: a bottom-[[SketchK]] signature sample (the KMV /
  * coordinated-sampling discipline, Cohen & Kaplan): every row gets a
  * 52-bit md5 signature of its PRIMARY KEY (not its value), and the
  * sketch per group is the K rows with the smallest signatures —
  * kept by the bounded-heap `top_k_pairs` aggregate on the negated
  * signature, so state is EXACTLY K (value, signature) pairs per
  * group no matter how many rows stream through, partial aggregation
  * combines map-side, and the shuffle moves ≤ K rows per group per
  * partition.
  *
  * Why it is mergeable and deterministic: bottom-K of a union is the
  * bottom-K of the two bottom-K's — merge is the same heap fold as
  * update (associative + commutative, QuantileSketchSpec proves the
  * split-merge identity), and the signature is a pure function of the
  * key, so ANY partitioning, arrival order, or merge tree yields the
  * identical sample — which is exactly what lets a SQL oracle replay
  * the whole sketch with a rank filter.
  *
  * Estimates: the sampled rows are a uniform K-subset (md5 as the
  * random source), so quantile q is read at rank ⌈q·m⌉ of the
  * value-sorted sample; by DKW the rank error is ≤ √(ln(2/δ)/2K)·n
  * w.p. 1−δ — K=256 gives ~12% rank error at δ=0.001, the measured
  * error on this corpus is far smaller (spec asserts the bound).
  */
object QuantileSketch {
  val SketchK = 256
  val Quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** (flag, cents, sig): cent-exact prices with the 52-bit key
    * signature (52 bits fit a double exactly — the heap orders on
    * −sig as double — and collisions tie-break on the value, same as
    * the oracle's ORDER BY h, cents). */
  private def signed(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
      conv(substring(md5(concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"))), 1, 13), 16, 10)
        .cast("long").as("sig"))

  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val sk = signed(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr(s"top_k_pairs(-CAST(sig AS DOUBLE), cents, $SketchK)").as("sketch"))
      .withColumn("vals", expr("array_sort(transform(sketch, e -> e.payload))"))
      .withColumn("m", size(col("vals")))
    val qs = Quantiles.map(q => lit(q))
    sk.select(col("l_returnflag"), col("vals"), col("m"),
        explode(array(qs: _*)).as("q"))
      .select(col("l_returnflag"), col("q"),
        expr("element_at(vals, CAST(ceil(q * m) AS INT))").as("est_cents"))
      .orderBy("l_returnflag", "q")
  }

  private lazy val oracle: String = {
    val qList = Quantiles.mkString("[", ", ", "]")
    s"""WITH x AS (SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                 ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                                     CAST(l_linenumber AS VARCHAR)), 1, 13))::BIGINT AS h
          FROM lineitem),
          bk AS MATERIALIZED (SELECT l_returnflag, cents FROM (
                SELECT l_returnflag, cents,
                       row_number() OVER (PARTITION BY l_returnflag ORDER BY h, cents) AS rn
                FROM x) WHERE rn <= $SketchK),
          srt AS (SELECT l_returnflag, cents,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS vr,
                 count(*) OVER (PARTITION BY l_returnflag) AS m
          FROM bk),
          qs AS (SELECT unnest($qList::DOUBLE[]) AS q)
        SELECT s.l_returnflag, q.q, s.cents AS est_cents
        FROM srt s JOIN qs q ON s.vr = CAST(ceil(q.q * s.m) AS BIGINT)
        ORDER BY s.l_returnflag, q.q"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q55_quantile_sketch", quantileSketch, Some(oracle)))
}
