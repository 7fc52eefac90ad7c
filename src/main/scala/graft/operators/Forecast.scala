package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Time-series smoothing over the event log — the operational-metrics
  * layer (alerting baselines, trend dashboards) every event warehouse
  * derives from its raw stream.
  *
  * Determinism discipline (the ml_linear_reg / grid-sigmoid family):
  *  - per-row cent quantization `floor(value*100 + 0.5)` is pure IEEE
  *    arithmetic on the identical double input — bit-deterministic on
  *    any engine (no libm call involved) — so the per-day sums are
  *    EXACT integer sums, order-free across partitions;
  *  - the EWMA itself is a fixed-length left-fold of IEEE
  *    multiply/adds in identical operand order on both engines, over
  *    lag() values that are exact integers-over-100 — bit-identical
  *    without any quantization grid.
  *
  * Scale notes: one |events|→|type×day| map-side-combined aggregate,
  * then a window over each type's OWN day series (|types| tiny
  * partitions). At 100 TB the aggregate output is still |types|×|days|
  * rows — the window stage is driver-trivial; the only real shuffle is
  * the daily rollup, which partial-aggregates on the map side.
  */
object Forecast {
  /** Smoothing factor and trailing-window length. The truncated
    * (adjust=true) form over the last K observations: weights
    * (1-α)^k renormalized over the PRESENT lags, so early rows are
    * unbiased — identical to pandas `ewm(alpha, adjust=True)` once the
    * series is longer than K; truncation error < (1-α)^K ≈ 3%·tail. */
  val Alpha = 0.3
  val EwmaK = 10

  /** Trailing weights as shortest-round-trip literals: the SAME double
    * constants reach Spark (lit) and DuckDB (literal text re-parsed to
    * the nearest — identical — double). */
  val weights: Seq[Double] =
    Iterator.iterate(1.0)(_ * (1 - Alpha)).take(EwmaK).toSeq

  /** Daily value series per event type (exact cents), EWMA-smoothed. */
  def q50Ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_us div 86400000000").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .withColumn("x", col("c").cast("double") / 100)
    val w = Window.partitionBy("event_type").orderBy("day")
    val lags = (0 until EwmaK).map(k => lag(col("x"), k).over(w))
    val num = lags.zip(weights)
      .map { case (l, wt) => coalesce(l * lit(wt), lit(0.0)) }
      .reduceLeft(_ + _)
    val den = lags.zip(weights)
      .map { case (l, wt) => when(l.isNotNull, lit(wt)).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    daily
      .withColumn("ewma", round(num / den, 6))
      .select(col("event_type"), col("day"), col("n"), col("x"), col("ewma"))
      .orderBy("event_type", "day")
  }

  private val ewmaOracle: String = {
    val nums = weights.zipWithIndex
      .map { case (wt, k) => s"coalesce(lag(x, $k) OVER tw * $wt, 0)" }
      .mkString("(", "\n                 + ", ")")
    val dens = weights.zipWithIndex
      .map { case (wt, k) =>
        s"CASE WHEN lag(x, $k) OVER tw IS NOT NULL THEN $wt ELSE 0 END" }
      .mkString("(", "\n                 + ", ")")
    s"""WITH daily AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 count(*) AS n,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
          FROM events GROUP BY 1, 2)
        SELECT event_type, day, n, c::DOUBLE / 100 AS x,
               round($nums
                     / $dens, 6) AS ewma
        FROM daily
        WINDOW tw AS (PARTITION BY event_type ORDER BY day)
        ORDER BY event_type, day"""
  }

  /** Holt double exponential smoothing (level + linear trend) — the
    * trend-aware upgrade of q50's EWMA, with a 1-step-ahead forecast
    * (ℓ + b): the alerting baseline that tracks ramping metrics
    * instead of lagging them. The recurrence
    *   ℓₜ = α·xₜ + (1−α)(ℓₜ₋₁ + bₜ₋₁);  bₜ = β(ℓₜ − ℓₜ₋₁) + (1−β)bₜ₋₁
    * is sequential BY NATURE, so each row restarts it over its own
    * [[HoltK]] trailing lags from the standard init (ℓ = oldest x,
    * b = first difference) — the q50 row-lag discipline, truncation
    * error ∝ ((1−α)(1+β))ᴷ. The K−1 steps are emitted as ONE ordered
    * SELECT list using lateral column aliases (each lⱼ/bⱼ references
    * the just-defined lⱼ₊₁/bⱼ₊₁), and the SAME formula strings are
    * evaluated verbatim by Spark and DuckDB — the reg2Formula
    * discipline: the text is the contract, so the doubles agree
    * bit-for-bit.
    *
    * Scale: identical shape to q50 — one map-side-combined daily
    * rollup, then a window over each type's own day series. */
  val HoltAlpha = 0.5
  val HoltBeta = 0.3
  val HoltK = 8

  /** The init + unrolled steps, oldest-first — one text, two engines. */
  private[graft] def holtFormulas: Seq[String] = {
    val a = HoltAlpha; val b = HoltBeta
    val init = Seq(
      s"x${HoltK - 1} AS l${HoltK - 1}",
      s"x${HoltK - 2} - x${HoltK - 1} AS b${HoltK - 1}")
    val steps = (HoltK - 2 to 0 by -1).flatMap { j =>
      Seq(
        s"$a * x$j + ${1 - a} * (l${j + 1} + b${j + 1}) AS l$j",
        s"$b * (l$j - l${j + 1}) + ${1 - b} * b${j + 1} AS b$j")
    }
    init ++ steps
  }

  /** Holt over any (part, ord, x) daily series — the spec feeds
    * synthetic linear ramps through this same core. */
  def holtSmooth(daily: DataFrame, partCol: String, ordCol: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(ordCol)
    var df = daily
    for (k <- 0 until HoltK) df = df.withColumn(s"x$k", lag(col("x"), k).over(w))
    df.filter(col(s"x${HoltK - 1}").isNotNull)
      .selectExpr(Seq(partCol, ordCol, "x") ++ holtFormulas: _*)
      // floor(x·1e6 + 0.5)/1e6 instead of round(): DuckDB's double
      // round() and Spark's BigDecimal HALF_UP disagree on values a
      // hair below a 6-dp boundary (observed on the hourly series);
      // explicit IEEE floor arithmetic is bit-identical by construction
      .selectExpr(partCol, ordCol, "x",
        "floor(l0 * 1000000 + 0.5) / 1000000 AS level",
        "floor(b0 * 1000000 + 0.5) / 1000000 AS trend",
        "floor((l0 + b0) * 1000000 + 0.5) / 1000000 AS forecast1")
  }

  def q56Holt(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("ts_us div 86400000000").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum(col("cents")).as("c"))
      .withColumn("x", col("c").cast("double") / 100)
      .select("event_type", "day", "x")
    holtSmooth(daily, "event_type", "day")
      .orderBy("event_type", "day")
  }

  private val holtOracle: String = {
    val lagCols = (0 until HoltK)
      .map(k => s"lag(x, $k) OVER tw AS x$k").mkString(",\n                 ")
    s"""WITH daily AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::DOUBLE / 100 AS x
          FROM events GROUP BY 1, 2),
          lagged AS (SELECT event_type, day, x,
                 $lagCols
          FROM daily
          WINDOW tw AS (PARTITION BY event_type ORDER BY day)),
          holt AS (SELECT event_type, day, x,
                 ${holtFormulas.mkString(",\n                 ")}
          FROM lagged WHERE x${HoltK - 1} IS NOT NULL)
        SELECT event_type, day, x,
               floor(l0 * 1000000 + 0.5) / 1000000 AS level,
               floor(b0 * 1000000 + 0.5) / 1000000 AS trend,
               floor((l0 + b0) * 1000000 + 0.5) / 1000000 AS forecast1
        FROM holt ORDER BY event_type, day"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q50_ewma", q50Ewma, Some(ewmaOracle)),
    QueryDef("q56_holt", q56Holt, Some(holtOracle)),
  )
}
