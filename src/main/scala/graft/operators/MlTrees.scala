package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables
import graft.api.GraftOps.TruncateOps

/** Histogram-based decision-tree training — the MLlib/XGBoost split-
  * finding discipline re-expressed as plain aggregates: candidate
  * split gains come from ONE pass of per-(feature, value) histograms
  * (map-side combined), cumulated by a window, never from per-row
  * sorting. Regression target is l_extendedprice in EXACT cents;
  * every moment (counts, sums, sums of squares) is an exact
  * decimal(38) integer sum — order-free across partitions — and each
  * gain is one double expression in identical operand order on both
  * engines (the ml_linear_reg discipline), so split selection (an
  * argmax over doubles) is cross-engine deterministic.
  *
  * Scale: the histogram is |features|×|distinct values| rows (the
  * three TPC-H features are born low-cardinality; continuous features
  * would be quantile-binned first, same plan shape). The corpus-sized
  * work is one melt + one groupBy per boosting round; the candidate
  * table, the argmax, and the leaf stats are all dim-sized. The
  * boosted rounds chain stump parameters through 1-row broadcast
  * cross-joins — no driver-side collect in the loop.
  */
object MlTrees {
  /** (feature, v, y) long-form rows: y = price cents (exact),
    * features quantized to their native integer grids. */
  private def meltRows(spark: SparkSession, dir: String): DataFrame = {
    val base = baseRows(spark, dir)
    Seq("qty", "disc", "tax").map { f =>
      base.select(lit(f).as("feature"), col(f).as("v"), col("y"))
    }.reduce(_ unionAll _)
  }

  /** One row per lineitem: integer features + exact cent target.
    * floor(x*100 + 0.5) is pure IEEE arithmetic on the identical
    * double input — bit-deterministic on any engine. */
  private def baseRows(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("qty"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("disc"),
      floor(col("l_tax") * 100 + 0.5).cast("long").as("tax"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))

  private val baseSql: String =
    """SELECT CAST(l_quantity AS BIGINT) AS qty,
              CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
              CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax,
              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
       FROM lineitem"""

  /** Variance-reduction gain for split x ≤ t from cumulative moments:
    * gain = S_L²/n_L + S_R²/n_R − S²/n (the SSE decrease; leaf means
    * are the predictions). All inputs exact integers cast to double. */
  private def gainCol(nL: Column, sL: Column, n: Column, s: Column): Column = {
    def d(c: Column) = c.cast("double")
    val sR = d(s) - d(sL)
    val nR = d(n) - d(nL)
    d(sL) * d(sL) / d(nL) + sR * sR / nR - d(s) * d(s) / d(n)
  }

  val StumpTopK = 10

  /** All candidate stump splits ranked by exact-moment gain. */
  def mlTreeStump(spark: SparkSession, dir: String): DataFrame = {
    val hist = meltRows(spark, dir)
      .groupBy("feature", "v")
      .agg(count(lit(1)).as("cnt"), sum(col("y").cast("decimal(38,0)")).as("sy"))
    val w = Window.partitionBy("feature").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("n_left", sum(col("cnt")).over(w))
      .withColumn("s_left", sum(col("sy")).over(w))
    val tot = hist.groupBy("feature")
      .agg(sum(col("cnt")).as("n"), sum(col("sy")).as("s"))
    cum.join(tot, "feature")
      .filter(col("n_left") < col("n"))
      .select(col("feature"), col("v").as("threshold"),
        col("n_left"), (col("n") - col("n_left")).as("n_right"),
        round(col("s_left").cast("double") / col("n_left") / 100, 4).as("mean_left"),
        round((col("s").cast("double") - col("s_left").cast("double"))
          / (col("n") - col("n_left")) / 100, 4).as("mean_right"),
        round(gainCol(col("n_left"), col("s_left"), col("n"), col("s")) / 1e8, 4).as("gain"))
      .orderBy(col("gain").desc, col("feature"), col("threshold"))
      .limit(StumpTopK)
  }

  private val stumpOracle: String =
    s"""WITH base AS ($baseSql),
          melt AS (SELECT 'qty' AS feature, qty AS v, y FROM base
                   UNION ALL SELECT 'disc', disc, y FROM base
                   UNION ALL SELECT 'tax', tax, y FROM base),
          hist AS MATERIALIZED (SELECT feature, v, count(*) AS cnt, sum(y) AS sy
                 FROM melt GROUP BY 1, 2),
          cum AS (SELECT feature, v,
                         sum(cnt) OVER tw AS n_left,
                         sum(sy) OVER tw AS s_left
                  FROM hist
                  WINDOW tw AS (PARTITION BY feature ORDER BY v
                                ROWS UNBOUNDED PRECEDING)),
          tot AS (SELECT feature, sum(cnt) AS n, sum(sy) AS s FROM hist GROUP BY 1)
        SELECT c.feature, c.v AS threshold,
               c.n_left::BIGINT AS n_left, (t.n - c.n_left)::BIGINT AS n_right,
               round(c.s_left::DOUBLE / c.n_left / 100, 4) AS mean_left,
               round((t.s::DOUBLE - c.s_left::DOUBLE) / (t.n - c.n_left) / 100, 4) AS mean_right,
               round((c.s_left::DOUBLE * c.s_left::DOUBLE / c.n_left::DOUBLE
                      + (t.s::DOUBLE - c.s_left::DOUBLE) * (t.s::DOUBLE - c.s_left::DOUBLE)
                        / (t.n::DOUBLE - c.n_left::DOUBLE)
                      - t.s::DOUBLE * t.s::DOUBLE / t.n::DOUBLE) / 1e8, 4) AS gain
        FROM cum c JOIN tot t ON c.feature = t.feature
        WHERE c.n_left < t.n
        ORDER BY gain DESC, c.feature, threshold LIMIT $StumpTopK"""

  /** Depth-2 decision tree — real recursive partitioning past the
    * stump tier: the best root split (variance-reduction argmax over
    * the per-(feature, value) histogram, exactly mlTreeStump's
    * machinery), then the best split INSIDE each child, found by the
    * same one-pass histogram chain with `side` added to the grouping
    * key. Selection is cross-engine deterministic: gains are one
    * fixed-order double expression over exact decimal(38) moments,
    * ranked ROUNDED with (feature, threshold) tie-breaks. Emits the
    * three internal nodes (root, L, R) with their split, child
    * counts, leaf means and gain.
    * Scale: TWO histogram passes over the corpus total (the root
    * argmax is a broadcast 1-row join into the second pass — the
    * level-wise XGBoost discipline: one pass per DEPTH, never per
    * node). */
  def mlTreeDepth2(spark: SparkSession, dir: String): DataFrame = {
    val base = baseRows(spark, dir).memoized() // two passes read it
    def candidates(rows: DataFrame, part: Seq[String]): DataFrame = {
      val melt = Seq("qty", "disc", "tax").map { f =>
        rows.select(part.map(col) :+ lit(f).as("feature") :+ col(f).as("v") :+ col("y"): _*)
      }.reduce(_ unionAll _)
      val keys = part :+ "feature"
      val hist = melt.groupBy((keys :+ "v").map(col): _*)
        .agg(count(lit(1)).as("cnt"), sum(col("y").cast("decimal(38,0)")).as("sy"))
      val w = Window.partitionBy(keys.map(col): _*).orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("n_left", sum(col("cnt")).over(w))
        .withColumn("s_left", sum(col("sy")).over(w))
      val tot = hist.groupBy(keys.map(col): _*)
        .agg(sum(col("cnt")).as("n"), sum(col("sy")).as("s"))
      cum.join(tot, keys)
        .filter(col("n_left") < col("n"))
        .select(part.map(col) ++ Seq(col("feature"), col("v").as("threshold"),
          col("n_left"), (col("n") - col("n_left")).as("n_right"),
          round(col("s_left").cast("double") / col("n_left") / 100, 4).as("mean_left"),
          round((col("s").cast("double") - col("s_left").cast("double"))
            / (col("n") - col("n_left")) / 100, 4).as("mean_right"),
          round(gainCol(col("n_left"), col("s_left"), col("n"), col("s")) / 1e8, 4)
            .as("gain")): _*)
    }
    val root = candidates(base, Seq.empty)
      .orderBy(col("gain").desc, col("feature"), col("threshold")).limit(1)
      .memoized() // broadcast into the level-2 pass AND the output
    val sided = base.crossJoin(broadcast(
        root.select(col("feature").as("rf"), col("threshold").as("rt"))))
      .withColumn("side",
        when(expr("CASE rf WHEN 'qty' THEN qty WHEN 'disc' THEN disc ELSE tax END")
          <= col("rt"), "L").otherwise("R"))
    val wBest = Window.partitionBy("side")
      .orderBy(col("gain").desc, col("feature"), col("threshold"))
    val best2 = candidates(sided, Seq("side"))
      .withColumn("rnk", row_number().over(wBest)).filter(col("rnk") === 1)
    root.select(lit("root").as("node"), col("feature"), col("threshold"),
        col("n_left"), col("n_right"), col("mean_left"), col("mean_right"), col("gain"))
      .unionAll(best2.select(col("side").as("node"), col("feature"), col("threshold"),
        col("n_left"), col("n_right"), col("mean_left"), col("mean_right"), col("gain")))
      .orderBy("node")
  }

  private val depth2Oracle: String = {
    val gainSql = (p: String) =>
      s"""round(($p.s_left::DOUBLE * $p.s_left::DOUBLE / $p.n_left::DOUBLE
              + (t.s::DOUBLE - $p.s_left::DOUBLE) * (t.s::DOUBLE - $p.s_left::DOUBLE)
                / (t.n::DOUBLE - $p.n_left::DOUBLE)
              - t.s::DOUBLE * t.s::DOUBLE / t.n::DOUBLE) / 1e8, 4)"""
    s"""WITH base AS MATERIALIZED ($baseSql),
          melt1 AS (SELECT 'qty' AS feature, qty AS v, y FROM base
                    UNION ALL SELECT 'disc', disc, y FROM base
                    UNION ALL SELECT 'tax', tax, y FROM base),
          hist1 AS MATERIALIZED (SELECT feature, v, count(*) AS cnt, sum(y) AS sy
                   FROM melt1 GROUP BY 1, 2),
          cum1 AS (SELECT feature, v,
                          sum(cnt) OVER tw AS n_left, sum(sy) OVER tw AS s_left
                   FROM hist1
                   WINDOW tw AS (PARTITION BY feature ORDER BY v ROWS UNBOUNDED PRECEDING)),
          tot1 AS (SELECT feature, sum(cnt) AS n, sum(sy) AS s FROM hist1 GROUP BY 1),
          cand1 AS (SELECT c.feature, c.v AS threshold,
                           c.n_left::BIGINT AS n_left, (t.n - c.n_left)::BIGINT AS n_right,
                           round(c.s_left::DOUBLE / c.n_left / 100, 4) AS mean_left,
                           round((t.s::DOUBLE - c.s_left::DOUBLE) / (t.n - c.n_left) / 100, 4) AS mean_right,
                           ${gainSql("c")} AS gain
                    FROM cum1 c JOIN tot1 t ON c.feature = t.feature
                    WHERE c.n_left < t.n),
          root AS MATERIALIZED (SELECT * FROM cand1
                  ORDER BY gain DESC, feature, threshold LIMIT 1),
          sided AS MATERIALIZED (SELECT b.*,
                   CASE WHEN (CASE r.feature WHEN 'qty' THEN b.qty
                              WHEN 'disc' THEN b.disc ELSE b.tax END) <= r.threshold
                        THEN 'L' ELSE 'R' END AS side
                 FROM base b, root r),
          melt2 AS (SELECT side, 'qty' AS feature, qty AS v, y FROM sided
                    UNION ALL SELECT side, 'disc', disc, y FROM sided
                    UNION ALL SELECT side, 'tax', tax, y FROM sided),
          hist2 AS MATERIALIZED (SELECT side, feature, v, count(*) AS cnt, sum(y) AS sy
                   FROM melt2 GROUP BY 1, 2, 3),
          cum2 AS (SELECT side, feature, v,
                          sum(cnt) OVER tw AS n_left, sum(sy) OVER tw AS s_left
                   FROM hist2
                   WINDOW tw AS (PARTITION BY side, feature ORDER BY v ROWS UNBOUNDED PRECEDING)),
          tot2 AS (SELECT side, feature, sum(cnt) AS n, sum(sy) AS s
                   FROM hist2 GROUP BY 1, 2),
          cand2 AS (SELECT c.side, c.feature, c.v AS threshold,
                           c.n_left::BIGINT AS n_left, (t.n - c.n_left)::BIGINT AS n_right,
                           round(c.s_left::DOUBLE / c.n_left / 100, 4) AS mean_left,
                           round((t.s::DOUBLE - c.s_left::DOUBLE) / (t.n - c.n_left) / 100, 4) AS mean_right,
                           ${gainSql("c")} AS gain
                    FROM cum2 c JOIN tot2 t ON c.side = t.side AND c.feature = t.feature
                    WHERE c.n_left < t.n),
          best2 AS (SELECT * FROM (
                      SELECT *, row_number() OVER (PARTITION BY side
                                ORDER BY gain DESC, feature, threshold) AS rnk
                      FROM cand2) WHERE rnk = 1)
        SELECT 'root' AS node, feature, threshold, n_left, n_right,
               mean_left, mean_right, gain FROM root
        UNION ALL
        SELECT side, feature, threshold, n_left, n_right,
               mean_left, mean_right, gain FROM best2
        ORDER BY node"""
  }

  /** Boosting rounds and shrinkage. Leaf values are quantized to whole
    * cents — floor(mean·η + 0.5) on cross-engine-identical doubles —
    * so residuals stay EXACT integers round over round and every
    * histogram sum stays order-free. */
  val GbtRounds = 3
  val GbtEta = 0.5

  /** Gradient-boosted stumps: each round fits the best single split to
    * the current residuals, predicts η·leaf-mean (quantized to cents),
    * and subtracts. Stump selection chains through 1-row broadcast
    * joins — the whole K-round train is ONE lazy plan. */
  def mlGbtStumps(spark: SparkSession, dir: String): DataFrame = {
    var rows = baseRows(spark, dir).withColumn("r", col("y"))
      .memoized() // scanned K times: materialize the cents once
    val out = (1 to GbtRounds).map { k =>
      val melt = Seq("qty", "disc", "tax")
        .map(f => rows.select(lit(f).as("feature"), col(f).as("v"), col("r")))
        .reduce(_ unionAll _)
      val hist = melt.groupBy("feature", "v")
        .agg(count(lit(1)).as("cnt"), sum(col("r").cast("decimal(38,0)")).as("sr"))
      val w = Window.partitionBy("feature").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("n_left", sum(col("cnt")).over(w))
        .withColumn("s_left", sum(col("sr")).over(w))
      val tot = hist.groupBy("feature")
        .agg(sum(col("cnt")).as("n"), sum(col("sr")).as("s"))
      val best = cum.join(tot, "feature")
        .filter(col("n_left") < col("n"))
        .select(col("feature"), col("v").as("threshold"),
          col("n_left"), (col("n") - col("n_left")).as("n_right"),
          floor(col("s_left").cast("double") / col("n_left") * GbtEta + 0.5)
            .cast("long").as("leaf_left"),
          floor((col("s").cast("double") - col("s_left").cast("double"))
            / (col("n") - col("n_left")) * GbtEta + 0.5).cast("long").as("leaf_right"),
          gainCol(col("n_left"), col("s_left"), col("n"), col("s")).as("g"))
        .orderBy(col("g").desc, col("feature"), col("threshold"))
        .limit(1)
        .select(col("feature").as("bf"), col("threshold").as("bt"),
          col("n_left").as("bnl"), col("n_right").as("bnr"),
          col("leaf_left").as("bll"), col("leaf_right").as("blr"))
      // apply the stump in-plan: 1-row broadcast cross-join, no collect
      rows = rows.crossJoin(broadcast(best))
        .withColumn("fv",
          when(col("bf") === "qty", col("qty"))
            .when(col("bf") === "disc", col("disc"))
            .otherwise(col("tax")))
        .withColumn("r", col("r") -
          when(col("fv") <= col("bt"), col("bll")).otherwise(col("blr")))
        .select("qty", "disc", "tax", "y", "r")
        .truncated()
      val sse = rows.agg(
        count(lit(1)).as("n"),
        sum((col("r").cast("decimal(38,0)") * col("r").cast("decimal(38,0)"))).as("ss"))
        .select(round(col("ss").cast("double") / col("n") / 1e4, 4).as("mse"))
      best.crossJoin(sse).select(lit(k.toLong).as("round"),
        col("bf").as("feature"), col("bt").as("threshold"),
        col("bnl").as("n_left"), col("bnr").as("n_right"),
        col("bll").as("leaf_left"), col("blr").as("leaf_right"), col("mse"))
    }
    out.reduce(_ unionAll _).orderBy("round")
  }

  private val gbtOracle: String = {
    def roundCtes(k: Int): String = {
      val r = s"rows$k"
      val prev = s"rows${k - 1}"
      s"""melt$k AS (SELECT 'qty' AS feature, qty AS v, r FROM $prev
                   UNION ALL SELECT 'disc', disc, r FROM $prev
                   UNION ALL SELECT 'tax', tax, r FROM $prev),
          hist$k AS MATERIALIZED (SELECT feature, v, count(*) AS cnt, sum(r) AS sr
                 FROM melt$k GROUP BY 1, 2),
          cum$k AS (SELECT feature, v,
                         sum(cnt) OVER tw AS n_left,
                         sum(sr) OVER tw AS s_left
                  FROM hist$k
                  WINDOW tw AS (PARTITION BY feature ORDER BY v
                                ROWS UNBOUNDED PRECEDING)),
          tot$k AS (SELECT feature, sum(cnt) AS n, sum(sr) AS s FROM hist$k GROUP BY 1),
          best$k AS MATERIALIZED (
            SELECT c.feature AS bf, c.v AS bt,
                   c.n_left::BIGINT AS bnl, (t.n - c.n_left)::BIGINT AS bnr,
                   CAST(floor(c.s_left::DOUBLE / c.n_left * $GbtEta + 0.5) AS BIGINT) AS bll,
                   CAST(floor((t.s::DOUBLE - c.s_left::DOUBLE) / (t.n - c.n_left) * $GbtEta + 0.5) AS BIGINT) AS blr
            FROM cum$k c JOIN tot$k t ON c.feature = t.feature
            WHERE c.n_left < t.n
            ORDER BY (c.s_left::DOUBLE * c.s_left::DOUBLE / c.n_left::DOUBLE
                      + (t.s::DOUBLE - c.s_left::DOUBLE) * (t.s::DOUBLE - c.s_left::DOUBLE)
                        / (t.n::DOUBLE - c.n_left::DOUBLE)
                      - t.s::DOUBLE * t.s::DOUBLE / t.n::DOUBLE) DESC,
                     c.feature, c.v
            LIMIT 1),
          $r AS MATERIALIZED (
            SELECT qty, disc, tax, y,
                   r - (CASE WHEN (CASE WHEN b.bf = 'qty' THEN qty
                                        WHEN b.bf = 'disc' THEN disc
                                        ELSE tax END) <= b.bt
                             THEN b.bll ELSE b.blr END) AS r
            FROM $prev, best$k b),
          sse$k AS (SELECT round(sum(r::HUGEINT * r::HUGEINT)::DOUBLE / count(*) / 1e4, 4) AS mse
                    FROM $r)"""
    }
    val rounds = (1 to GbtRounds).map(roundCtes).mkString(",\n          ")
    val sel = (1 to GbtRounds).map { k =>
      s"""SELECT $k::BIGINT AS round, bf AS feature, bt AS threshold,
                 bnl AS n_left, bnr AS n_right, bll AS leaf_left, blr AS leaf_right,
                 (SELECT mse FROM sse$k) AS mse
          FROM best$k"""
    }.mkString("\n          UNION ALL ")
    s"""WITH rows0 AS MATERIALIZED (SELECT *, y AS r FROM ($baseSql)),
          $rounds
        $sel ORDER BY round"""
  }

  /** Bivariate OLS (price-cents ~ quantity + discount) via exact
    * integer normal equations — ml_linear_reg generalized to two
    * regressors: ten order-free decimal(38) moments, then Cramer's
    * rule on the 3×3 system as ONE shared SQL formula string that
    * both engines evaluate verbatim (identical operand order by
    * construction — the formula text IS the contract). One pass,
    * zero extra shuffles, moments merge by addition. */
  def mlLinearReg2(spark: SparkSession, dir: String): DataFrame = {
    // y = discounted revenue (exact cents), regressors price + disc:
    // the TRUE law y = price·(1−disc/100) is bilinear, so the linear
    // fit recovers b1 ≈ 1−E[disc]/100, b2 ≈ −E[price]/100 with the
    // interaction residual left in 1−r² — a real approximation
    // quality measurement, not an identity
    val s = reg2MomentsDf(spark, dir)
    val cast = reg2Moments.map(m => expr(s"CAST($m AS DOUBLE) AS $m"))
    s.select(cast: _*).selectExpr("n" +: reg2Formula: _*)
      .select(col("n").cast("long").as("n"), col("b0"), col("b1"), col("b2"), col("r2"))
  }

  /** The one-pass exact moment table (decimal(38) sums over cents)
    * shared by the OLS and ridge tiers. */
  private def reg2MomentsDf(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(spark, dir).select(
      floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
        .cast("long").as("y"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("x1"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("x2"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    b.agg(count(lit(1)).as("n"),
      sum(dec(col("x1"))).as("s1"), sum(dec(col("x2"))).as("s2"),
      sum(dec(col("y"))).as("sy"),
      sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
      sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
      sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
      sum(dec(col("x1")) * dec(col("y"))).as("s1y"),
      sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
  }

  /** The ten moment names and the closed-form solution — ONE text,
    * two engines. */
  private val reg2Moments =
    Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
  private val reg2Formula: Seq[String] = {
    val d = "(n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
    val d0 = "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))"
    val d1 = "(n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))"
    val d2 = "(n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))"
    val sse = s"(syy - 2*(($d0/$d)*sy + ($d1/$d)*s1y + ($d2/$d)*s2y)" +
      s" + (($d0/$d)*($d0/$d)*n + ($d1/$d)*($d1/$d)*s11 + ($d2/$d)*($d2/$d)*s22" +
      s" + 2*($d0/$d)*($d1/$d)*s1 + 2*($d0/$d)*($d2/$d)*s2 + 2*($d1/$d)*($d2/$d)*s12))"
    val sst = "(syy - sy*sy/n)"
    Seq(
      s"round($d0/$d, 4) AS b0",
      s"round($d1/$d, 4) AS b1",
      s"round($d2/$d, 4) AS b2",
      s"round(1 - $sse/$sst, 8) AS r2")
  }

  private val reg2Oracle: String = {
    s"""WITH base AS (
            SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT) AS y,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x1,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2
            FROM lineitem),
          s AS (SELECT count(*) AS n,
                       sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
                       sum(x1::HUGEINT*x1) AS s11, sum(x1::HUGEINT*x2) AS s12,
                       sum(x2::HUGEINT*x2) AS s22, sum(x1::HUGEINT*y) AS s1y,
                       sum(x2::HUGEINT*y) AS s2y, sum(y::HUGEINT*y) AS syy
                FROM base),
          sd AS (SELECT ${reg2Moments.map(m => s"CAST($m AS DOUBLE) AS $m").mkString(", ")} FROM s)
        SELECT CAST(n AS BIGINT) AS n,
               ${reg2Formula.mkString(",\n               ")}
        FROM sd"""
  }

  /** Ridge (Tikhonov) regression on the SAME bivariate system —
    * ml_linear_reg2 with the normal-equation diagonal inflated by a
    * RELATIVE factor [[RidgeInflate]] (s11/s22 × (1 + 1/256)): the per-feature-scaled penalty λ_j = κ·Σx_j², which
    * is scale-invariant (re-uniting a feature leaves the shrinkage
    * identical — the standardized-ridge property without centering
    * passes) and keeps the intercept unpenalized (the n row/column of
    * the system is untouched). r² is computed against the RAW moments
    * — the honest fit of the SHRUNK coefficients, which sits slightly
    * below the OLS r² by construction (Round12Spec asserts both the
    * shrinkage and the r² ordering). Same at-scale shape as the OLS
    * tier: ten order-free decimal(38) moments in ONE pass, Cramer's
    * rule as ONE shared formula text both engines evaluate verbatim. */
  def mlRidge(spark: SparkSession, dir: String): DataFrame = {
    val s = reg2MomentsDf(spark, dir)
    val cast = reg2Moments.map(m => expr(s"CAST($m AS DOUBLE) AS $m"))
    s.select(cast: _*).selectExpr("n" +: ridgeFormula: _*)
      .select(col("n").cast("long").as("n"), col("b0"), col("b1"), col("b2"), col("r2"))
  }

  /** Diagonal inflation 1 + κ with κ = 1/256 — an exact binary
    * fraction, so the literal is the same double in both engines. */
  private val RidgeInflate = "1.00390625"

  private val ridgeFormula: Seq[String] = {
    val p1 = s"(s11 * $RidgeInflate)"
    val p2 = s"(s22 * $RidgeInflate)"
    val d = s"(n*($p1*$p2 - s12*s12) - s1*(s1*$p2 - s12*s2) + s2*(s1*s12 - $p1*s2))"
    val d0 = s"(sy*($p1*$p2 - s12*s12) - s1*(s1y*$p2 - s12*s2y) + s2*(s1y*s12 - $p1*s2y))"
    val d1 = s"(n*(s1y*$p2 - s12*s2y) - sy*(s1*$p2 - s12*s2) + s2*(s1*s2y - s1y*s2))"
    val d2 = s"(n*($p1*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - $p1*s2))"
    // residuals against the DATA (raw moments), not the penalized system
    val sse = s"(syy - 2*(($d0/$d)*sy + ($d1/$d)*s1y + ($d2/$d)*s2y)" +
      s" + (($d0/$d)*($d0/$d)*n + ($d1/$d)*($d1/$d)*s11 + ($d2/$d)*($d2/$d)*s22" +
      s" + 2*($d0/$d)*($d1/$d)*s1 + 2*($d0/$d)*($d2/$d)*s2 + 2*($d1/$d)*($d2/$d)*s12))"
    val sst = "(syy - sy*sy/n)"
    Seq(
      s"round($d0/$d, 4) AS b0",
      s"round($d1/$d, 4) AS b1",
      s"round($d2/$d, 4) AS b2",
      s"round(1 - $sse/$sst, 8) AS r2")
  }

  private val ridgeOracle: String = {
    s"""WITH base AS (
            SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT) AS y,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x1,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2
            FROM lineitem),
          s AS (SELECT count(*) AS n,
                       sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
                       sum(x1::HUGEINT*x1) AS s11, sum(x1::HUGEINT*x2) AS s12,
                       sum(x2::HUGEINT*x2) AS s22, sum(x1::HUGEINT*y) AS s1y,
                       sum(x2::HUGEINT*y) AS s2y, sum(y::HUGEINT*y) AS syy
                FROM base),
          sd AS (SELECT ${reg2Moments.map(m => s"CAST($m AS DOUBLE) AS $m").mkString(", ")} FROM s)
        SELECT CAST(n AS BIGINT) AS n,
               ${ridgeFormula.mkString(",\n               ")}
        FROM sd"""
  }


  /** Smoothed target encoding of order priority against revenue —
    * the feature-engineering transform every tabular pipeline runs on
    * high-cardinality categoricals: enc(g) = (S_g + m·μ)/(n_g + m)
    * with prior weight m = [[TargetEncM]] pseudo-observations at the
    * global mean (the empirical-Bayes shrinkage that keeps rare
    * categories from memorizing noise). S_g and μ's numerator are
    * exact decimal(38) cent sums; the blend is one fixed-order double
    * expression per category.
    * Scale: one map-side-combined pass to |categories| rows; the
    * global mean broadcasts as a 1-row agg. */
  val TargetEncM = 100L
  def mlTargetEncoding(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val b = Tables.orders(spark, dir).select(col("o_orderpriority").as("priority"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
    val g = b.groupBy("priority")
      .agg(count(lit(1)).as("n"), sum(dec(col("y"))).as("s"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"))
    g.crossJoin(broadcast(tot))
      .select(col("priority"), col("n"),
        round(col("s").cast("double") / col("n"), 4).as("raw_mean"),
        round((col("s").cast("double")
            + lit(TargetEncM.toDouble) * (col("ss").cast("double") / col("nn").cast("double")))
          / (col("n").cast("double") + TargetEncM.toDouble), 4).as("encoded"))
      .orderBy("priority")
  }

  private val targetEncodingOracle: String =
    s"""WITH b AS (SELECT o_orderpriority AS priority,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
                   FROM orders),
          g AS (SELECT priority, count(*)::BIGINT AS n, sum(y)::HUGEINT AS s
                FROM b GROUP BY 1),
          t AS (SELECT sum(n)::BIGINT AS nn, sum(s) AS ss FROM g)
        SELECT g.priority, g.n,
               round(CAST(g.s AS DOUBLE) / g.n, 4) AS raw_mean,
               round((CAST(g.s AS DOUBLE)
                      + CAST($TargetEncM AS DOUBLE) * (CAST(t.ss AS DOUBLE) / CAST(t.nn AS DOUBLE)))
                     / (CAST(g.n AS DOUBLE) + CAST($TargetEncM AS DOUBLE)), 4) AS encoded
        FROM g, t ORDER BY priority"""

  /** Welch's two-sample t-test — "is mean revenue different between
    * returned (A) and delivered (N) lineitems", the unequal-variance
    * form every A/B readout should default to: t and the
    * Welch–Satterthwaite df from per-group exact moments (counts,
    * cent sums, cent sums-of-squares — order-free decimal(38)), the
    * whole statistic ONE shared formula text both engines evaluate
    * verbatim on identical doubles. One conditional-aggregation pass,
    * map-side combined; no shuffle beyond the 1-row agg. */
  def mlTtest(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val b = Tables.lineitem(spark, dir).select(col("l_returnflag").as("g"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      .filter(col("g").isin("A", "N"))
    val s = b.agg(
      sum(when(col("g") === "A", 1L).otherwise(0L)).as("n1"),
      sum(when(col("g") === "A", dec(col("y"))).otherwise(lit(0))).as("s1"),
      sum(when(col("g") === "A", dec(col("y")) * dec(col("y"))).otherwise(lit(0))).as("ss1"),
      sum(when(col("g") === "N", 1L).otherwise(0L)).as("n2"),
      sum(when(col("g") === "N", dec(col("y"))).otherwise(lit(0))).as("s2"),
      sum(when(col("g") === "N", dec(col("y")) * dec(col("y"))).otherwise(lit(0))).as("ss2"))
    val cast = ttestMoments.map(m => expr(s"CAST($m AS DOUBLE) AS $m"))
    s.select(cast: _*)
      .selectExpr(Seq("CAST(n1 AS BIGINT) AS n_a", "CAST(n2 AS BIGINT) AS n_n")
        ++ ttestFormula: _*)
  }

  private val ttestMoments = Seq("n1", "s1", "ss1", "n2", "s2", "ss2")

  /** ONE formula text, two engines (the reg2Formula discipline). */
  private val ttestFormula: Seq[String] = {
    val v1 = "((ss1 - s1*s1/n1)/(n1 - 1))"
    val v2 = "((ss2 - s2*s2/n2)/(n2 - 1))"
    val se2 = s"($v1/n1 + $v2/n2)"
    Seq(
      "round(s1/n1, 4) AS mean_a",
      "round(s2/n2, 4) AS mean_n",
      s"round((s1/n1 - s2/n2)/sqrt($se2), 4) AS t",
      s"round($se2*$se2 / (($v1/n1)*($v1/n1)/(n1 - 1) + ($v2/n2)*($v2/n2)/(n2 - 1)), 2) AS df")
  }

  private val ttestOracle: String =
    s"""WITH b AS (SELECT l_returnflag AS g,
                          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
                   FROM lineitem WHERE l_returnflag IN ('A', 'N')),
          s AS (SELECT sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END)::BIGINT AS n1,
                       sum(CASE WHEN g = 'A' THEN y ELSE 0 END)::HUGEINT AS s1,
                       sum(CASE WHEN g = 'A' THEN y::HUGEINT*y ELSE 0 END) AS ss1,
                       sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END)::BIGINT AS n2,
                       sum(CASE WHEN g = 'N' THEN y ELSE 0 END)::HUGEINT AS s2,
                       sum(CASE WHEN g = 'N' THEN y::HUGEINT*y ELSE 0 END) AS ss2
                FROM b),
          sd AS (SELECT ${ttestMoments.map(m => s"CAST($m AS DOUBLE) AS $m").mkString(", ")} FROM s)
        SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_n,
               ${ttestFormula.mkString(",\n               ")}
        FROM sd"""

  /** Poisson-bootstrap confidence interval for mean revenue — the
    * distributed bootstrap (Chamandy et al., Google 2012): resample b
    * gives each row weight w ~ Poisson(1) drawn DETERMINISTICALLY by
    * inverse-CDF over a [0, p) integer grid (p = 2^31-1), so all
    * [[BootB]] resample means come from ONE conditional-aggregation
    * pass — never B shuffles, never a row explosion. Per-row
    * randomness: ONE md5 content hash, then the repo's standard
    * universal-hash family h_b(x) = (a_b*x + b_b) mod p
    * (HashingScheme — the MinHash discipline: pairwise-independent
    * across b, products < 2^62 so no overflow on either engine; a
    * checkpoint barrier keeps CollapseProject from re-inlining the
    * md5 into every threshold compare). The CI is the 2nd-smallest /
    * 2nd-largest of the 32 resample means (~94% interval).
    * Scale: scan-bound — the weights are ~300 integer ops per row
    * inside whole-stage codegen; every aggregate is an exact int64
    * sum (weights <= 8; promote to decimal(38) when n*mean*8 nears
    * 2^63). */
  val BootB = 32
  import graft.functions.HashingScheme.{P => BootP}
  /** floor(CDF_Poisson(1)(j) * p) for j = 0..7 — exact integer
    * thresholds; a draw is the count of thresholds <= the hash. */
  private val bootThresholds: Seq[Long] = {
    val inv_e = math.exp(-1.0)
    val fact = (0 to 7).scanLeft(1.0)((a, i) => if (i == 0) 1.0 else a * i).tail
    val cum = (0 to 7).map(j => inv_e * (0 to j).map(i => 1.0 / fact(i)).sum)
    cum.map(c => math.floor(c * BootP.toDouble).toLong)
  }
  private def bootA(b: Int): Long = graft.functions.HashingScheme.a(b)
  private def bootBOff(b: Int): Long = graft.functions.HashingScheme.b(b)
  /** Weight of resample b from the stored base hash column `x`. */
  private def bootWeightFromX(b: Int): String = {
    val h = s"((${bootA(b)}L * x + ${bootBOff(b)}L) % ${BootP}L)"
    bootThresholds.map(t => s"(CASE WHEN $h >= ${t}L THEN 1 ELSE 0 END)").mkString(" + ")
  }
  private val bootXSql: String =
    "CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), '-', " +
      s"CAST(l_linenumber AS STRING))), 1, 8), 16, 10) AS BIGINT) % ${BootP}L"
  private val bootXDuck: String =
    "('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || " +
      s"CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % $BootP"
  private def bootWeightDuck(b: Int): String = {
    val h = s"((${bootA(b)} * x + ${bootBOff(b)}) % $BootP)"
    bootThresholds.map(t => s"(CASE WHEN $h >= $t THEN 1 ELSE 0 END)").mkString(" + ")
  }

  /** Spec entry points: the exact thresholds, the affine family, and
    * one resample's mean. */
  def bootThresholdsForSpec: Seq[Long] = bootThresholds
  def bootFamilyForSpec(b: Int): (Long, Long, Long) = (bootA(b), bootBOff(b), BootP)
  def bootResampleMeanForSpec(spark: SparkSession, dir: String, b: Int): Double =
    Tables.lineitem(spark, dir)
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y",
        s"$bootXSql AS x")
      .selectExpr(s"round(CAST(sum((${bootWeightFromX(b)}) * y) AS DOUBLE) " +
        s"/ sum(${bootWeightFromX(b)}), 4) AS m")
      .head().getDouble(0)

  def mlBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.lineitem(spark, dir)
      .selectExpr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y",
        s"$bootXSql AS x")
      // barrier: CollapseProject would otherwise inline the md5 into
      // all 256 threshold compares and push the tree out of codegen
      .memoized()
    // long-form (b, y, w): explode the resample spine FIRST, so the
    // per-row generated code is a 3-op affine hash + an 8-compare
    // threshold count — tiny, JIT-friendly, fully codegen'd. (The
    // wide forms fail structurally: 64 aggregates overflow the
    // codegen field budget, and 32 inline weight expressions put 256
    // branches in one generated method — both fall back to
    // interpreted evaluation and run 5-20x slower.)
    val aArr = s"array(${(1 to BootB).map(b => s"${bootA(b)}L").mkString(", ")})"
    val bArr = s"array(${(1 to BootB).map(b => s"${bootBOff(b)}L").mkString(", ")})"
    val chain = bootThresholds
      .map(t => s"(CASE WHEN h >= ${t}L THEN 1 ELSE 0 END)").mkString(" + ")
    val per = hashed
      .select(col("y"), col("x"), explode(expr(s"sequence(1, $BootB)")).as("b"))
      .selectExpr("y", "b",
        s"(element_at($aArr, CAST(b AS INT)) * x + element_at($bArr, CAST(b AS INT))) % ${BootP}L AS h")
      .selectExpr("y", "b", s"($chain) AS w")
      .groupBy("b")
      .agg(sum(col("w") * col("y")).as("s"), sum(col("w")).as("w"))
      // a zero-total-weight resample (P ~ e^-n — unreachable at corpus
      // scale, but the failure mode would be SILENT: its 0/0 mean
      // would drop from collect_list and shift element_at(ms, ·) onto
      // the wrong order statistics) is excluded here and then caught
      // by the size assertion below, so a degenerate draw fails
      // loudly instead of mis-indexing the CI
      .filter(col("w") > 0)
      .select(expr("round(CAST(s AS DOUBLE) / w, 4)").as("m"))
    val ci = per.agg(sort_array(collect_list(col("m"))).as("ms"))
    val tot = hashed.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    tot.crossJoin(broadcast(ci))
      .selectExpr("n", "round(CAST(sy AS DOUBLE) / n, 4) AS mean",
        s"CASE WHEN size(ms) = $BootB THEN element_at(ms, 2) " +
          "ELSE raise_error('bootstrap: degenerate zero-weight resample, ms=' " +
          "|| CAST(size(ms) AS STRING)) END AS ci_lo",
        s"CASE WHEN size(ms) = $BootB THEN element_at(ms, ${BootB - 1}) " +
          "ELSE raise_error('bootstrap: degenerate zero-weight resample') END AS ci_hi",
        s"CAST($BootB AS BIGINT) AS b")
  }

  private val bootOracle: String = {
    val resamples = (1 to BootB).map { b =>
      s"round(CAST(sum((${bootWeightDuck(b)}) * y) AS DOUBLE) / sum(${bootWeightDuck(b)}), 4)"
    }
    s"""WITH base AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
                             $bootXDuck AS x
                      FROM lineitem),
          s AS (SELECT count(*)::BIGINT AS n,
                       round(CAST(sum(y) AS DOUBLE) / count(*), 4) AS mean,
                       list_sort([${resamples.mkString(",\n                       ")}]) AS ms
                FROM base)
        SELECT n, mean, ms[2] AS ci_lo, ms[${BootB - 1}] AS ci_hi,
               CAST($BootB AS BIGINT) AS b
        FROM s"""
  }

  /** One-way ANOVA F-test across the THREE return-flag groups —
    * ml_ttest generalized past two samples: F = (SSB/(k−1)) /
    * (SSW/(N−k)) with SSB/SSW assembled from per-group exact
    * decimal(38) moments gathered by ONE conditional-aggregation pass
    * into a single row (fixed group order baked into the shared
    * formula text — no float sum over a nondeterministic group
    * ordering). Reports eta² = SSB/SST alongside F.
    * Scale: identical to ml_ttest — one map-side-combined pass, 1-row
    * everything after. */
  def mlAnova(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val b = Tables.lineitem(spark, dir).select(col("l_returnflag").as("g"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    val aggs = anovaGroups.zipWithIndex.flatMap { case (g, i) =>
      Seq(sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n${i + 1}"),
        sum(when(col("g") === g, dec(col("y"))).otherwise(lit(0))).as(s"s${i + 1}"),
        sum(when(col("g") === g, dec(col("y")) * dec(col("y"))).otherwise(lit(0))).as(s"ss${i + 1}"))
    }
    val s = b.agg(aggs.head, aggs.tail: _*)
    val names = (1 to anovaGroups.size).flatMap(i => Seq(s"n$i", s"s$i", s"ss$i"))
    s.select(names.map(m => expr(s"CAST($m AS DOUBLE) AS $m")): _*)
      .selectExpr("CAST(n1 + n2 + n3 AS BIGINT) AS n" +: anovaFormula: _*)
  }

  private val anovaGroups = Seq("A", "N", "R")

  /** ONE formula text, two engines; k = 3 groups, fixed order. */
  private val anovaFormula: Seq[String] = {
    val k = anovaGroups.size
    val nAll = "(n1 + n2 + n3)"
    val sAll = "(s1 + s2 + s3)"
    val ssb = s"(s1*s1/n1 + s2*s2/n2 + s3*s3/n3 - $sAll*$sAll/$nAll)"
    val ssw = "((ss1 - s1*s1/n1) + (ss2 - s2*s2/n2) + (ss3 - s3*s3/n3))"
    val sst = s"(ss1 + ss2 + ss3 - $sAll*$sAll/$nAll)"
    Seq(
      s"round($ssb / ${k - 1} / ($ssw / ($nAll - $k)), 4) AS f_stat",
      s"round($ssb / $sst, 8) AS eta2")
  }

  private val anovaOracle: String = {
    val moments = anovaGroups.zipWithIndex.flatMap { case (g, i) =>
      Seq(s"sum(CASE WHEN g = '$g' THEN 1 ELSE 0 END)::BIGINT AS n${i + 1}",
        s"sum(CASE WHEN g = '$g' THEN y ELSE 0 END)::HUGEINT AS s${i + 1}",
        s"sum(CASE WHEN g = '$g' THEN y::HUGEINT*y ELSE 0 END) AS ss${i + 1}")
    }
    val names = (1 to anovaGroups.size).flatMap(i => Seq(s"n$i", s"s$i", s"ss$i"))
    s"""WITH b AS (SELECT l_returnflag AS g,
                          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
                   FROM lineitem),
          s AS (SELECT ${moments.mkString(", ")} FROM b),
          sd AS (SELECT ${names.map(m => s"CAST($m AS DOUBLE) AS $m").mkString(", ")} FROM s)
        SELECT CAST(n1 + n2 + n3 AS BIGINT) AS n,
               ${anovaFormula.mkString(",\n               ")}
        FROM sd"""
  }

  /** Pearson correlation matrix over the four lineitem measures
    * (quantity, price, discount, tax — all exact integer grids): all
    * 14 moments in ONE order-free decimal(38) pass, each of the six
    * pairwise correlations one shared fixed-order formula text, the
    * single result row unpivoted to (var1, var2, corr) tuples.
    * Scale: one map-side-combined agg; everything after is 1-row. */
  def mlCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val b = baseRows(spark, dir)
    val colOf = Map("q" -> "qty", "d" -> "disc", "u" -> "tax", "y" -> "y")
    val sums = corrVars.map(v => sum(dec(col(colOf(v)))).as(s"s_$v"))
    val sqs = corrVars.map(v => sum(dec(col(colOf(v))) * dec(col(colOf(v)))).as(s"s_$v$v"))
    val crosses = corrPairs.map { case (a, c) =>
      sum(dec(col(colOf(a))) * dec(col(colOf(c)))).as(s"s_$a$c") }
    val s = b.agg(count(lit(1)).as("n"), (sums ++ sqs ++ crosses): _*)
    val names = "n" +: (corrVars.map(v => s"s_$v") ++ corrVars.map(v => s"s_$v$v")
      ++ corrPairs.map { case (a, c) => s"s_$a$c" })
    val stackArgs = corrPairs.map { case (a, c) =>
      s"'${corrLabel(a)}', '${corrLabel(c)}', ${corrFormula(a, c)}" }.mkString(", ")
    s.select(names.map(m => expr(s"CAST($m AS DOUBLE) AS $m")): _*)
      .selectExpr(s"stack(${corrPairs.size}, $stackArgs) AS (var1, var2, corr)")
      .orderBy("var1", "var2")
  }

  private val corrVars = Seq("q", "d", "u", "y")
  private val corrPairs = for {
    (a, i) <- corrVars.zipWithIndex; c <- corrVars.drop(i + 1)
  } yield (a, c)
  private def corrLabel(v: String): String =
    Map("q" -> "qty", "d" -> "disc", "u" -> "tax", "y" -> "price")(v)
  /** Shared per-pair formula text (identical operand order on both
    * engines; √ is IEEE-correctly-rounded so no grid is needed). */
  private def corrFormula(a: String, c: String): String =
    s"round((n*s_$a$c - s_$a*s_$c) / " +
      s"(sqrt(n*s_$a$a - s_$a*s_$a) * sqrt(n*s_$c$c - s_$c*s_$c)), 6)"

  private val corrOracle: String = {
    val moments =
      Seq("count(*) AS n") ++
        Seq("q" -> "qty", "d" -> "disc", "u" -> "tax", "y" -> "y").flatMap {
          case (v, c) => Seq(s"sum($c)::HUGEINT AS s_$v", s"sum($c::HUGEINT*$c) AS s_$v$v") } ++
        corrPairs.map { case (a, c) =>
          val (ca, cc) = (Map("q" -> "qty", "d" -> "disc", "u" -> "tax", "y" -> "y")(a),
            Map("q" -> "qty", "d" -> "disc", "u" -> "tax", "y" -> "y")(c))
          s"sum($ca::HUGEINT*$cc) AS s_$a$c" }
    val names = "n" +: (corrVars.map(v => s"s_$v") ++ corrVars.map(v => s"s_$v$v")
      ++ corrPairs.map { case (a, c) => s"s_$a$c" })
    val rows = corrPairs.map { case (a, c) =>
      s"SELECT '${corrLabel(a)}' AS var1, '${corrLabel(c)}' AS var2, ${corrFormula(a, c)} AS corr FROM sd" }
    s"""WITH base AS ($baseSql),
          s AS (SELECT ${moments.mkString(", ")} FROM base),
          sd AS (SELECT ${names.map(m => s"CAST($m AS DOUBLE) AS $m").mkString(", ")} FROM s)
        ${rows.mkString("\n        UNION ALL ")}
        ORDER BY var1, var2"""
  }

  /** Random forest of stumps (Breiman bagging in its deterministic
    * subsample form — "pasting"/subagging): [[RfTrees]] trees, tree b
    * trained on the rows whose md5(rowkey, b) lands under
    * [[RfBagKeep]]/[[RfBagMod]] (≈60% subsample, disjoint hash per
    * tree) with ONE md5-chosen feature dropped per tree (the
    * feature-subspace half of RF), scored by OUT-OF-BAG error — the
    * honest no-holdout generalization estimate — per tree AND for the
    * averaged ensemble (tree = −1 row), whose OOB MSE the spec
    * asserts beats the mean single tree.
    *
    * Scale: all trees train in ONE pass — the bag id is a COLUMN
    * (explode ×B), so the per-(tree, feature, value) histogram is a
    * single map-side-combined groupBy; no per-tree loop, no
    * checkpoint chain (contrast mlGbtStumps, whose rounds are
    * sequential BY NATURE — residuals depend on the prior round;
    * bagging's independence is exactly what buys the parallel shape).
    * Candidate/argmax/leaf tables are all dim-sized; OOB scoring is
    * one broadcast of B stump rows against the ×B row explode. Exact
    * integer moments; every double in pinned operand order. */
  val RfTrees = 4
  val RfBagMod = 10
  val RfBagKeep = 6

  def mlRandomForest(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_quantity").cast("long").as("qty"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("disc"),
      floor(col("l_tax") * 100 + 0.5).cast("long").as("tax"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    val bagged = rows
      .withColumn("b", explode(expr(s"sequence(0L, ${RfTrees - 1}L)")))
      .withColumn("inbag",
        conv(substring(md5(concat(col("ok").cast("string"), lit("_"),
          col("ln").cast("string"), lit("_"), col("b").cast("string"))), 1, 8), 16, 10)
          .cast("long") % RfBagMod < RfBagKeep)
      .withColumn("dropped",
        conv(substring(md5(concat(lit("drop_"), col("b").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 3)
    val melt = Seq(("qty", 0), ("disc", 1), ("tax", 2)).map { case (f, i) =>
      bagged.filter(col("inbag") && col("dropped") =!= i.toLong)
        .select(col("b"), lit(f).as("feature"), col(f).as("v"), col("y"))
    }.reduce(_ unionAll _)
    val hist = melt.groupBy("b", "feature", "v")
      .agg(count(lit(1)).as("cnt"), sum(col("y").cast("decimal(38,0)")).as("sy"))
    val w = Window.partitionBy("b", "feature").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("n_left", sum(col("cnt")).over(w))
      .withColumn("s_left", sum(col("sy")).over(w))
    val tot = hist.groupBy("b", "feature")
      .agg(sum(col("cnt")).as("n"), sum(col("sy")).as("s"))
    val pick = Window.partitionBy("b")
      .orderBy(col("g").desc, col("feature"), col("threshold"))
    val stumps = cum.join(tot, Seq("b", "feature"))
      .filter(col("n_left") < col("n"))
      .select(col("b"), col("feature"), col("v").as("threshold"),
        col("n").as("n_inbag"),
        floor(col("s_left").cast("double") / col("n_left") + 0.5)
          .cast("long").as("leaf_left"),
        floor((col("s").cast("double") - col("s_left").cast("double"))
          / (col("n") - col("n_left")) + 0.5).cast("long").as("leaf_right"),
        gainCol(col("n_left"), col("s_left"), col("n"), col("s")).as("g"))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      // tot.n for the winning feature = that feature frame's row count
      // = the bag size (each in-bag row appears once per feature frame)
      .select(col("b"), col("feature"), col("threshold"),
        col("n_inbag"), col("leaf_left"), col("leaf_right"))
    val st = stumps
      .memoized() // B rows; feeds per-tree OOB AND the ensemble
    val oobRows = bagged.filter(!col("inbag"))
      .join(broadcast(st), Seq("b"))
      .withColumn("fv",
        when(col("feature") === "qty", col("qty"))
          .when(col("feature") === "disc", col("disc"))
          .otherwise(col("tax")))
      .withColumn("pred",
        when(col("fv") <= col("threshold"), col("leaf_left")).otherwise(col("leaf_right")))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perTree = oobRows.groupBy("b")
      .agg(count(lit(1)).as("n_oob"),
        sum(dec(col("y") - col("pred")) * dec(col("y") - col("pred"))).as("ss"))
      .join(st, Seq("b"))
      .select(col("b").as("tree"), col("feature"), col("threshold"),
        col("n_inbag"), col("leaf_left"), col("leaf_right"),
        round(col("ss").cast("double") / col("n_oob") / 1e4, 4).as("oob_mse"))
    val ens = oobRows
      .groupBy("ok", "ln", "y")
      .agg(sum(col("pred")).as("sp"), count(lit(1)).as("np"))
      .withColumn("pred", floor(col("sp").cast("double") / col("np") + 0.5).cast("long"))
      .agg(count(lit(1)).as("n_oob"),
        sum(dec(col("y") - col("pred")) * dec(col("y") - col("pred"))).as("ss"))
      .select(lit(-1L).as("tree"), lit("ensemble").as("feature"),
        lit(-1L).as("threshold"), lit(0L).as("n_inbag"),
        lit(0L).as("leaf_left"), lit(0L).as("leaf_right"),
        round(col("ss").cast("double") / col("n_oob") / 1e4, 4).as("oob_mse"))
    perTree.unionAll(ens).orderBy("tree")
  }

  private val rfOracle: String = {
    val gain = """(c.s_left::DOUBLE * c.s_left::DOUBLE / c.n_left::DOUBLE
                      + (t.s::DOUBLE - c.s_left::DOUBLE) * (t.s::DOUBLE - c.s_left::DOUBLE)
                        / (t.n::DOUBLE - c.n_left::DOUBLE)
                      - t.s::DOUBLE * t.s::DOUBLE / t.n::DOUBLE)"""
    s"""WITH rows0 AS MATERIALIZED (
            SELECT l_orderkey AS ok, l_linenumber AS ln,
                   CAST(l_quantity AS BIGINT) AS qty,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc,
                   CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
            FROM lineitem),
          bagged AS MATERIALIZED (
            SELECT r.*, u.b,
                   ('0x' || substr(md5(CAST(ok AS VARCHAR) || '_' || CAST(ln AS VARCHAR)
                     || '_' || CAST(u.b AS VARCHAR)), 1, 8))::BIGINT % $RfBagMod < $RfBagKeep AS inbag,
                   ('0x' || substr(md5('drop_' || CAST(u.b AS VARCHAR)), 1, 8))::BIGINT % 3 AS dropped
            FROM rows0 r, unnest(generate_series(0, ${RfTrees - 1})) u(b)),
          melt AS (SELECT b, 'qty' AS feature, qty AS v, y FROM bagged WHERE inbag AND dropped <> 0
                   UNION ALL SELECT b, 'disc', disc, y FROM bagged WHERE inbag AND dropped <> 1
                   UNION ALL SELECT b, 'tax', tax, y FROM bagged WHERE inbag AND dropped <> 2),
          hist AS MATERIALIZED (SELECT b, feature, v, count(*) AS cnt, sum(y) AS sy
                 FROM melt GROUP BY 1, 2, 3),
          cum AS (SELECT b, feature, v,
                         sum(cnt) OVER tw AS n_left,
                         sum(sy) OVER tw AS s_left
                  FROM hist
                  WINDOW tw AS (PARTITION BY b, feature ORDER BY v
                                ROWS UNBOUNDED PRECEDING)),
          tot AS (SELECT b, feature, sum(cnt) AS n, sum(sy) AS s FROM hist GROUP BY 1, 2),
          st AS MATERIALIZED (SELECT b, feature, threshold, n_inbag, leaf_left, leaf_right FROM (
            SELECT c.b, c.feature, c.v AS threshold,
                   t.n::BIGINT AS n_inbag,
                   CAST(floor(c.s_left::DOUBLE / c.n_left + 0.5) AS BIGINT) AS leaf_left,
                   CAST(floor((t.s::DOUBLE - c.s_left::DOUBLE) / (t.n - c.n_left) + 0.5) AS BIGINT) AS leaf_right,
                   row_number() OVER (PARTITION BY c.b
                     ORDER BY $gain DESC, c.feature, c.v) AS rn
            FROM cum c JOIN tot t ON c.b = t.b AND c.feature = t.feature
            WHERE c.n_left < t.n) WHERE rn = 1),
          oob AS MATERIALIZED (
            SELECT g.b, g.ok, g.ln, g.y,
                   CASE WHEN (CASE WHEN s.feature = 'qty' THEN g.qty
                                   WHEN s.feature = 'disc' THEN g.disc
                                   ELSE g.tax END) <= s.threshold
                        THEN s.leaf_left ELSE s.leaf_right END AS pred
            FROM bagged g JOIN st s ON g.b = s.b WHERE NOT g.inbag),
          per_tree AS (
            SELECT o.b AS tree, s.feature, s.threshold, s.n_inbag,
                   s.leaf_left, s.leaf_right,
                   round(sum((o.y - o.pred)::HUGEINT * (o.y - o.pred))::DOUBLE
                         / count(*) / 1e4, 4) AS oob_mse
            FROM oob o JOIN st s ON o.b = s.b
            GROUP BY 1, 2, 3, 4, 5, 6),
          ens_rows AS (
            SELECT ok, ln, y,
                   CAST(floor(sum(pred)::DOUBLE / count(*) + 0.5) AS BIGINT) AS pred
            FROM oob GROUP BY 1, 2, 3),
          ens AS (SELECT CAST(-1 AS BIGINT) AS tree, 'ensemble' AS feature,
                         CAST(-1 AS BIGINT) AS threshold, CAST(0 AS BIGINT) AS n_inbag,
                         CAST(0 AS BIGINT) AS leaf_left, CAST(0 AS BIGINT) AS leaf_right,
                         round(sum((y - pred)::HUGEINT * (y - pred))::DOUBLE
                               / count(*) / 1e4, 4) AS oob_mse
                  FROM ens_rows)
        SELECT * FROM per_tree UNION ALL SELECT * FROM ens ORDER BY tree"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ml_tree_stump", mlTreeStump, Some(stumpOracle)),
    QueryDef("ml_tree_depth2", mlTreeDepth2, Some(depth2Oracle)),
    QueryDef("ml_gbt_stumps", mlGbtStumps, Some(gbtOracle)),
    QueryDef("ml_random_forest", mlRandomForest, Some(rfOracle)),
    QueryDef("ml_linear_reg2", mlLinearReg2, Some(reg2Oracle)),
    QueryDef("ml_ridge", mlRidge, Some(ridgeOracle)),
    QueryDef("ml_ttest", mlTtest, Some(ttestOracle)),
    QueryDef("ml_target_encoding", mlTargetEncoding, Some(targetEncodingOracle)),
    QueryDef("ml_anova", mlAnova, Some(anovaOracle)),
    QueryDef("ml_bootstrap_ci", mlBootstrapCi, Some(bootOracle)),
    QueryDef("ml_corr_matrix", mlCorrMatrix, Some(corrOracle)),
  )
}
