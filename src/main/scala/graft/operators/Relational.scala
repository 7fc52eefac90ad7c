package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Relational / OLAP operators.
  *
  * Reference semantics: /root/reference/main/scala/ca/uwaterloo/cs451/a6/
  * Q1.scala:47-66 (filter-count), Q2.scala:108-122 (join+top20),
  * Q3.scala:96-105 (map-side join via broadcast), Q4.scala:120-152
  * (4-way join + per-nation counts) — re-expressed as declarative
  * DataFrame plans so Catalyst handles pushdown/pruning/join strategy,
  * plus the standard OLAP idioms (TPC-H Q1/Q6 shapes, window top-k,
  * rollup, sessionization) the toolkit's SQL surface implies.
  *
  * Scale notes (100 TB): q1/q6 are scan+partial-agg, zero wide shuffle;
  * q3 broadcasts both dims (map-side join, zero shuffle); q2/q4/q8 do
  * ONE shuffle on the join key each — the date filter collapses the
  * fact side first, and AQE converts the shrunken side to broadcast at
  * runtime. customer is NOT force-broadcast (it scales with SF; the
  * reference's collectAsMap would OOM the driver at scale).
  */
object Relational {
  val ShipDate  = "1996-01-02"
  val Q5Cutoff  = "1998-09-02"
  val Q9Thresh  = 450000.0
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min in micros
  val HourUs: Long = 3600L * 1000 * 1000

  /** a6 Q1: count of lineitems shipped on a given day (pushdown scan). */
  def q1FilterCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) === lit(ShipDate))
      .agg(count(lit(1)).as("cnt"))

  /** a6 Q2: orders that had a lineitem shipped on the day; first 20 by key.
    * (reference cogroups orders×lineitem and emits one row per order). */
  def q2JoinTop20(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) === lit(ShipDate))
      .select(col("l_orderkey")).distinct()
    Tables.orders(spark, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("priority"), col("o_orderkey").as("orderkey"))
      .orderBy("orderkey")
      .limit(20)
  }

  /** a6 Q3: lineitems on the day with part/supplier names — both dims
    * broadcast (the reference hand-rolls this with collectAsMap). The
    * explicit hints are REFERENCE FIDELITY (the map-side join IS the
    * a6 Q3 assignment), not the at-scale plan: part/supplier grow with
    * SF, so at 100x a forced broadcast turns multi-GB — there you drop
    * the hints and let AQE pick broadcast only while the dims fit. */
  def q3BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) === lit(ShipDate))
    li.join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("linenumber"),
        col("p_name").as("part_name"),
        col("s_name").as("supp_name"))
      .orderBy("orderkey", "linenumber")
      .limit(20)
  }

  /** a6 Q4: shipments per nation on the day (li⋈orders⋈customer⋈nation). */
  def q4NationCount(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) === lit(ShipDate))
      .select(col("l_orderkey"))
    li.join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey").as("nationkey"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("shipments"))
      .orderBy("nationkey")
  }

  /** TPC-H Q1 idiom: grouped pricing summary with partial (map-side) aggs. */
  def q5AggPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(to_date(col("l_shipdate")) <= lit(Q5Cutoff))
      .groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("returnflag", "linestatus")

  /** TPC-H Q6 idiom: selective filter + single aggregate (no shuffle). */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        to_date(col("l_shipdate")).between(lit("1996-01-01"), lit("1996-12-31")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Window top-k: 3 highest-value orders per priority class. */
  def q7TopkWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("long")) // bigint: DuckDB row_number parity
      .filter(col("rnk") <= 3)
      .select(
        col("o_orderpriority").as("priority"),
        col("rnk"),
        col("o_orderkey").as("orderkey"),
        col("o_totalprice").as("totalprice"))
      .orderBy("priority", "rnk")
  }

  /** q7 again through the heap-based `top_k_pairs` aggregate — the
    * at-scale form (map-side bounded heaps; shuffles ≤ k rows per group
    * per partition instead of sorting whole groups). Same oracle as q7. */
  def q7TopkAgg(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.topKPerGroupAgg(
        Tables.orders(spark, dir).select(
          col("o_orderpriority").as("priority"),
          col("o_totalprice").as("totalprice"),
          col("o_orderkey").as("orderkey")),
        part = "priority", ordCol = "totalprice", payloadCol = "orderkey", k = 3)
      .orderBy("priority", "rnk")

  /** Snowflake join: 1996 revenue per region (5-way join, dims broadcast). */
  /** Snowflake revenue rollup. The two dim broadcasts are EXPLICIT
    * here for oracle determinism, but are not load-bearing: CboSpec
    * proves the identical plan shape (broadcast dims, no cartesian,
    * exact same answer) falls out of `ANALYZE TABLE … FOR ALL
    * COLUMNS` + spark.sql.cbo with ZERO hints, even from a scrambled
    * dims-first join order — the 100 TB posture, where you analyze
    * the warehouse once and let stats drive join order and build-side
    * choice instead of hand-hinting every query. */
  def q8RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(to_date(col("o_orderdate")).between(lit("1996-01-01"), lit("1996-12-31")))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("region")
  }

  /** Semi + anti join: customers with orders but none above the threshold. */
  def q9SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    Tables.customer(spark, dir)
      .join(orders.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .join(orders.filter(col("o_totalprice") > Q9Thresh).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
      .orderBy("custkey")
  }

  /** ROLLUP hierarchical aggregate (nulls normalized to 'ALL' for the oracle). */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("cnt"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Sessionization: per-user sessions split on >30 min inactivity gaps
    * (lag + running sum of session-break flags). One shuffle on user_id;
    * at scale the window partitions by user so state never concentrates. */
  def q11Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > SessionGapUs, 1).otherwise(0))
      .withColumn("sess_no",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        expr("min(ts_us) div 1000").as("start_ms"),
        expr("max(ts_us) div 1000").as("end_ms"))
      .select(col("user_id"), col("sess_no").cast("long").as("session_id"),
        col("n_events"), col("sum_value"), col("start_ms"), col("end_ms"))
      .orderBy("user_id", "session_id")
  }

  /** Tumbling 1 h window aggregate by event type (batch mirror of the
    * a7 streaming shape; arithmetic window start so the oracle is exact). */
  def q12EventWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .groupBy(col("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour_ms", "event_type")

  /** Spark's NATIVE sketch aggregates — HLL++ distinct counts and
    * GK approximate percentiles per group, SPEC-ONLY since r13: their
    * merge states are arrival-order-dependent and not SQL-expressible
    * by construction, so this surface is bounded against exact answers
    * in OperatorsSpec rather than hash-compared to DuckDB. The
    * REGISTERED q13 entry ([[q13ApproxSketch]]) now computes the same
    * report on the value-verified deterministic sketch family. */
  def nativeSketchForSpec(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_price"))
      .orderBy("returnflag")

  /** q13 — the sketch REPORT per returnflag (approx distinct orders /
    * parts + p50/p99 price), re-registered (r13) on the VALUE-VERIFIED
    * deterministic sketch family so the whole report hash-matches
    * DuckDB: distinct counts from the q60 deterministic-register HLL
    * (order-free register file, exact integer harmonic denominator)
    * and percentiles from the q45 hash-sample rank sketch. The native
    * HLL++/GK surface this entry used to exercise lives on as
    * [[nativeSketchForSpec]] with spec-bounded error.
    * Scale: identical to q60/q45 — bounded register/sample state per
    * group, map-side combine everywhere; never ∝ n. */
  def q13ApproxSketch(spark: SparkSession, dir: String): DataFrame =
    q60HllDeterministic(spark, dir)
      .select(col("returnflag"), col("hll_orders").as("approx_orders"),
        col("hll_parts").as("approx_parts"))
      .join(q45ApproxPercentile(spark, dir)
        .select(col("returnflag"), col("p50_price"), col("p99_price")), "returnflag")
      .orderBy("returnflag")

  private lazy val q13OracleSql: String =
    s"""SELECT h.returnflag,
               h.hll_orders AS approx_orders, h.hll_parts AS approx_parts,
               p.p50_price, p.p99_price
        FROM ($hllOracleSql) h JOIN ($pctOracleSql) p
          ON h.returnflag = p.returnflag
        ORDER BY h.returnflag"""

  /** Hash-sampled approximate percentiles per returnflag — the ORACLE-
    * CHECKABLE sibling of q13's percentile_approx half (the q43/KMV
    * discipline applied to quantiles): a DETERMINISTIC md5 row-sample
    * (1/PctSampleMod of rows, keyed on the (orderkey, linenumber) row
    * identity) replaces the GK/KLL sketch whose compactor state depends
    * on arrival order, and the p50/p99 are EXACT discrete percentiles
    * of that sample — rank ceil(p·n) under the total order (price,
    * orderkey, linenumber), zero float estimation arithmetic, so DuckDB
    * replays it to the bit. Error is classic sampling error
    * (O(1/√(p(1−p)n)) quantile deviation; spec-bounded vs the exact
    * percentiles). Scale: the groupwise sort window runs over the
    * SAMPLE only — that is the sketch's entire point; at 100 TB you
    * shrink the sampling rate, not the algorithm. */
  val PctSampleMod = 4
  def q45ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("returnflag"),
        col("l_extendedprice").as("price"), col("l_orderkey"), col("l_linenumber"))
      .filter(conv(substring(md5(concat_ws("_",
          col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))), 1, 8),
        16, 10).cast("long") % PctSampleMod === 0)
    val ranked = s
      .withColumn("rn", row_number().over(Window.partitionBy("returnflag")
        .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("returnflag")))
    ranked.groupBy("returnflag").agg(
        max(when(col("rn") === ceil(col("n") * lit(0.5)), col("price"))).as("p50_price"),
        max(when(col("rn") === ceil(col("n") * lit(0.99)), col("price"))).as("p99_price"),
        max(col("n")).as("n_sample"))
      .orderBy("returnflag")
  }

  private lazy val pctOracleSql: String =
    s"""WITH s AS (SELECT l_returnflag AS returnflag, l_extendedprice AS price,
                          l_orderkey, l_linenumber
                   FROM lineitem
                   WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
                            CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
                         % $PctSampleMod = 0),
          ranked AS (SELECT returnflag, price,
                            row_number() OVER (PARTITION BY returnflag
                              ORDER BY price, l_orderkey, l_linenumber) AS rn,
                            count(*) OVER (PARTITION BY returnflag) AS n
                     FROM s)
        SELECT returnflag,
               max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN price END) AS p50_price,
               max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN price END) AS p99_price,
               max(n) AS n_sample
        FROM ranked GROUP BY returnflag ORDER BY returnflag"""

  /** Theta-sketch-style SET-OPERATION cardinalities over KMV sketches —
    * the "how many users in A∪B / A∩B without touching the raw sets"
    * sketch algebra (Dasgupta et al., the DataSketches theta design)
    * on the deterministic KMV base q43 established: A = customers
    * ordering before [[SetopsSplitDate]], B = after. Union sketch =
    * k smallest of A∪B (one kmin_distinct over all rows); intersection
    * uses the theta rule est∩ = ρ·est∪ with ρ = |{h ∈ union sketch :
    * h ∈ A-sketch ∧ h ∈ B-sketch}|/k — every h in the union sketch
    * that belongs to A is provably in A's own k-min (kth(A) ≥ kth(A∪B)),
    * so the membership test over truncated sketches is exact. Exact
    * counts ride along to expose the sketch error. All arithmetic is
    * integer until the one division + 4-dp round per estimate — DuckDB
    * replays sketches AND estimators bit-for-bit.
    *
    * Scale: three bounded k-long sketches + one boolean-flag distinct
    * agg; the orders scan never shuffles more than (custkey, side)
    * pairs, and sketch merge is map-side. At 100 TB this is THE way
    * to answer overlap questions — the exact columns become the thing
    * you can no longer afford, the sketch columns don't change cost. */
  val SetopsSplitDate = "1998-07-01"
  def q46SketchSetops(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val k = KmvK
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("ck"),
        (to_date(col("o_orderdate")) < lit(SetopsSplitDate)).as("isa"))
      .distinct()
    val h = o.select(col("isa"),
      (conv(substring(md5(col("ck").cast("string")), 1, 8), 16, 10)
        .cast("long") + lit(1L)).as("x"))
    val sk = h.agg(
      expr(s"kmin_distinct(CASE WHEN isa THEN array(x) END, $k)").as("sa"),
      expr(s"kmin_distinct(CASE WHEN NOT isa THEN array(x) END, $k)").as("sb"),
      expr(s"kmin_distinct(array(x), $k)").as("su"))
    val flags = o.groupBy("ck").agg(
      max(when(col("isa"), 1L).otherwise(0L)).as("ina"),
      max(when(!col("isa"), 1L).otherwise(0L)).as("inb"))
    val exact = flags.agg(
      sum(col("ina")).as("exact_a"), sum(col("inb")).as("exact_b"),
      count(lit(1)).as("exact_union"),
      sum(col("ina") * col("inb")).as("exact_inter"))
    val c = (k - 1).toDouble * 4294967296.0
    def est(s: Column): Column =
      when(size(s) < k, size(s).cast("double"))
        .otherwise(round(lit(c) / element_at(s, k), 4))
    sk.crossJoin(exact)
      .withColumn("n_both", expr(
        "size(filter(su, h -> array_contains(sa, h) AND array_contains(sb, h)))"))
      .select(
        est(col("sa")).as("est_a"), est(col("sb")).as("est_b"),
        est(col("su")).as("est_union"),
        when(size(col("su")) < k, col("n_both").cast("double"))
          .otherwise(round(col("n_both").cast("double") *
            (lit(c) / element_at(col("su"), k)) / k, 4)).as("est_inter"),
        col("exact_a"), col("exact_b"), col("exact_union"), col("exact_inter"))
  }

  private lazy val setopsOracleSql: String = {
    val k = KmvK
    val c = (k - 1).toLong * 4294967296L
    s"""WITH o AS (SELECT DISTINCT o_custkey AS ck,
                          CAST(o_orderdate AS DATE) < DATE '$SetopsSplitDate' AS isa
                   FROM orders),
          h AS (SELECT ck, isa,
                       ('0x' || substr(md5(CAST(ck AS VARCHAR)), 1, 8))::BIGINT + 1 AS x
                FROM o),
          sa AS (SELECT x FROM (SELECT DISTINCT x FROM h WHERE isa) ORDER BY x LIMIT $k),
          sb AS (SELECT x FROM (SELECT DISTINCT x FROM h WHERE NOT isa) ORDER BY x LIMIT $k),
          su AS (SELECT x FROM (SELECT DISTINCT x FROM h) ORDER BY x LIMIT $k),
          sta AS (SELECT count(*) AS m, max(x) AS xk FROM sa),
          stb AS (SELECT count(*) AS m, max(x) AS xk FROM sb),
          stu AS (SELECT count(*) AS m, max(x) AS xk FROM su),
          nb AS (SELECT count(*) AS n_both FROM su
                 WHERE x IN (SELECT x FROM sa) AND x IN (SELECT x FROM sb)),
          fl AS (SELECT ck, max(CASE WHEN isa THEN 1 ELSE 0 END) AS ina,
                        max(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS inb
                 FROM o GROUP BY ck),
          ex AS (SELECT CAST(sum(ina) AS BIGINT) AS exact_a,
                        CAST(sum(inb) AS BIGINT) AS exact_b,
                        count(*) AS exact_union,
                        CAST(sum(ina * inb) AS BIGINT) AS exact_inter FROM fl)
        SELECT CASE WHEN sta.m < $k THEN sta.m::DOUBLE ELSE round($c / sta.xk::DOUBLE, 4) END AS est_a,
               CASE WHEN stb.m < $k THEN stb.m::DOUBLE ELSE round($c / stb.xk::DOUBLE, 4) END AS est_b,
               CASE WHEN stu.m < $k THEN stu.m::DOUBLE ELSE round($c / stu.xk::DOUBLE, 4) END AS est_union,
               CASE WHEN stu.m < $k THEN nb.n_both::DOUBLE
                    ELSE round(nb.n_both::DOUBLE * ($c / stu.xk::DOUBLE) / $k, 4) END AS est_inter,
               ex.exact_a, ex.exact_b, ex.exact_union, ex.exact_inter
        FROM sta, stb, stu, nb, ex"""
  }

  /** KMV approximate distinct counts per returnflag — the ORACLE-
    * CHECKABLE sibling of q13's HLL/KLL sketches: k-minimum-value
    * sketches over md5-hashed keys are deterministic, so DuckDB
    * replays the identical sketch and estimator where HLL register
    * states cannot be expressed in SQL. Estimator (k−1)·2³²/x_k once
    * saturated, exact m below k; single division + single 4-dp round
    * per group, identical on both engines. Built on the native
    * `kmin_distinct` bounded-set aggregate (map-side ≤ k longs per
    * group — the sketch never materializes its input). */
  val KmvK = 256
  def q43ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    def xv(c: String): Column =
      conv(substring(md5(col(c).cast("string")), 1, 8), 16, 10).cast("long") + lit(1L)
    def est(s: Column): Column =
      when(size(s) < KmvK, size(s).cast("double"))
        .otherwise(round(lit((KmvK - 1).toDouble * 4294967296.0) / element_at(s, KmvK), 4))
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("returnflag"),
        array(xv("l_orderkey")).as("xo"), array(xv("l_partkey")).as("xp"))
      .groupBy("returnflag")
      .agg(expr(s"kmin_distinct(xo, $KmvK)").as("so"),
        expr(s"kmin_distinct(xp, $KmvK)").as("sp"))
      .select(col("returnflag"),
        est(col("so")).as("approx_orders"), est(col("sp")).as("approx_parts"))
      .orderBy("returnflag")
  }

  private lazy val kmvOracleSql: String = {
    val k = KmvK
    val c = (k - 1).toLong * 4294967296L
    def sk(key: String) =
      s"""(SELECT rf, count(*) AS m, max(x) AS xk FROM (
            SELECT rf, x, row_number() OVER (PARTITION BY rf ORDER BY x) AS rk FROM (
              SELECT DISTINCT l_returnflag AS rf,
                ('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT + 1 AS x
              FROM lineitem)) WHERE rk <= $k GROUP BY rf)"""
    s"""SELECT o.rf AS returnflag,
               CASE WHEN o.m < $k THEN o.m::DOUBLE ELSE round($c / o.xk::DOUBLE, 4) END AS approx_orders,
               CASE WHEN p.m < $k THEN p.m::DOUBLE ELSE round($c / p.xk::DOUBLE, 4) END AS approx_parts
        FROM ${sk("l_orderkey")} o JOIN ${sk("l_partkey")} p ON o.rf = p.rf
        ORDER BY returnflag"""
  }

  /** DETERMINISTIC-REGISTER HyperLogLog distinct counts per returnflag
    * — q13's native-HLL half re-expressed with the q43/KMV discipline
    * so the SKETCH ITSELF is oracle-replayable (Flajolet et al. 2007):
    * register index j = top HllP bits of the 32-bit md5 key hash,
    * register value M_j = max over keys of ρ(w) (leading-zero run of
    * the low 20 hash bits, +1). max is ORDER-FREE, so unlike Spark's
    * native HLL++ merge state the register file is a pure function of
    * the key SET — any arrival order, any partitioning, any engine
    * produces the identical m=4096 registers. The harmonic-mean
    * denominator Σ 2^(−M_j) is kept EXACT as the integer Σ 2^(21−M_j)
    * (BIGINT — every term ≥ 1, no float summation order anywhere);
    * the only float ops are the final α·m²·2²¹ / S division and the
    * small-range linear-counting branch m·ln(m/V) — one scalar op
    * each, bit-identical across engines, rounded to 4 dp. Scale:
    * sketch state is ≤ m registers per group with map-side max
    * combine — never ∝ n — the production cardinality shape at
    * 100 TB, now with a value-verified register file. */
  val HllP = 12
  val HllM = 1 << HllP            // 4096 registers
  val HllWBits = 32 - HllP        // 20 low bits feed ρ
  private val HllAlphaNum: Double = // α_m · m² · 2^(WBits+1)
    0.7213 / (1 + 1.079 / HllM) * HllM.toDouble * HllM.toDouble *
      (1L << (HllWBits + 1)).toDouble
  def q60HllDeterministic(spark: SparkSession, dir: String): DataFrame = {
    val wMod = 1L << HllWBits
    val rhoMax = HllWBits + 1
    def estimate(key: String, out: String): DataFrame = {
      val h = conv(substring(md5(col(key).cast("string")), 1, 8), 16, 10).cast("long")
      val regs = Tables.lineitem(spark, dir)
        .select(col("l_returnflag").as("returnflag"),
          shiftright(h, HllWBits).as("j"), (h % wMod).as("w"))
        .select(col("returnflag"), col("j"),
          when(col("w") === 0L, lit(rhoMax))
            .otherwise(lit(rhoMax) - length(conv(col("w"), 10, 2))).as("rho"))
        .groupBy("returnflag", "j").agg(max(col("rho")).as("mj"))
      val agg = regs.groupBy("returnflag").agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rhoMax - mj)")).as("sp"),
        count(lit(1)).as("np"))
      val st = col("sp") + (lit(HllM.toLong) - col("np")) * lit(1L << rhoMax)
      val vz = lit(HllM.toLong) - col("np")
      val raw = lit(HllAlphaNum) / st
      agg.select(col("returnflag"),
        round(when(raw <= lit(2.5 * HllM) && vz > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / vz))
          .otherwise(raw), 4).as(out))
    }
    estimate("l_orderkey", "hll_orders")
      .join(estimate("l_partkey", "hll_parts"), "returnflag")
      .orderBy("returnflag")
  }

  private lazy val hllOracleSql: String = {
    val (m, wMod, rhoMax) = (HllM, 1L << HllWBits, HllWBits + 1)
    // Double.toString is the shortest decimal that roundtrips — DuckDB
    // parses it back to the identical IEEE754 value Spark's literal holds
    val aNum = HllAlphaNum.toString
    def est(key: String, out: String) =
      s"""(SELECT rf, round(CASE WHEN ($aNum / st) <= ${2.5 * m} AND vz > 0
                 THEN $m.0 * ln($m.0 / vz) ELSE $aNum / st END, 4) AS $out FROM (
            SELECT rf, sp + ($m - np) * ${1L << rhoMax} AS st, $m - np AS vz FROM (
              SELECT rf, sum((CAST(1 AS BIGINT) << ($rhoMax - mj))) AS sp,
                     count(*) AS np FROM (
                SELECT rf, j, max(rho) AS mj FROM (
                  SELECT rf, h // $wMod AS j,
                         CASE WHEN h % $wMod = 0 THEN $rhoMax
                              ELSE $rhoMax - length(bin(h % $wMod)) END AS rho
                  FROM (SELECT l_returnflag AS rf,
                          ('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT AS h
                        FROM lineitem))
                GROUP BY rf, j)
              GROUP BY rf)))"""
    s"""SELECT o.rf AS returnflag, o.hll_orders, p.hll_parts
        FROM ${est("l_orderkey", "hll_orders")} o
        JOIN ${est("l_partkey", "hll_parts")} p ON o.rf = p.rf
        ORDER BY returnflag"""
  }

  /** Count-min sketch heavy hitters — the third classic sketch next to
    * the KMV (distinct) and HLL (q13) tiers: CmsD×CmsW bounded counters
    * (md5 row-hashes), per-key estimate = min over rows of its counter,
    * top HhTopK keys by estimate. est ≥ true count always (collisions
    * only inflate — CmsSpec asserts the bound); state is D×W counters
    * regardless of key cardinality, and the counter build is one
    * map-side-combinable groupBy — the bounded-memory path to "which
    * keys dominate this 100 TB table". Candidate estimation here scans
    * distinct keys (toy-scale convenience); at scale candidates come
    * from a sample or a prior round, and the sketch is merged across
    * partitions/days by plain counter addition. Deterministic hashes ⇒
    * the DuckDB oracle replays counters, estimates and ranking. */
  val CmsD = 4
  val CmsW = 1024
  val HhTopK = 20
  def q44HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.lineitem(spark, dir).select(col("l_partkey").as("k"))
    // ONE md5 per key row: the 32-hex digest carries four independent
    // 8-hex chunks — row j's bucket reads chars 8j+1..8j+8 — so the
    // counter build hashes each row once, not CmsD times
    def buckets(k: Column): Column = {
      val h = md5(k.cast("string"))
      array((0 until CmsD).map { j =>
        conv(substring(h, 8 * j + 1, 8), 16, 10).cast("long") % CmsW
      }: _*)
    }
    val cms = keys.select(posexplode(buckets(col("k"))).as(Seq("j", "b")))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val est = keys.distinct()
      .select(col("k"), posexplode(buckets(col("k"))).as(Seq("j", "b")))
      .join(cms, Seq("j", "b"))
      .groupBy("k").agg(min(col("c")).as("est"))
    est.orderBy(col("est").desc, col("k")).limit(HhTopK)
      .select(col("k").as("partkey"), col("est"))
  }

  private lazy val cmsOracleSql: String = {
    val chunks = (0 until CmsD).map(j =>
      s"('0x' || substr(h, ${8 * j + 1}, 8))::BIGINT % $CmsW").mkString(", ")
    s"""WITH keys AS MATERIALIZED (SELECT l_partkey AS k FROM lineitem),
          hk AS MATERIALIZED (SELECT k, md5(CAST(k AS VARCHAR)) AS h FROM keys),
          hb AS MATERIALIZED (SELECT k, unnest([$chunks]) AS b,
                 generate_subscripts([$chunks], 1) - 1 AS j
               FROM hk),
          cms AS MATERIALIZED (SELECT j, b, count(*) AS c FROM hb GROUP BY 1, 2),
          ch AS (SELECT DISTINCT k, j, b FROM hb),
          est AS (SELECT ch.k, min(cms.c) AS est
                  FROM ch JOIN cms ON cms.j = ch.j AND cms.b = ch.b
                  GROUP BY ch.k)
        SELECT k AS partkey, est FROM est
        ORDER BY est DESC, k LIMIT $HhTopK"""
  }

  /** As-of (temporal) join, composed from a running window rather than a
    * custom physical operator (Spark's sort on (user, ts) makes the
    * "latest signup at or before each event" a running max — the
    * sort-merge as-of technique; no per-row probe, one shuffle on user). */
  def q14AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("signup_us",
        max(when(col("event_type") === "signup", col("ts_us"))).over(w))
      .select(col("event_id"), col("user_id"),
        expr("ts_us div 1000").as("ts_ms"),
        expr("signup_us div 1000").as("last_signup_ms"))
      .orderBy("event_id")
  }

  /** CUBE grouping sets (all flag×status subtotal combinations). */
  def q15Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("cnt"), col("sum_price"))
      .orderBy("returnflag", "linestatus")

  /** Moving window frame: 7-row trailing average of daily revenue. */
  def q16MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("day"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .withColumn("ma7", round(avg(col("revenue")).over(w), 2))
      .orderBy("day")
  }

  /** Semi-structured: extract a field from the JSON props column and
    * aggregate by its bucket (get_json_object is codegen'd; at scale
    * prefer from_json with an explicit schema once fields stabilize). */
  def q17JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("cnt"), round(avg(col("value")), 6).as("avg_value"))
      .orderBy("k_bucket")

  /** Table profiling over orders (generic impl: GraftOps.profile). */
  def q18ProfileOrders(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.profile(Tables.orders(spark, dir)).orderBy("column")

  private val profileOracle: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    cols.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
                 count(*) - count($c) AS n_nulls,
                 count(DISTINCT $c) AS n_distinct,
                 CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
          FROM orders""").mkString("\n UNION ALL ") + "\n ORDER BY \"column\""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q18_profile", q18ProfileOrders, Some(profileOracle)),
    QueryDef("q1_filter_count", q1FilterCount, Some(
      s"SELECT count(*) AS cnt FROM lineitem WHERE CAST(l_shipdate AS DATE) = DATE '$ShipDate'")),
    QueryDef("q2_join_top20", q2JoinTop20, Some(
      s"""SELECT o.o_orderpriority AS priority, o.o_orderkey AS orderkey
          FROM orders o
          JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                WHERE CAST(l_shipdate AS DATE) = DATE '$ShipDate') l
            ON l.l_orderkey = o.o_orderkey
          ORDER BY orderkey LIMIT 20""")),
    QueryDef("q3_broadcast_join", q3BroadcastJoin, Some(
      s"""SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber,
                 p.p_name AS part_name, s.s_name AS supp_name
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          WHERE CAST(l.l_shipdate AS DATE) = DATE '$ShipDate'
          ORDER BY orderkey, linenumber LIMIT 20""")),
    QueryDef("q4_nation_count", q4NationCount, Some(
      s"""SELECT n.n_nationkey AS nationkey, n.n_name AS nation, count(*) AS shipments
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE CAST(l.l_shipdate AS DATE) = DATE '$ShipDate'
          GROUP BY 1, 2 ORDER BY nationkey""")),
    QueryDef("q5_agg_pricing", q5AggPricing, Some(
      s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
                 round(sum(l_quantity), 2) AS sum_qty,
                 round(sum(l_extendedprice), 2) AS sum_base,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                 round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                 round(avg(l_quantity), 6) AS avg_qty,
                 round(avg(l_extendedprice), 6) AS avg_price,
                 round(avg(l_discount), 6) AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) <= DATE '$Q5Cutoff'
          GROUP BY 1, 2 ORDER BY returnflag, linestatus""")),
    QueryDef("q6_revenue", q6Revenue, Some(
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),
    QueryDef("q7_topk_window", q7TopkWindow, Some(
      """SELECT priority, rnk, orderkey, totalprice FROM (
           SELECT o_orderpriority AS priority,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
                  o_orderkey AS orderkey, o_totalprice AS totalprice
           FROM orders) WHERE rnk <= 3 ORDER BY priority, rnk""")),
    QueryDef("q7_topk_agg", q7TopkAgg, Some(
      """SELECT priority, rnk, orderkey, totalprice FROM (
           SELECT o_orderpriority AS priority,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
                  o_orderkey AS orderkey, o_totalprice AS totalprice
           FROM orders) WHERE rnk <= 3 ORDER BY priority, rnk""")),
    QueryDef("q8_region_revenue", q8RegionRevenue, Some(
      """SELECT r.r_name AS region,
                round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
         GROUP BY 1 ORDER BY region""")),
    QueryDef("q9_semi_anti", q9SemiAnti, Some(
      s"""SELECT c_custkey AS custkey, c_name AS name FROM customer c
          WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > $Q9Thresh)
          ORDER BY custkey""")),
    QueryDef("q10_rollup", q10Rollup, Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""")),
    QueryDef("q11_sessionize", q11Sessionize, Some(
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
           l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
           s AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${SessionGapUs} THEN 1 ELSE 0 END AS brk FROM l),
           c AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sess_no FROM s)
          SELECT user_id, CAST(sess_no AS BIGINT) AS session_id, count(*) AS n_events,
                 round(sum(value), 2) AS sum_value,
                 min(ts_us) // 1000 AS start_ms, max(ts_us) // 1000 AS end_ms
          FROM c GROUP BY user_id, sess_no ORDER BY user_id, session_id""")),
    // r13: the former one-permanent-rows-only entry is retired at the
    // inventory level — q13's report is re-registered on the
    // value-verified deterministic sketch family (q60 register-HLL +
    // q45 hash-sample percentiles), hash-green like every other entry.
    // Spark's NATIVE HLL++/GK surface (arrival-order-dependent merge
    // state, not SQL-expressible) remains covered spec-only via
    // nativeSketchForSpec's error bounds.
    QueryDef("q13_approx_sketch", q13ApproxSketch, Some(q13OracleSql)),
    QueryDef("q43_approx_distinct", q43ApproxDistinct, Some(kmvOracleSql)),
    QueryDef("q60_hll_deterministic", q60HllDeterministic, Some(hllOracleSql)),
    QueryDef("q44_heavy_hitters", q44HeavyHitters, Some(cmsOracleSql)),
    QueryDef("q45_approx_percentile", q45ApproxPercentile, Some(pctOracleSql)),
    QueryDef("q46_sketch_setops", q46SketchSetops, Some(setopsOracleSql)),
    QueryDef("q14_asof_join", q14AsofJoin, Some(
      """SELECT event_id, user_id, epoch_us(ts) // 1000 AS ts_ms,
                (max(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING)) // 1000 AS last_signup_ms
         FROM events ORDER BY event_id""")),
    QueryDef("q15_cube", q15Cube, Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                count(*) AS cnt, round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""")),
    QueryDef("q17_json_extract", q17JsonExtract, Some(
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
                count(*) AS cnt, round(avg(value), 6) AS avg_value
         FROM events GROUP BY 1 ORDER BY k_bucket""")),
    QueryDef("q16_moving_avg", q16MovingAvg, Some(
      """WITH daily AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
                              round(sum(l_extendedprice), 2) AS revenue
                        FROM lineitem GROUP BY 1)
         SELECT day, revenue,
                round(avg(revenue) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
         FROM daily ORDER BY day""")),
    QueryDef("q12_event_window", q12EventWindow, Some(
      s"""SELECT (epoch_us(ts) // ${HourUs}) * 3600000 AS hour_ms, event_type,
                 count(*) AS cnt, round(sum(value), 2) AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""")),
  )
}
