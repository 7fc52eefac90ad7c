package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables

/** Second tier of relational surface: reshaping (pivot/unpivot), set
  * operations, correlated-subquery decorrelation, and range joins.
  *
  * Scale notes:
  *  - q19 pivot: EXPLICIT pivot values (no driver-side distinct-collect
  *    to discover them) → single groupBy, map-side partial agg of
  *    #groups × #values cells.
  *  - q20 set ops: INTERSECT/EXCEPT compile to aggregate/anti-join on
  *    the key — one shuffle each on custkey.
  *  - q21: the correlated `l_quantity < 0.2 · avg per part` subquery is
  *    written decorrelated (per-part agg + equi-join) — the form that
  *    scales; Catalyst reaches the same plan when fed the subquery.
  *  - q22 range join: the naive form is a BroadcastNestedLoopJoin (per-
  *    row range probes). We compute the bucket id arithmetically and
  *    equi-join the bucket dim — O(1) per row, broadcast, zero range
  *    scan; the DuckDB oracle uses the declarative non-equi join to
  *    prove the rewrite exact.
  *  - q23 unpivot: per-row expand (no shuffle) then map-side partial agg.
  */
object Relational2 {
  val Priorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  val BucketWidth = 50.0
  val NBuckets = 10

  /** Pivot: yearly revenue per order priority, priorities as columns. */
  def q19Pivot(spark: SparkSession, dir: String): DataFrame = {
    val renamed = Priorities.map(p => (p, "p" + p.charAt(0))) // p1..p5: stable ANSI column names
    val df = Tables.orders(spark, dir)
      .withColumn("year", year(to_date(col("o_orderdate"))).cast("long"))
      .groupBy("year")
      .pivot("o_orderpriority", Priorities)
      .agg(round(sum(col("o_totalprice")), 2))
    renamed.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }
      .orderBy("year")
  }

  /** INTERSECT / EXCEPT: customers ordering in both 1995 and 1996 vs
    * only in 1995, tagged and unioned. */
  def q20Setops(spark: SparkSession, dir: String): DataFrame = {
    def custsIn(yr: Int): DataFrame =
      Tables.orders(spark, dir)
        .filter(year(to_date(col("o_orderdate"))) === yr)
        .select(col("o_custkey").as("custkey")).distinct()
    val both = custsIn(1995).intersect(custsIn(1996)).withColumn("tag", lit("both"))
    val only95 = custsIn(1995).except(custsIn(1996)).withColumn("tag", lit("only_1995"))
    both.unionAll(only95).orderBy("tag", "custkey")
  }

  /** TPC-H Q17 idiom: revenue lost to small orders — lineitems under
    * 20% of their part's average quantity (decorrelated per-part avg). */
  def q21Correlated(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val partAvg = li.groupBy(col("l_partkey").as("ak"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(partAvg, col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** Range join: events bucketed by value range against a bucket dim.
    * Implemented as arithmetic bucket id + broadcast equi-join (the
    * 100 TB form); oracle joins on lo <= value < hi (the spec'd
    * semantics) — identical because the dim IS the arithmetic grid. */
  def q22RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = (0 until NBuckets)
      .map(i => (i.toLong, i * BucketWidth, (i + 1) * BucketWidth, s"bucket_$i"))
      .toDF("bucket_id", "lo", "hi", "label")
    Tables.events(spark, dir)
      .withColumn("bucket_id", floor(col("value") / BucketWidth))
      .join(broadcast(dim), "bucket_id")
      .groupBy("bucket_id", "label")
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("bucket_id")
  }

  /** Unpivot: lineitem measure columns melted to (measure, val) rows,
    * then per-measure stats — the wide→long reshape. */
  def q23Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy("measure")
      .agg(count(lit(1)).as("cnt"), round(sum(col("val")), 2).as("sum_val"),
        round(avg(col("val")), 6).as("avg_val"))
      .orderBy("measure")

  /** Rank-function tier: ntile decile + percent_rank/cume_dist per
    * priority, summarized per (priority, decile). min/max aggregates
    * only — order-independent, so double summation order can't perturb
    * the oracle hash. Full (price, orderkey) tie-break makes every rank
    * deterministic. */
  def q24WindowStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("priority"))
      .orderBy(col("tp"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), col("o_totalprice").as("tp"),
        col("o_orderkey"))
      .withColumn("tile", ntile(10).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy("priority", "tile")
      .agg(count(lit(1)).as("cnt"),
        round(min(col("pr")), 6).as("min_pr"),
        round(max(col("cd")), 6).as("max_cd"),
        round(min(col("tp")), 2).as("min_price"),
        round(max(col("tp")), 2).as("max_price"))
      .orderBy("priority", "tile")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`: value at rank (n−1)·p with linear
    * interpolation — deterministic on the sorted multiset, no
    * summation-order sensitivity). The constant-memory at-scale form is
    * q13's approx_percentile sketch; this is the exact baseline. */
  def q25Percentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 2).as("p75"),
        round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99"))
      .orderBy("returnflag")

  /** Incremental merge (upsert): a derived delta batch (every 7th order
    * re-priced and re-statused) replaces its base rows latest-wins; the
    * merged table is summarized per status. The delta derives
    * DETERMINISTICALLY from orders so the DuckDB oracle rebuilds it
    * bit-for-bit. Generic core: [[graft.api.GraftOps.upsertByKey]]. */
  def q26Upsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
    val delta = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000)
    graft.api.GraftOps.upsertByKey(base, delta, "o_orderkey")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("status")
  }

  /** SCD snapshot diff: two keyed snapshots (1996 cutoff vs 1997 cutoff
    * with deterministic synthetic edits/deletes) classified added /
    * removed / changed / unchanged via one full outer join.
    * Generic core: [[graft.api.GraftOps.snapshotDiff]]. */
  def q27ScdDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val snap1 = o.filter(to_date(col("o_orderdate")) < lit("1997-01-01"))
    val snap2 = o.filter(to_date(col("o_orderdate")) < lit("1998-01-01"))
      .filter(col("o_orderkey") % 11 =!= 0) // synthetic deletes
      .withColumn("o_orderstatus",          // synthetic edits
        when(col("o_orderkey") % 5 === 0, lit("P")).otherwise(col("o_orderstatus")))
    graft.api.GraftOps
      .snapshotDiff(snap1, snap2, "o_orderkey", Seq("o_orderstatus", "o_totalprice"))
      .groupBy("change_type").agg(count(lit(1)).as("cnt"))
      .orderBy("change_type")
  }

  /** Explicit GROUPING SETS (beyond q10 ROLLUP / q15 CUBE): chosen
    * subtotal combinations with grouping indicators distinguishing
    * "NULL because subtotal" from data NULLs. */
  def q28GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_flag"), col("g_status"), col("cnt"), col("sum_qty"))
      .orderBy("returnflag", "linestatus", "g_status")

  /** Frame-navigation window functions: first/last/nth value over an
    * explicit full-partition frame (the default frame stops at
    * CURRENT ROW — spelled out so both engines agree). */
  def q29FrameNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("priority")).orderBy(col("tp"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), col("o_totalprice").as("tp"),
        col("o_orderkey"))
      .withColumn("lo", first(col("tp")).over(w))
      .withColumn("hi", last(col("tp")).over(w))
      .withColumn("second", nth_value(col("tp"), 2).over(w))
      .groupBy("priority")
      .agg(round(min(col("lo")), 2).as("min_price"),
        round(max(col("hi")), 2).as("max_price"),
        round(min(col("second")), 2).as("second_price"),
        count(lit(1)).as("cnt"))
      .orderBy("priority")
  }

  /** RANGE window frame: per-day revenue plus the revenue of the
    * trailing 7-day VALUE range (not 7 rows — days with no shipments
    * leave real gaps that ROWS frames would silently bridge). */
  def q30RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
      .withColumn("day_no", datediff(col("d"), lit("1995-01-01")).cast("long"))
    val w = Window.orderBy(col("day_no")).rangeBetween(-6, 0)
    daily
      .withColumn("rev7d", round(sum(col("revenue")).over(w), 2))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("revenue"), col("rev7d"))
      .orderBy("day")
  }

  /** Time-series gap filling: a generated day spine left-joined to the
    * daily aggregate so empty days materialize as zero rows (resample
    * semantics). The spine derives from the data's own min/max — a
    * 1-row agg exploded in-row, no driver round-trip. */
  val GapFillDiscount = 0.09 // selective slice → real empty days to fill
  def q31GapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .filter(col("l_discount") > GapFillDiscount)
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("revenue"))
    val spine = Tables.lineitem(spark, dir)
      .agg(min(to_date(col("l_shipdate"))).as("lo"), max(to_date(col("l_shipdate"))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    spine.join(daily, Seq("d"), "left")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_items"), lit(0L)).as("n_items"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        col("n_items").isNull.as("gap"))
      .orderBy("day")
  }

  private val bucketDimSql: String =
    (0 until NBuckets)
      .map(i => s"(${i}, CAST(${i * BucketWidth} AS DOUBLE), CAST(${(i + 1) * BucketWidth} AS DOUBLE), 'bucket_$i')")
      .mkString("(VALUES ", ", ", ") d(bucket_id, lo, hi, label)")

  /** Equi-width histogram of l_extendedprice per return flag: global
    * [min, max] bounds in one tiny agg (a 1-row broadcast scalar — no
    * driver round-trip), then bucket ids computed arithmetically per
    * row. Two scan-speed passes, one small shuffle on (flag, bucket) —
    * the standard first-look distribution profile at 100 TB. The top
    * value is clamped into the last bucket (least), matching every SQL
    * width_bucket convention for the right edge. */
  val HistBuckets = 10
  def q35Histogram(spark: SparkSession, dir: String): DataFrame =
    histogramOf(Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice",
      HistBuckets)

  /** The generic equi-width histogram behind q35 — exposed so the
    * degenerate inputs the TPC-H data can't produce stay spec-covered. */
  def histogramOf(df: DataFrame, flag: String, value: String,
                  buckets: Int): DataFrame = {
    val bounds = df.agg(min(col(value)).as("lo"), max(col(value)).as("hi"))
    df.crossJoin(broadcast(bounds))
      // hi = lo (every value equal) would divide by zero and produce
      // null buckets — a degenerate column must land in ONE bucket 0
      .withColumn("bucket", when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(lit(buckets - 1),
          floor((col(value) - col("lo")) / (col("hi") - col("lo")) * buckets)))
        .cast("long"))
      .groupBy(col(flag), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        round(min(col(value)), 2).as("lo_val"),
        round(max(col(value)), 2).as("hi_val"))
      .orderBy(flag, "bucket")
  }

  /** 2-D skyline (Pareto frontier): the parts no other part beats on
    * BOTH price (lower better) and size (higher better). Distributed
    * two-phase plan: phase 1 computes each hash partition's local
    * skyline with a per-partition sorted window (sort by price asc,
    * size desc — a point is dominated iff the running max size over
    * strictly-preceding points reaches its own); the local pass can
    * only discard globally-dominated points, so phase 2 re-runs the
    * same rule globally on the (tiny) surviving candidate set. The
    * global window sorts ONLY candidates — the full table never sees a
    * single-task sort. Ids join back on the skyline points at the end. */
  val SkylinePartitions = 32
  def q36Skyline(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val pts = part.select(col("p_retailprice").as("price"), col("p_size").as("size"))
      .distinct()
    val lw = Window.partitionBy(col("pid"))
      .orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts
      .withColumn("pid", pmod(xxhash64(col("price"), col("size")), lit(SkylinePartitions)))
      .withColumn("runmax", max(col("size")).over(lw))
      .filter(col("runmax").isNull || col("runmax") < col("size"))
      .select("price", "size")
    val gw = Window.orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = local
      .withColumn("runmax", max(col("size")).over(gw))
      .filter(col("runmax").isNull || col("runmax") < col("size"))
      .select("price", "size")
    part.join(sky,
        part("p_retailprice") === sky("price") && part("p_size") === sky("size"))
      .select(col("p_partkey"), round(col("p_retailprice"), 2).as("price"), col("p_size").as("size"))
      .orderBy("p_partkey")
  }

  /** Market-basket association rules over order baskets — the classic
    * retail-analytics co-occurrence op (Agrawal/Srikant): pairs of
    * parts bought in the same order with count ≥ [[AssocMinCount]],
    * scored by support, both-direction confidence, and lift. All four
    * scores are one exact-integer-operand double division inside a
    * 6-dp round — bit-replayable.
    *
    * Scale: pair enumeration is WITHIN-basket (TPC-H baskets are ≤ 7
    * items, real carts bounded too — fan-out is Σ|basket|², never
    * catalog²); the pair groupBy shuffles candidate pairs only, item
    * counts join back keyed on item, and the order total rides along
    * as a broadcast 1-row aggregate. The support threshold prunes
    * BEFORE the scoring joins — at 100 TB you raise it, the plan
    * doesn't change. */
  val AssocMinCount = 2L
  def q47AssocRules(spark: SparkSession, dir: String): DataFrame =
    assocRulesFrom(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())

  /** The rules core over any distinct (ok, pk) basket frame. */
  def assocRulesFrom(b: DataFrame): DataFrame = {
    val nOrders = b.select(countDistinct(col("ok")).as("n_orders"))
    val items = b.groupBy(col("pk")).agg(count(lit(1)).as("n_i"))
    val pairs = b.as("x").join(b.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= AssocMinCount)
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    pairs
      .join(items.select(col("pk").as("a"), col("n_i").as("n_a")), Seq("a"))
      .join(items.select(col("pk").as("b"), col("n_i").as("n_b")), Seq("b"))
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"),
        round(d(col("n_ab")) / d(col("n_orders")), 6).as("support"),
        round(d(col("n_ab")) / d(col("n_a")), 6).as("conf_ab"),
        round(d(col("n_ab")) / d(col("n_b")), 6).as("conf_ba"),
        round((d(col("n_ab")) * d(col("n_orders"))) /
              (d(col("n_a")) * d(col("n_b"))), 6).as("lift"))
      .orderBy("a", "b")
  }

  private val assocOracle: String =
    s"""WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
          items AS (SELECT pk, count(*) AS n_i FROM b GROUP BY 1),
          pairs AS (SELECT x.pk AS a, y.pk AS b, count(*) AS n_ab
                    FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
                    GROUP BY 1, 2 HAVING count(*) >= $AssocMinCount)
        SELECT p.a, p.b, p.n_ab,
               round(p.n_ab::DOUBLE / n.n_orders::DOUBLE, 6) AS support,
               round(p.n_ab::DOUBLE / ia.n_i::DOUBLE, 6) AS conf_ab,
               round(p.n_ab::DOUBLE / ib.n_i::DOUBLE, 6) AS conf_ba,
               round((p.n_ab::DOUBLE * n.n_orders::DOUBLE) /
                     (ia.n_i::DOUBLE * ib.n_i::DOUBLE), 6) AS lift
        FROM pairs p JOIN items ia ON p.a = ia.pk JOIN items ib ON p.b = ib.pk, n
        ORDER BY a, b"""

  /** RFM customer segmentation — the classic warehouse scoring: per
    * purchasing customer, Recency (days since last order vs the
    * data-derived anchor), Frequency (order count), Monetary (exact
    * cent total), each quintile-scored 1–5 and combined into the
    * 3-digit segment. Quintiles come from GraftOps.globalRank (the
    * distributed sample-sort rank — NO single-partition ntile window)
    * with min-rank tie semantics, so equal metrics always share a
    * score and the oracle's rank() window replays it exactly;
    * quintile index = ((rank−1)·5) div n in exact integer arithmetic. */
  def q52Rfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      unix_micros(col("o_orderdate")).as("us"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val anchor = o.agg(max(col("us")).as("mx"))
    val rfm = o.groupBy("o_custkey")
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        expr("(mx - last_us) div 86400000000").as("recency_days"),
        col("frequency"), col("monetary"))
      .memoized() // three rank passes + the size scalar read it
    val n = rfm.crossJoin(broadcast(rfm.agg(count(lit(1)).as("nn"))))
    val ranked = Seq(("recency_days", "rr"), ("frequency", "fr"), ("monetary", "mr"))
      .foldLeft(n) { case (df, (m, r)) => graft.api.GraftOps.globalRank(df, Seq(m), r) }
    ranked.select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
        (lit(5L) - expr("((rr - 1) * 5) div nn")).as("r_score"),
        (expr("((fr - 1) * 5) div nn") + 1L).as("f_score"),
        (expr("((mr - 1) * 5) div nn") + 1L).as("m_score"))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .orderBy("o_custkey")
  }

  private val rfmOracle: String =
    s"""WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) AS us,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                   FROM orders),
          a AS (SELECT max(us) AS mx FROM o),
          rfm AS (SELECT o_custkey, (a.mx - max(us)) // 86400000000 AS recency_days,
                         count(*) AS frequency, sum(cents)::BIGINT AS monetary
                  FROM o, a GROUP BY o_custkey, a.mx),
          r AS (SELECT *, rank() OVER (ORDER BY recency_days) AS rr,
                       rank() OVER (ORDER BY frequency) AS fr,
                       rank() OVER (ORDER BY monetary) AS mr,
                       count(*) OVER () AS n
                FROM rfm)
        SELECT o_custkey, recency_days, frequency, monetary,
               5 - ((rr - 1) * 5 // n) AS r_score,
               ((fr - 1) * 5 // n) + 1 AS f_score,
               ((mr - 1) * 5 // n) + 1 AS m_score,
               (5 - ((rr - 1) * 5 // n)) * 100 + (((fr - 1) * 5 // n) + 1) * 10
                 + (((mr - 1) * 5 // n) + 1) AS segment
        FROM r ORDER BY o_custkey"""

  /** Per-group MODE (most frequent value, ties → smallest value — a
    * deterministic rule both engines implement identically) next to
    * the exact interpolated median — the two order statistics q25's
    * percentile family doesn't cover. Mode = one (group, value)
    * histogram + a per-group argmax window (PARTITIONED window, never
    * global); median reuses the exact `percentile` ≡ DuckDB
    * quantile_cont discipline. */
  def q53ModeMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("qty"), col("l_extendedprice"))
    val hist = li.groupBy("g", "qty").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("g").orderBy(col("cnt").desc, col("qty"))
    val mode = hist.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("g"), col("qty").as("mode_qty"), col("cnt").as("mode_count"))
    val med = li.groupBy("g")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 2).as("median_price"),
        count(lit(1)).as("n"))
    mode.join(med, "g")
      .select(col("g").as("returnflag"), col("mode_qty"), col("mode_count"),
        col("median_price"), col("n"))
      .orderBy("returnflag")
  }

  private val modeMedianOracle: String =
    """WITH li AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS qty,
                          l_extendedprice FROM lineitem),
          hist AS (SELECT g, qty, count(*) AS cnt FROM li GROUP BY 1, 2),
          mode AS (SELECT g, qty AS mode_qty, cnt AS mode_count FROM (
                SELECT g, qty, cnt,
                       row_number() OVER (PARTITION BY g ORDER BY cnt DESC, qty) AS rn
                FROM hist) WHERE rn = 1),
          med AS (SELECT g, round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
                         count(*) AS n
                  FROM li GROUP BY 1)
        SELECT m.g AS returnflag, m.mode_qty, m.mode_count, d.median_price, d.n
        FROM mode m JOIN med d USING (g) ORDER BY returnflag"""

  /** q63: median absolute deviation per group — the robust dispersion
    * stat (outlier-immune where stddev is not; every anomaly baseline
    * wants it next to the median). Two exact-percentile passes over
    * exact integer cents: med = percentile(cents, .5), MAD =
    * percentile(|cents − med|, .5). Deviations are half-integer
    * doubles (ints minus a mid-pair interpolation), so both
    * percentile interpolations are exact and the q53 parity
    * discipline (Spark `percentile` ≡ DuckDB `quantile_cont`)
    * carries over unchanged.
    * Scale: two scan+agg passes; the per-group medians ride back as a
    * broadcast \|groups\|-row table. */
  def q63Mad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type").as("g"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val med = ev.groupBy("g")
      .agg(expr("percentile(cents, 0.5)").as("med"), count(lit(1)).as("n"))
    ev.join(broadcast(med), "g")
      .select(col("g"), col("med"), col("n"),
        abs(col("cents") - col("med")).as("dv"))
      .groupBy("g")
      .agg(max(col("n")).as("n"), // constant per group — order-free carry
        round(max(col("med")), 2).as("median_cents"),
        round(expr("percentile(dv, 0.5)"), 2).as("mad_cents"))
      .select(col("g").as("event_type"), col("n"),
        col("median_cents"), col("mad_cents"))
      .orderBy("event_type")
  }

  private val madOracle: String =
    """WITH ev AS (SELECT event_type AS g,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                   FROM events),
          med AS (SELECT g, quantile_cont(cents, 0.5) AS med, count(*) AS n
                  FROM ev GROUP BY 1),
          dev AS (SELECT e.g, m.med, m.n, abs(e.cents - m.med) AS dv
                  FROM ev e JOIN med m USING (g))
        SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n,
               round(max(med), 2) AS median_cents,
               round(quantile_cont(dv, 0.5), 2) AS mad_cents
        FROM dev GROUP BY g ORDER BY event_type"""

  /** q64: WEIGHTED percentiles per group — the price point below
    * which half (/ 90%) of the QUANTITY sits, not half the rows: the
    * inventory/revenue-weighted stat unweighted percentile misreads
    * whenever row weights are skewed. LOWER weighted percentile
    * (smallest value whose cumulative weight clears p·W) — pure
    * integer arithmetic end to end (cents, quantities, a cross-
    * multiplied threshold compare), no interpolation, so the oracle
    * hash-verifies with zero float risk.
    * Scale: one (group, value) histogram groupBy, one ordered window
    * cumsum over the \|distinct values\| histogram (not the rows),
    * group totals broadcast back. */
  def q64WeightedPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("g"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        col("l_quantity").cast("long").as("w"))
    val hist = li.groupBy("g", "cents").agg(sum(col("w")).as("hw"))
    val win = Window.partitionBy("g").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cw", sum(col("hw")).over(win))
    val tot = li.groupBy("g").agg(sum(col("w")).as("tw"))
    cum.join(broadcast(tot), "g")
      .groupBy("g")
      .agg(max(col("tw")).as("total_weight"),
        min(when(col("cw") * 2 >= col("tw"), col("cents"))).as("wmedian_cents"),
        min(when(col("cw") * 10 >= col("tw") * 9, col("cents"))).as("wp90_cents"))
      .select(col("g").as("returnflag"), col("total_weight"),
        col("wmedian_cents"), col("wp90_cents"))
      .orderBy("returnflag")
  }

  /** q65: gaps-and-islands — per-user consecutive-DAY activity
    * streaks via the rank-difference trick (day − row_number is
    * constant exactly along a run of consecutive days), the classic
    * islands technique q11's timeout sessionization doesn't cover:
    * here adjacency is calendar-arithmetic (dense integer days), not
    * a gap threshold on raw timestamps. All integer counts.
    * Scale: the (user, day) activity set is the only corpus-sized
    * relation (distinct = one shuffle, ∝ user-days not events); the
    * window partitions BY USER — per-partition state is one user's
    * days, nothing global. */
  def q65Streaks(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val streaks = active
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
    streaks.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), sum(col("len")).as("n_active_days"),
        max(col("len")).as("max_streak"))
      .orderBy("user_id")
  }

  private val streaksOracle: String =
    """WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         g AS (SELECT user_id, day,
                      day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
               FROM e),
         s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
       SELECT user_id, count(*) AS n_streaks,
              CAST(sum(len) AS BIGINT) AS n_active_days,
              CAST(max(len) AS BIGINT) AS max_streak
       FROM s GROUP BY 1 ORDER BY user_id"""

  /** q66: month-over-month revenue growth per region — the period-
    * over-period KPI every dashboard leads with: monthly order
    * revenue (EXACT cents) per region with the % change vs the prior
    * month from a lag window. The first month of each region is
    * honestly NULL (no prior period), not 0.
    * Scale: dims (nation/region) broadcast; the orders↔customer join
    * shuffles on the int custkey; the monthly agg is map-side
    * combined down to |regions|×|months| rows, and the lag window
    * partitions BY REGION over that tiny relation — nothing
    * corpus-sized ever sorts. */
  def q66MomGrowth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long").as("ym"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val dims = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"))
    val monthly = o.join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy("region", "ym")
      .agg(sum(col("cents")).as("cents"))
    val w = Window.partitionBy("region").orderBy("ym")
    monthly
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .select(col("region"), col("ym"), col("cents"),
        round((col("cents") - col("prev")).cast("double") /
          col("prev").cast("double"), 6).as("growth_pct"))
      .orderBy("region", "ym")
  }

  /** q67: exact Gini coefficient of revenue concentration per return
    * flag — the inequality KPI ("what share of revenue sits in the
    * top lineitems"), computed WITHOUT ranking rows: items sharing a
    * cent value v occupy a contiguous rank block, so the classic
    * G = (2·Σᵢ rankᵢ·xᵢ − (n+1)·Σx) / (n·Σx) folds over the VALUE
    * HISTOGRAM — 2·Σ rank·x = Σᵥ v·(2·nᵥ·cum_beforeᵥ + nᵥ·(nᵥ+1)),
    * every term an exact decimal(38) integer (the doubled form keeps
    * the triangular number even — no /2, no rounding anywhere before
    * the single final division).
    * Scale: the cumsum window runs over the DISTINCT-cent-value
    * histogram per group (the q64 discipline — value-grid-bounded,
    * not corpus-bounded); the corpus-sized work is one map-side-
    * combined count. */
  def q67Gini(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val hist = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("g"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("nv"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cb", coalesce(sum(col("nv")).over(w), lit(0L)))
      .groupBy("g")
      .agg(sum(dec(col("nv"))).as("n"),
        sum(dec(col("v")) * dec(col("nv"))).as("t"),
        sum(dec(col("v")) * (dec(col("nv")) * dec(col("cb")) * 2
          + dec(col("nv")) * (dec(col("nv")) + 1))).as("s2"))
      .select(col("g"), col("n").cast("long").as("n"),
        col("t").cast("long").as("cents"),
        round((col("s2").cast("double") - (col("n") + 1).cast("double") * col("t").cast("double")) /
          (col("n").cast("double") * col("t").cast("double")), 6).as("gini"))
      .orderBy("g")
  }

  /** q73: basket-size distribution — lineitems per order as an exact
    * histogram with shares and cumulative shares (the order-shape
    * profile behind picking bucketing/batching constants). Shuffle ∝
    * orders (one count per orderkey, map-side combined); the share
    * window runs over the size histogram — bounded by the max basket
    * size, a data-model constant. */
  def q73BasketSize(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_orders"))
    val w = Window.orderBy("sz").rowsBetween(Window.unboundedPreceding, 0)
    val tot = sizes.agg(sum(col("n_orders")).as("n_tot"))
    sizes
      .withColumn("cum", sum(col("n_orders")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("sz").as("basket_size"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n_tot").cast("double"), 6)
          .as("share"),
        round(col("cum").cast("double") / col("n_tot").cast("double"), 6)
          .as("cum_share"))
      .orderBy("basket_size")
  }

  /** q75: Pareto/ABC concentration — "how few customers cover 80% of
    * revenue", the actionable sibling of q67's Gini: rank customers
    * by exact revenue cents DESCENDING and take the smallest prefix
    * whose cumulative revenue clears 4/5 of the total
    * (cross-multiplied integer compares — no float, no interpolation).
    * NO row-level global sort: the cumsum runs over the DISTINCT
    * customer-revenue-value histogram (the q64/q67 value-grid
    * discipline — bounded by the cent grid, and at 100 TB coarsened
    * to whole-dollar buckets with the same one-line change). */
  def q75Pareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    val hist = rev.groupBy("cents").agg(count(lit(1)).as("nc"))
    val w = Window.orderBy(desc("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum_rev", sum(col("cents") * col("nc")).over(w))
      .withColumn("cum_cust", sum(col("nc")).over(w))
    val tot = hist.agg(sum(col("cents") * col("nc")).as("t_rev"),
      sum(col("nc")).as("t_cust"))
    cum.crossJoin(broadcast(tot))
      .filter(col("cum_rev") * 5 >= col("t_rev") * 4)
      .agg(max(col("t_cust")).as("n_customers"), max(col("t_rev")).as("total_cents"),
        min(col("cum_cust")).as("n_top_80pct"))
      .select(col("n_customers"), col("total_cents"), col("n_top_80pct"),
        round(col("n_top_80pct").cast("double") / col("n_customers").cast("double"), 6)
          .as("top_share"))
  }

  private val paretoOracle: String =
    """WITH rev AS (SELECT o_custkey,
                           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                    FROM orders GROUP BY 1),
         h AS (SELECT cents, count(*)::BIGINT AS nc FROM rev GROUP BY 1),
         c AS (SELECT cents,
                      sum(cents * nc) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING) AS cum_rev,
                      sum(nc) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING) AS cum_cust
               FROM h),
         t AS (SELECT CAST(sum(cents * nc) AS BIGINT) AS t_rev,
                      CAST(sum(nc) AS BIGINT) AS t_cust FROM h),
         s AS (SELECT max(t.t_cust) AS n_customers, max(t.t_rev) AS total_cents,
                      CAST(min(c.cum_cust) AS BIGINT) AS n_top_80pct
               FROM c, t WHERE c.cum_rev * 5 >= t.t_rev * 4)
       SELECT n_customers, total_cents, n_top_80pct,
              round(CAST(n_top_80pct AS DOUBLE) / CAST(n_customers AS DOUBLE), 6) AS top_share
       FROM s"""

  private val basketSizeOracle: String =
    """WITH s AS (SELECT l_orderkey, count(*)::BIGINT AS sz FROM lineitem GROUP BY 1),
         h AS (SELECT sz, count(*)::BIGINT AS n_orders FROM s GROUP BY 1),
         c AS (SELECT sz, n_orders,
                      sum(n_orders) OVER (ORDER BY sz ROWS UNBOUNDED PRECEDING) AS cum
               FROM h),
         t AS (SELECT sum(n_orders)::BIGINT AS n_tot FROM h)
       SELECT c.sz AS basket_size, c.n_orders,
              round(CAST(c.n_orders AS DOUBLE) / CAST(t.n_tot AS DOUBLE), 6) AS share,
              round(CAST(c.cum AS DOUBLE) / CAST(t.n_tot AS DOUBLE), 6) AS cum_share
       FROM c, t ORDER BY basket_size"""

  private val giniOracle: String =
    """WITH li AS (SELECT l_returnflag AS g,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                   FROM lineitem),
         hist AS (SELECT g, v, count(*)::BIGINT AS nv FROM li GROUP BY 1, 2),
         c AS (SELECT g, v, nv,
                      coalesce(sum(nv) OVER (PARTITION BY g ORDER BY v
                                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                               0) AS cb
               FROM hist),
         a AS (SELECT g, sum(nv)::HUGEINT AS n,
                      sum(v::HUGEINT * nv) AS t,
                      sum(v::HUGEINT * (nv::HUGEINT * cb * 2 + nv::HUGEINT * (nv + 1))) AS s2
               FROM c GROUP BY 1)
       SELECT g, CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS cents,
              round((CAST(s2 AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(t AS DOUBLE)) /
                    (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS gini
       FROM a ORDER BY g"""

  private val momGrowthOracle: String =
    """WITH m AS (SELECT r.r_name AS region,
                         CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT) AS ym,
                         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                  FROM orders o
                    JOIN customer c ON o.o_custkey = c.c_custkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
                  GROUP BY 1, 2),
         g AS (SELECT region, ym, cents,
                      lag(cents) OVER (PARTITION BY region ORDER BY ym) AS prev
               FROM m)
       SELECT region, ym, cents,
              round(CAST(cents - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6) AS growth_pct
       FROM g ORDER BY region, ym"""

  private val weightedPctOracle: String =
    """WITH li AS (SELECT l_returnflag AS g,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                          CAST(l_quantity AS BIGINT) AS w
                   FROM lineitem),
          hist AS (SELECT g, cents, sum(w) AS hw FROM li GROUP BY 1, 2),
          cum AS (SELECT g, cents,
                         sum(hw) OVER (PARTITION BY g ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS cw
                  FROM hist),
          tot AS (SELECT g, CAST(sum(w) AS BIGINT) AS tw FROM li GROUP BY 1)
        SELECT c.g AS returnflag, CAST(max(t.tw) AS BIGINT) AS total_weight,
               CAST(min(CASE WHEN c.cw * 2 >= t.tw THEN c.cents END) AS BIGINT) AS wmedian_cents,
               CAST(min(CASE WHEN c.cw * 10 >= t.tw * 9 THEN c.cents END) AS BIGINT) AS wp90_cents
        FROM cum c JOIN tot t USING (g)
        GROUP BY 1 ORDER BY returnflag"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q64_weighted_percentile", q64WeightedPercentile, Some(weightedPctOracle)),
    QueryDef("q65_streaks", q65Streaks, Some(streaksOracle)),
    QueryDef("q66_mom_growth", q66MomGrowth, Some(momGrowthOracle)),
    QueryDef("q67_gini", q67Gini, Some(giniOracle)),
    QueryDef("q73_basket_size", q73BasketSize, Some(basketSizeOracle)),
    QueryDef("q75_pareto", q75Pareto, Some(paretoOracle)),
    QueryDef("q63_mad", q63Mad, Some(madOracle)),
    QueryDef("q53_mode_median", q53ModeMedian, Some(modeMedianOracle)),
    QueryDef("q52_rfm", q52Rfm, Some(rfmOracle)),
    QueryDef("q47_assoc_rules", q47AssocRules, Some(assocOracle)),
    QueryDef("q19_pivot", q19Pivot, Some(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                 ${Priorities.map(p => s"round(sum(CASE WHEN o_orderpriority = '$p' THEN o_totalprice END), 2) AS p${p.charAt(0)}").mkString(",\n                 ")}
          FROM orders GROUP BY 1 ORDER BY year""")),
    QueryDef("q20_setops", q20Setops, Some(
      """WITH c95 AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995),
           c96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996)
         SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM c95 INTERSECT SELECT custkey FROM c96)
         UNION ALL
         SELECT custkey, 'only_1995' AS tag FROM (SELECT custkey FROM c95 EXCEPT SELECT custkey FROM c96)
         ORDER BY tag, custkey""")),
    QueryDef("q21_correlated", q21Correlated, Some(
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_small
         FROM lineitem l
         JOIN (SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty
               FROM lineitem GROUP BY 1) pa ON l.l_partkey = pa.ak
         WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * pa.avg_qty""")),
    QueryDef("q22_range_join", q22RangeJoin, Some(
      s"""SELECT CAST(d.bucket_id AS BIGINT) AS bucket_id, d.label,
                 count(*) AS cnt, round(sum(e.value), 2) AS sum_value
          FROM events e JOIN $bucketDimSql
            ON e.value >= d.lo AND e.value < d.hi
          GROUP BY 1, 2 ORDER BY bucket_id""")),
    QueryDef("q24_window_stats", q24WindowStats, Some(
      """SELECT priority, tile, count(*) AS cnt,
                round(min(pr), 6) AS min_pr, round(max(cd), 6) AS max_cd,
                round(min(tp), 2) AS min_price, round(max(tp), 2) AS max_price
         FROM (SELECT o_orderpriority AS priority, o_totalprice AS tp,
                      CAST(ntile(10) OVER w AS BIGINT) AS tile,
                      percent_rank() OVER w AS pr,
                      cume_dist() OVER w AS cd
               FROM orders
               WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
         GROUP BY 1, 2 ORDER BY priority, tile""")),
    QueryDef("q25_percentile", q25Percentile, Some(
      """SELECT l_returnflag AS returnflag,
                round(quantile_cont(l_extendedprice, 0.25), 2) AS p25,
                round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
                round(quantile_cont(l_extendedprice, 0.75), 2) AS p75,
                round(quantile_cont(l_extendedprice, 0.99), 2) AS p99
         FROM lineitem GROUP BY 1 ORDER BY returnflag""")),
    QueryDef("q28_grouping_sets", q28GroupingSets, Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
                count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         ORDER BY returnflag, linestatus, g_status""")),
    QueryDef("q29_frame_nav", q29FrameNav, Some(
      """WITH f AS (SELECT o_orderpriority AS priority, o_totalprice AS tp,
                           first_value(o_totalprice) OVER w AS lo,
                           last_value(o_totalprice) OVER w AS hi,
                           nth_value(o_totalprice, 2) OVER w AS second
                    FROM orders
                    WINDOW w AS (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         SELECT priority, round(min(lo), 2) AS min_price, round(max(hi), 2) AS max_price,
                round(min(second), 2) AS second_price, count(*) AS cnt
         FROM f GROUP BY 1 ORDER BY priority""")),
    QueryDef("q31_gap_fill", q31GapFill, Some(
      s"""WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n_items,
                               round(sum(l_extendedprice), 2) AS revenue
                        FROM lineitem WHERE l_discount > $GapFillDiscount GROUP BY 1),
           bounds AS (SELECT min(CAST(l_shipdate AS DATE)) AS lo,
                             max(CAST(l_shipdate AS DATE)) AS hi FROM lineitem),
           spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds)
         SELECT strftime(s.d, '%Y-%m-%d') AS day,
                coalesce(dd.n_items, 0) AS n_items,
                coalesce(dd.revenue, 0.0) AS revenue,
                dd.n_items IS NULL AS gap
         FROM spine s LEFT JOIN daily dd ON s.d = dd.d
         ORDER BY day""")),
    QueryDef("q30_range_frame", q30RangeFrame, Some(
      """WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS d,
                               round(sum(l_extendedprice), 2) AS revenue
                        FROM lineitem GROUP BY 1),
           n AS (SELECT *, CAST(datediff('day', DATE '1995-01-01', d) AS BIGINT) AS day_no FROM daily)
         SELECT strftime(d, '%Y-%m-%d') AS day, revenue,
                round(sum(revenue) OVER (ORDER BY day_no
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev7d
         FROM n ORDER BY day""")),
    QueryDef("q26_upsert", q26Upsert, Some(
      """WITH delta AS (SELECT o_orderkey, 'X' AS o_orderstatus,
                               o_totalprice + 1000 AS o_totalprice
                        FROM orders WHERE o_orderkey % 7 = 0),
           merged AS (SELECT o_orderstatus, o_totalprice FROM delta
                      UNION ALL
                      SELECT o.o_orderstatus, o.o_totalprice FROM orders o
                      WHERE NOT EXISTS (SELECT 1 FROM delta d
                                        WHERE d.o_orderkey = o.o_orderkey))
         SELECT o_orderstatus AS status, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS sum_price
         FROM merged GROUP BY 1 ORDER BY status""")),
    QueryDef("q27_scd_diff", q27ScdDiff, Some(
      """WITH s1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                     WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'),
           s2 AS (SELECT o_orderkey,
                         CASE WHEN o_orderkey % 5 = 0 THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
                         o_totalprice
                  FROM orders
                  WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
                    AND o_orderkey % 11 <> 0),
           d AS (SELECT CASE WHEN s1.o_orderkey IS NULL THEN 'added'
                             WHEN s2.o_orderkey IS NULL THEN 'removed'
                             WHEN s1.o_orderstatus IS DISTINCT FROM s2.o_orderstatus
                               OR s1.o_totalprice IS DISTINCT FROM s2.o_totalprice THEN 'changed'
                             ELSE 'unchanged' END AS change_type
                 FROM s1 FULL OUTER JOIN s2 ON s1.o_orderkey = s2.o_orderkey)
         SELECT change_type, count(*) AS cnt FROM d GROUP BY 1 ORDER BY change_type""")),
    QueryDef("q35_histogram", q35Histogram, Some(
      s"""WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
          SELECT l_returnflag,
                 CASE WHEN b.hi = b.lo THEN 0
                      ELSE least(${HistBuckets - 1},
                        floor((l_extendedprice - b.lo) / (b.hi - b.lo) * $HistBuckets)) END::BIGINT AS bucket,
                 count(*) AS cnt,
                 round(min(l_extendedprice), 2) AS lo_val,
                 round(max(l_extendedprice), 2) AS hi_val
          FROM lineitem, b GROUP BY 1, 2 ORDER BY 1, 2""")),
    QueryDef("q36_skyline", q36Skyline, Some(
      """WITH pts AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part),
            sky AS (SELECT price, size FROM pts p WHERE NOT EXISTS (
                      SELECT 1 FROM pts q
                      WHERE q.price <= p.price AND q.size >= p.size
                        AND (q.price < p.price OR q.size > p.size)))
          SELECT p.p_partkey, round(p.p_retailprice, 2) AS price, p.p_size AS size
          FROM part p JOIN sky s ON p.p_retailprice = s.price AND p.p_size = s.size
          ORDER BY p_partkey""")),
    QueryDef("q23_unpivot", q23Unpivot, Some(
      """SELECT measure, count(*) AS cnt, round(sum(val), 2) AS sum_val,
                round(avg(val), 6) AS avg_val
         FROM (SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
               UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
               UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
         GROUP BY 1 ORDER BY measure""")),
  )
}
