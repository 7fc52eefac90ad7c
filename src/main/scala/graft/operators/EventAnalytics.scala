package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window

/** Product-analytics operators over the event log: ordered funnels and
  * cohort retention — the two queries every event warehouse runs daily.
  *
  * Scale notes:
  *  - Funnel: three conditional-min aggregations keyed on user_id.
  *    Every stage is a map-side partial min; no windows, no per-user
  *    event sorting — shuffle volume is |users| rows per stage, and AQE
  *    reuses the user_id partitioning across the narrow stage joins.
  *  - Retention: first-activity day per user (one agg) + a distinct
  *    (cohort, offset, user) count. Shuffles are |users| and
  *    |user-days| — never |events| beyond the initial map side.
  */
object EventAnalytics {
  /** Ordered funnel stages (each must happen strictly AFTER the prior
    * stage's first occurrence — re-orderings don't count). */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Per-stage (user_id, t) tables: t = first time the user completed
    * stage k, each stage strictly after the previous one's first
    * completion. Conditional-min aggregation per stage; stage k's
    * threshold joins back (shuffle on user_id each round, |users|-
    * sized). Shared by the funnel counts and the per-user query. */
  def funnelStageTimes(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    // localCheckpoint every stage table (they are |users|-sized): stage
    // k is consumed by its own aggregate, by stage k+1's threshold
    // join, AND by the anti-joins of every lower stage in the per-user
    // query — without materialization the event scan + join chain
    // replays O(stages²) times
    var reached = ev.filter(col("event_type") === FunnelStages.head)
      .groupBy("user_id").agg(min(col("ts_us")).as("t"))
      .memoized()
    val stages = scala.collection.mutable.ArrayBuffer(reached)
    FunnelStages.tail.foreach { stage =>
      reached = ev.filter(col("event_type") === stage)
        .join(reached, "user_id")
        .filter(col("ts_us") > col("t"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t"))
        .memoized()
      stages += reached
    }
    stages.toSeq
  }

  /** Funnel: users reaching stage k = users whose first 'view' precedes
    * their first later 'click' precedes their first later 'purchase'. */
  def q37Funnel(spark: SparkSession, dir: String): DataFrame =
    funnelStageTimes(spark, dir).zip(FunnelStages).zipWithIndex
      .map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("stage"), lit(stage).as("event_type"), col("n_users"))
      }.reduce(_ unionAll _).orderBy("stage")

  /** Per-user funnel state: each user's HIGHEST stage reached and when —
    * the drill-down behind q37's counts, and the batch mirror of the
    * stateful streaming funnel (FunnelStreamSpec: a per-user
    * mapGroupsWithState front-end folding events in time order reaches
    * the identical stage table). */
  def q39FunnelUsers(spark: SparkSession, dir: String): DataFrame = {
    val stages = funnelStageTimes(spark, dir)
    // highest stage wins: stage k minus anyone who reached k+1
    val rows = stages.zipWithIndex.map { case (df, i) =>
      val higher = stages.drop(i + 1)
        .foldLeft(df) { (d, h) => d.join(h.select("user_id"), Seq("user_id"), "left_anti") }
      higher.select(col("user_id"), lit(i + 1L).as("stage_reached"),
        expr("t div 1000").as("ts_ms"))
    }
    rows.reduce(_ unionAll _).orderBy("user_id")
  }

  private val funnelUsersOracle: String = {
    val stageCtes = FunnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"""s1 AS MATERIALIZED (SELECT user_id, min(ts_us) AS t FROM e
                 WHERE event_type = '$stage' GROUP BY 1)"""
      else
        s"""s${i + 1} AS MATERIALIZED (SELECT e.user_id, min(e.ts_us) AS t
                 FROM e JOIN s$i ON e.user_id = s$i.user_id
                 WHERE e.event_type = '$stage' AND e.ts_us > s$i.t GROUP BY 1)"""
    }.mkString(",\n          ")
    val n = FunnelStages.length
    val selects = (1 to n).map { k =>
      val anti = (k + 1 to n)
        .map(j => s"NOT EXISTS (SELECT 1 FROM s$j WHERE s$j.user_id = s$k.user_id)")
      val where = if (anti.isEmpty) "" else "WHERE " + anti.mkString(" AND ")
      val sel = s"SELECT user_id, $k::BIGINT AS stage_reached, t // 1000 AS ts_ms FROM s$k $where"
      if (k == 1) sel else "UNION ALL " + sel
    }.mkString("\n        ")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
          $stageCtes
        $selects
        ORDER BY user_id"""
  }

  /** Oracle CTEs generated from FunnelStages — the stage list and the
    * SQL can't drift apart (s1 = first stage-1 event; s_{k} = first
    * stage-k event strictly after s_{k-1}). */
  private val funnelOracle: String = {
    val stageCtes = FunnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"""s1 AS (SELECT user_id, min(ts_us) AS t FROM e
                 WHERE event_type = '$stage' GROUP BY 1)"""
      else
        s"""s${i + 1} AS (SELECT e.user_id, min(e.ts_us) AS t
                 FROM e JOIN s$i ON e.user_id = s$i.user_id
                 WHERE e.event_type = '$stage' AND e.ts_us > s$i.t GROUP BY 1)"""
    }.mkString(",\n          ")
    val selects = FunnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0) s"SELECT 1::BIGINT AS stage, '$stage' AS event_type, count(*) AS n_users FROM s1"
      else s"UNION ALL SELECT ${i + 1}, '$stage', count(*) FROM s${i + 1}"
    }.mkString("\n        ")
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
          $stageCtes
        $selects
        ORDER BY stage"""
  }

  /** Cohort retention: users grouped by their first-activity day; for
    * each cohort, how many distinct users were active again exactly
    * 1, 3 and 7 days later. */
  val RetentionOffsets: Seq[Int] = Seq(1, 3, 7)
  def q38Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
    val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val active = ev.distinct() // (user, day) activity set
    val ret = active.join(cohort, "user_id")
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(col("offset").isin(RetentionOffsets.map(_.toLong): _*))
      .groupBy("cohort_day", "offset")
      .agg(countDistinct(col("user_id")).as("n_retained"))
    val sizes = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    sizes.join(ret, Seq("cohort_day"))
      .select(col("cohort_day"), col("cohort_size"), col("offset"), col("n_retained"))
      .orderBy("cohort_day", "offset")
  }

  private val retentionOracle: String = {
    val offsets = RetentionOffsets.mkString(", ")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
          cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
          active AS (SELECT DISTINCT user_id, day FROM e),
          ret AS (SELECT c.cohort_day, a.day - c.cohort_day AS "offset",
                         count(DISTINCT a.user_id) AS n_retained
                  FROM active a JOIN cohort c ON a.user_id = c.user_id
                  WHERE a.day - c.cohort_day IN ($offsets)
                  GROUP BY 1, 2),
          sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY 1)
        SELECT s.cohort_day AS cohort_day, s.cohort_size, r."offset", r.n_retained
        FROM sizes s JOIN ret r ON s.cohort_day = r.cohort_day
        ORDER BY s.cohort_day, "offset""""
  }

  /** First-order Markov transition matrix over each user's event
    * sequence — the behavioral model behind next-action prediction and
    * anomalous-session scoring: P(next | current) from one lag/lead
    * window per user plus a pair groupBy. Totally ordered by
    * (ts_us, event_id) so the chain is deterministic; p is one
    * rounded division per (from, to) cell against the from-row total.
    * Scale: the window sorts each user's OWN events (shuffle keys on
    * user_id — |events| once); the transition matrix is |types|²
    * cells, map-side combined. */
  def q48MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val tr = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    tr.withColumn("p", round(col("n") / sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  private val markovOracle: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
          l AS (SELECT event_type,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) AS next_type
                FROM e),
          tr AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
                 FROM l WHERE next_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
        FROM tr ORDER BY from_type, to_type"""

  /** Ordered funnel WITHIN 30-minute sessions — the composed form a
    * product warehouse actually reports ("conversion per visit"):
    * the q11 sessionization prelude assigns (user, session) keys, then
    * the q37 conditional-min discipline runs per session — stage k's
    * first time must lie strictly after stage k−1's within the SAME
    * session. Shuffles: one |events| window for session ids, then
    * |sessions|-sized stage aggregations. */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000
  def q49SessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("sess_no",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .memoized()
    val keys = Seq("user_id", "sess_no")
    var thresholds = sess
      .groupBy(keys.map(col): _*)
      .agg(min(when(col("event_type") === FunnelStages.head, col("ts_us"))).as("t"))
      .filter(col("t").isNotNull)
    def stageCount(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_sessions")).select(lit(label).as("stage"), col("n_sessions"))
    var out = stageCount(s"1_${FunnelStages.head}", thresholds)
    for ((stage, i) <- FunnelStages.tail.zipWithIndex) {
      thresholds = sess.join(thresholds, keys)
        .groupBy(keys.map(col): _*)
        .agg(min(when(col("event_type") === stage && col("ts_us") > col("t"),
          col("ts_us"))).as("t2"))
        .filter(col("t2").isNotNull)
        .withColumnRenamed("t2", "t")
      out = out.unionAll(stageCount(s"${i + 2}_$stage", thresholds))
    }
    out.orderBy("stage")
  }

  private val sessionFunnelOracle: String = {
    val stageCtes = FunnelStages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""t1 AS (SELECT * FROM (
                SELECT user_id, sess_no,
                       min(CASE WHEN event_type = '$st' THEN ts_us END) AS t
                FROM c GROUP BY 1, 2) WHERE t IS NOT NULL)"""
      else
        s"""t${i + 1} AS (SELECT * FROM (
                SELECT c.user_id, c.sess_no,
                       min(CASE WHEN c.event_type = '$st' AND c.ts_us > t$i.t
                           THEN c.ts_us END) AS t
                FROM c JOIN t$i USING (user_id, sess_no)
                GROUP BY 1, 2) WHERE t IS NOT NULL)"""
    }.mkString(",\n          ")
    val rows = FunnelStages.zipWithIndex.map { case (st, i) =>
      s"SELECT '${i + 1}_$st' AS stage, (SELECT count(*) FROM t${i + 1}) AS n_sessions"
    }.mkString("\n          UNION ALL ")
    s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
          l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
          s AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > $SessionGapUs THEN 1 ELSE 0 END AS brk FROM l),
          c AS MATERIALIZED (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS UNBOUNDED PRECEDING) AS sess_no FROM s),
          $stageCtes
        $rows ORDER BY stage"""
  }

  /** Sequential-pattern support: for EVERY ordered event-type triple
    * (a, b, c), how many users have some a-event strictly before some
    * b-event strictly before some c-event — the support-counting core
    * of sequence mining (GSP/PrefixSpan's candidate evaluation),
    * generalized past q37's one fixed stage list to the full |types|³
    * pattern lattice.
    *
    * Shape: the funnel conditional-min discipline, vectorized over
    * patterns — stage tables keyed by (user, pattern-prefix) instead
    * of user. t1 = first occurrence per (user, a): |users|×|types|
    * rows. t2 joins events back on user_id (each event meets its
    * user's ≤|types| prefixes) → first b-after-a per (user, a, b).
    * t3 likewise → support counts. Shuffle volume is |events|×|types|
    * at the widest — never |events|² — and every stage is a map-side
    * partial min/count. The pattern lattice itself (≤|types|³ rows)
    * stays tiny at any corpus scale. */
  def q51SeqSupport(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .memoized() // 3 consumers: scan once, not thrice
    val t1 = ev.groupBy(col("user_id"), col("event_type").as("a"))
      .agg(min(col("ts_us")).as("t"))
    val t2 = ev.join(t1, "user_id")
      .filter(col("ts_us") > col("t"))
      .groupBy(col("user_id"), col("a"), col("event_type").as("b"))
      .agg(min(col("ts_us")).as("t"))
    val t3 = ev.join(t2, "user_id")
      .filter(col("ts_us") > col("t"))
      .groupBy(col("a"), col("b"), col("event_type").as("c"))
      .agg(countDistinct(col("user_id")).as("support"))
    t3.orderBy("a", "b", "c")
  }

  private val seqSupportOracle: String =
    s"""WITH e AS MATERIALIZED (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
          t1 AS MATERIALIZED (SELECT user_id, event_type AS a, min(ts_us) AS t
                 FROM e GROUP BY 1, 2),
          t2 AS MATERIALIZED (SELECT e.user_id, t1.a, e.event_type AS b, min(e.ts_us) AS t
                 FROM e JOIN t1 ON e.user_id = t1.user_id
                 WHERE e.ts_us > t1.t GROUP BY 1, 2, 3)
        SELECT t2.a, t2.b, e.event_type AS c,
               count(DISTINCT e.user_id) AS support
        FROM e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.ts_us > t2.t
        GROUP BY 1, 2, 3
        ORDER BY a, b, c"""

  /** Distinct users per trailing 7-day window — the windowed
    * COUNT DISTINCT every growth dashboard runs, in its at-scale
    * decomposition: sliding distinct does NOT merge by addition, so
    * the plan dedups to (day, user) first (the big reduction, map-side
    * combined), then EXPLODES each day-user into the ≤7 windows it
    * serves and counts distinct per window — shuffle ∝ 7·|day-users|,
    * never 7·|events|. Windows anchor on days present in the data. */
  val SlideDays = 7
  def q54SlidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
      .memoized() // feeds the window explode AND the day spine
    val days = du.select(col("day").as("wday")).distinct()
    du.join(days,
        col("wday") >= col("day") && col("wday") < col("day") + SlideDays)
      .groupBy("wday")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("wday")
  }

  private val slidingDistinctOracle: String =
    s"""WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
                    FROM events),
          days AS (SELECT DISTINCT day AS wday FROM du)
        SELECT d.wday, count(DISTINCT du.user_id) AS n_users
        FROM du JOIN days d ON d.wday >= du.day AND d.wday < du.day + $SlideDays
        GROUP BY 1 ORDER BY wday"""

  /** LAST-TOUCH attribution (q57): every purchase is credited to the
    * user's most recent preceding touch (view/click) within a 24 h
    * lookback, else 'none' — the marketing-analytics standard the
    * funnel family lacks (funnels ask "did the journey complete";
    * attribution asks "which touch gets the credit/revenue"). One
    * per-user ordered window with an IGNORE-NULLS running last over
    * rows strictly BEFORE the current (same-timestamp touches don't
    * self-attribute; ties ordered by event_id), then a |touch-types|-
    * sized rollup of counts + cent-exact revenue.
    *
    * Scale: the single window partitions by user — the sessionize
    * shape (per-user event counts are bounded); everything after is a
    * 3-row aggregate. No self-join, no as-of join needed: the running
    * last IS the as-of. */
  val AttrLookbackUs: Long = 24L * 3600 * 1000000
  def q57Attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("view", "click"), col("event_type"))
    val touchTs = when(col("event_type").isin("view", "click"), col("ts_us"))
    ev
      .withColumn("lt_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("lt_ts", last(touchTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("attributed",
        when(col("lt_ts").isNotNull && col("lt_ts") >= col("ts_us") - AttrLookbackUs,
          col("lt_type")).otherwise(lit("none")))
      .groupBy(col("attributed").as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
      .orderBy("touch_type")
  }

  private val attributionOracle: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
          lt AS (SELECT *,
                 last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END
                            IGNORE NULLS) OVER tw AS lt_type,
                 last_value(CASE WHEN event_type IN ('view', 'click') THEN ts_us END
                            IGNORE NULLS) OVER tw AS lt_ts
          FROM ev
          WINDOW tw AS (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
          p AS (SELECT CASE WHEN lt_ts IS NOT NULL AND lt_ts >= ts_us - $AttrLookbackUs
                            THEN lt_type ELSE 'none' END AS touch_type, cents
                FROM lt WHERE event_type = 'purchase')
        SELECT touch_type, count(*) AS n_purchases, sum(cents)::BIGINT AS cents
        FROM p GROUP BY 1 ORDER BY touch_type"""

  /** LINEAR multi-touch attribution (q58): each purchase's credit (and
    * cent-exact revenue) splits EQUALLY across every view/click in its
    * 24 h lookback — the fairness-motivated sibling of q57's
    * winner-takes-all. Credit is kept EXACT: instead of summing
    * 1/n_touches floats (order-sensitive, engine-divergent), each
    * purchase contributes its credit in integer micro-units of
    * 1/[[AttrCreditScale]]: each touch gets ⌊scale/n⌋ units and the
    * remainder scale mod n goes one unit apiece to the EARLIEST
    * (tts, event_id)-ordered touches — so Σ units per purchase equals
    * scale EXACTLY for every n (not only the n dividing the scale),
    * credit is conserved bit-exactly at any fan-out, and the rollup
    * is an integer sum, rounded to 4 dp only at the edge.
    *
    * Scale: one per-user sort window pairing each purchase with its
    * lookback touches via a range-limited self-join ON USER — the
    * touch fan-out is bounded by per-user activity in 24 h, and the
    * aggregation is map-side combinable. */
  val AttrCreditScale: Long = 720720L // divisible by every n ≤ 16, and by 18,20,…
  def q58AttributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("pts"), col("event_id").as("pid"),
        col("cents"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts_us").as("tts"),
        col("event_id").as("tid"), col("event_type").as("touch_type"))
    // the lookback predicate must live in the LEFT-join ON clause: as a
    // post-filter it would drop zero-in-window purchases entirely
    // instead of leaving them with a NULL touch
    val perPurchase = purchases.as("p").join(touches.as("t"),
        col("p.user_id") === col("t.user_id") &&
          col("t.tts") < col("p.pts") &&
          col("t.tts") >= col("p.pts") - AttrLookbackUs, "left")
      .groupBy(col("p.pid").as("pid"), col("p.cents").as("cents"))
      .agg(sum(when(col("t.tts").isNotNull, 1L).otherwise(0L)).as("n_touches"))
    // re-pair to distribute exact credit (touch rows only): unit share
    // ⌊scale/n⌋ plus one extra micro-unit to the first scale%n touches
    // in (tts, event_id) order — per-purchase units sum to scale exactly
    import org.apache.spark.sql.expressions.Window
    val credited = purchases.join(perPurchase.select(col("pid"), col("n_touches")), "pid")
      .join(touches, Seq("user_id"))
      .filter(col("tts") < col("pts") && col("tts") >= col("pts") - AttrLookbackUs)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pid")).orderBy(col("tts"), col("tid"))))
      .withColumn("unit", expr(s"$AttrCreditScale div n_touches") +
        when(col("rn") <= expr(s"$AttrCreditScale % n_touches"), 1L).otherwise(0L))
      .groupBy("touch_type")
      .agg(sum(col("unit")).as("credit_scaled"),
        sum(col("cents") * col("unit")).as("cents_scaled"))
    val none = perPurchase.filter(col("n_touches") === 0)
      .agg(count(lit(1)).as("n"), coalesce(sum(col("cents")), lit(0L)).as("c"))
      .select(lit("none").as("touch_type"),
        (col("n") * AttrCreditScale).as("credit_scaled"),
        (col("c") * AttrCreditScale).as("cents_scaled"))
    credited.unionAll(none)
      .select(col("touch_type"),
        round(col("credit_scaled") / lit(AttrCreditScale.toDouble), 4).as("credit"),
        round(col("cents_scaled") / lit(AttrCreditScale.toDouble) / 100, 2).as("revenue"))
      .orderBy("touch_type")
  }

  private val attributionLinearOracle: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
          p AS (SELECT user_id, ts_us AS pts, event_id AS pid, cents
                FROM ev WHERE event_type = 'purchase'),
          t AS (SELECT user_id, ts_us AS tts, event_id, event_type AS touch_type
                FROM ev WHERE event_type IN ('view', 'click')),
          nt AS MATERIALIZED (
            SELECT p.pid, p.cents, count(t.tts) AS n_touches
            FROM p LEFT JOIN t ON p.user_id = t.user_id
              AND t.tts < p.pts AND t.tts >= p.pts - $AttrLookbackUs
            GROUP BY 1, 2),
          tc AS (SELECT t.touch_type, p.cents, nt.n_touches,
                 row_number() OVER (PARTITION BY p.pid
                                    ORDER BY t.tts, t.event_id) AS rn
                 FROM p JOIN nt ON p.pid = nt.pid
                 JOIN t ON p.user_id = t.user_id
                   AND t.tts < p.pts AND t.tts >= p.pts - $AttrLookbackUs),
          cr AS (SELECT touch_type,
                 sum(($AttrCreditScale // n_touches) +
                     CASE WHEN rn <= $AttrCreditScale % n_touches THEN 1 ELSE 0 END) AS credit_scaled,
                 sum(cents * (($AttrCreditScale // n_touches) +
                     CASE WHEN rn <= $AttrCreditScale % n_touches THEN 1 ELSE 0 END)) AS cents_scaled
                 FROM tc GROUP BY 1),
          nn AS (SELECT 'none' AS touch_type,
                 count(*) * $AttrCreditScale AS credit_scaled,
                 coalesce(sum(cents), 0) * $AttrCreditScale AS cents_scaled
                 FROM nt WHERE n_touches = 0),
          allr AS (SELECT * FROM cr UNION ALL SELECT * FROM nn)
        SELECT touch_type,
               round(credit_scaled / CAST($AttrCreditScale AS DOUBLE), 4) AS credit,
               round(cents_scaled / CAST($AttrCreditScale AS DOUBLE) / 100, 2) AS revenue
        FROM allr ORDER BY touch_type"""

  /** q68: day-of-week seasonal index per event type — the first step
    * of any seasonal decomposition (and the sanity gauge before
    * comparing week-over-week metrics): index(dow) = mean value on
    * that weekday / overall mean, computed CROSS-MULTIPLIED from
    * exact integer cents (sum_dow·n_all vs n_dow·sum_all), one
    * fixed-order double division at the edge. The weekday is the pure
    * integer epoch-day mod 7 (0 = Thursday, 1970-01-01) — calendar
    * functions differ across engines, integer arithmetic doesn't.
    * Scale: one map-side-combined agg to |types|×7 rows; totals join
    * back broadcast-sized. */
  def q68Seasonality(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("event_type"),
      expr("(ts_us div 86400000000) % 7").as("dow"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val byDow = e.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val tot = e.groupBy("event_type")
      .agg(count(lit(1)).as("n_all"), sum(col("cents")).as("c_all"))
    byDow.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"), col("n"), col("cents"),
        round((col("cents").cast("double") * col("n_all")) /
          (col("n").cast("double") * col("c_all")), 6).as("idx"))
      .orderBy("event_type", "dow")
  }

  private val seasonalityOracle: String =
    """WITH e AS (SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                  FROM events),
         d AS (SELECT event_type, dow, count(*)::BIGINT AS n,
                      CAST(sum(cents) AS BIGINT) AS cents
               FROM e GROUP BY 1, 2),
         t AS (SELECT event_type, count(*)::BIGINT AS n_all,
                      CAST(sum(cents) AS BIGINT) AS c_all
               FROM e GROUP BY 1)
       SELECT d.event_type, d.dow, d.n, d.cents,
              round((CAST(d.cents AS DOUBLE) * t.n_all) /
                    (CAST(d.n AS DOUBLE) * t.c_all), 6) AS idx
       FROM d JOIN t ON d.event_type = t.event_type
       ORDER BY d.event_type, d.dow"""

  /** q69: CUSUM changepoint score per event type over the daily
    * revenue series — "where does the cumulative deviation from the
    * series mean peak" (Page's statistic in its offline form). The
    * argmax is decided ENTIRELY in exact integer arithmetic: the
    * deviation cumsum S_t = Σ_{τ≤t} (x_τ − T/n) is cross-multiplied
    * to n·cum_t − t·T (exact decimal(38) — no division, no float),
    * maximized by |·| with ties → the earliest day; only the reported
    * score pays one normalized double division (|S|/(n·T), a
    * scale-free magnitude in [0,1)).
    * Scale: the corpus-sized work is ONE agg to |types|×|days| daily
    * rows; both windows (cumsum, argmax rank) partition by type over
    * that bounded daily series — never over events. */
  def q69Cusum(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum(col("cents")).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("t_sum"))
    val scored = daily
      .withColumn("cum", sum(col("x")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("t", row_number().over(w))
      .join(broadcast(tot), "event_type")
      .withColumn("s", abs(dec(col("cum")) * dec(col("n")) - dec(col("t")) * dec(col("t_sum"))))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(desc("s"), asc("day"))
    scored.withColumn("rnk", row_number().over(rw)).filter(col("rnk") === 1)
      .select(col("event_type"), col("day").as("peak_day"),
        round(col("s").cast("double") /
          (col("n").cast("double") * col("t_sum").cast("double")), 6).as("score"))
      .orderBy("event_type")
  }

  private val cusumOracle: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
                      FROM events GROUP BY 1, 2),
         tot AS (SELECT event_type, count(*)::BIGINT AS n,
                        CAST(sum(x) AS BIGINT) AS t_sum
                 FROM daily GROUP BY 1),
         c AS (SELECT d.event_type, d.day, t.n, t.t_sum,
                      sum(d.x) OVER (PARTITION BY d.event_type ORDER BY d.day
                                     ROWS UNBOUNDED PRECEDING) AS cum,
                      row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS t
               FROM daily d JOIN tot t ON d.event_type = t.event_type),
         s AS (SELECT event_type, day, n, t_sum,
                      abs(cum::HUGEINT * n - t::HUGEINT * t_sum) AS s,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY abs(cum::HUGEINT * n - t::HUGEINT * t_sum) DESC,
                                                  day) AS rnk
               FROM c)
       SELECT event_type, day AS peak_day,
              round(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t_sum AS DOUBLE)), 6) AS score
       FROM s WHERE rnk = 1 ORDER BY event_type"""

  /** q70: OHLC candles (open/high/low/close/volume) per event type
    * per day — the time-series downsampling shape behind every
    * price/metric chart. Open and close are decided by PURE
    * AGGREGATION, no window anywhere: min/max over the
    * (ts_us, event_id, cents) struct — lexicographic struct
    * comparison is the same total order in both engines, and the
    * event_id component makes simultaneous timestamps deterministic.
    * Scale: ONE map-side-combined agg straight to |types|×|days|
    * rows; at 100 TB this is the scan-bound shape (no per-partition
    * sorting, no window state). */
  def q70Ohlc(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        col("ts_us"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        max(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("close"),
        count(lit(1)).as("volume"),
        sum(col("cents")).as("cents"))
      .orderBy("event_type", "day")
  }

  private val ohlcOracle: String =
    """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                         epoch_us(ts) AS ts_us, event_id,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                  FROM events)
       SELECT event_type, day,
              (min({'ts_us': ts_us, 'event_id': event_id, 'cents': cents})).cents AS open,
              max(cents) AS high, min(cents) AS low,
              (max({'ts_us': ts_us, 'event_id': event_id, 'cents': cents})).cents AS close,
              count(*) AS volume, CAST(sum(cents) AS BIGINT) AS cents
       FROM e GROUP BY 1, 2 ORDER BY event_type, day"""

  /** q71: time-to-convert — the product funnel's latency: per user,
    * first signup to the FIRST purchase at-or-after it; report the
    * conversion rate and the LOWER median / p90 of the delay in
    * whole minutes. Quantizing to minutes is the scale contract: the
    * percentile cumsum then runs over the bounded delay-minute grid
    * (the q64/q67 value-histogram discipline), never over per-user
    * rows; the percentile rule is cross-multiplied integer compares
    * (smallest delay whose cumulative count clears p·n) — exact, no
    * interpolation, no float.
    * Scale: two type-filtered aggs shuffle on user_id; the histogram
    * window is grid-bounded; output is one row. */
  def q71TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val su = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_us")).as("s_ts"))
    val pu = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"))
      .join(su, "user_id")
      .filter(col("p_ts") >= col("s_ts"))
      .groupBy("user_id").agg(min(col("p_ts") - col("s_ts")).as("d_us"))
    val hist = pu.select(expr("d_us div 60000000").as("d_min"))
      .groupBy("d_min").agg(count(lit(1)).as("nv"))
    val w = Window.orderBy("d_min")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("nv")).over(w))
    val tot = cum.agg(max(col("cum")).as("n_conv"))
    val nSigned = su.agg(count(lit(1)).as("n_signed"))
    val med = cum.crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n_conv"))
      .agg(min(col("d_min")).as("median_min"), max(col("n_conv")).as("n_conv"))
    val p90 = cum.crossJoin(broadcast(tot))
      .filter(col("cum") * 10 >= col("n_conv") * 9)
      .agg(min(col("d_min")).as("p90_min"))
    nSigned.crossJoin(broadcast(med)).crossJoin(broadcast(p90))
      .select(col("n_signed"), col("n_conv"),
        round(col("n_conv").cast("double") / col("n_signed").cast("double"), 6)
          .as("conv_rate"),
        col("median_min"), col("p90_min"))
  }

  private val timeToConvertOracle: String =
    """WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_ts
                   FROM events WHERE event_type = 'signup' GROUP BY 1),
         pu AS (SELECT e.user_id, min(epoch_us(e.ts) - su.s_ts) AS d_us
                FROM events e JOIN su ON e.user_id = su.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s_ts
                GROUP BY 1),
         hist AS (SELECT d_us // 60000000 AS d_min, count(*)::BIGINT AS nv
                  FROM pu GROUP BY 1),
         cum AS (SELECT d_min,
                        sum(nv) OVER (ORDER BY d_min ROWS UNBOUNDED PRECEDING) AS cum
                 FROM hist),
         tot AS (SELECT max(cum)::BIGINT AS n_conv FROM cum),
         ns AS (SELECT count(*)::BIGINT AS n_signed FROM su),
         med AS (SELECT min(d_min) AS median_min FROM cum, tot
                 WHERE cum * 2 >= n_conv),
         p90 AS (SELECT min(d_min) AS p90_min FROM cum, tot
                 WHERE cum * 10 >= n_conv * 9)
       SELECT ns.n_signed, tot.n_conv,
              round(CAST(tot.n_conv AS DOUBLE) / CAST(ns.n_signed AS DOUBLE), 6) AS conv_rate,
              CAST(med.median_min AS BIGINT) AS median_min,
              CAST(p90.p90_min AS BIGINT) AS p90_min
       FROM ns, tot, med, p90"""

  /** q72: feed-health report — the data-quality monitor every
    * long-running ingest needs: per event type, the LOWER-median
    * daily volume and which days ran at under half of it
    * (underfeed days). Median by the integer cross-multiplied rule
    * over the per-type daily series (bounded window); "low" decided
    * as cnt·2 < median in exact integers. */
  def q72FeedHealth(spark: SparkSession, dir: String): DataFrame =
    feedHealthCore(Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt")))

  /** The report over ANY (event_type, day, cnt) daily series — the
    * spec plants a synthetic underfeed day through this seam. */
  def feedHealthCore(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("cnt", "day")
    val n = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val med = daily
      .withColumn("rk", row_number().over(w))
      .join(n, "event_type")
      .filter(col("rk") * 2 >= col("n_days"))
      .groupBy("event_type").agg(min(col("cnt")).as("median_daily"))
    daily.join(med, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        first(col("median_daily")).as("median_daily"),
        sum(when(col("cnt") * 2 < col("median_daily"), 1L).otherwise(0L)).as("n_low_days"),
        min(when(col("cnt") * 2 < col("median_daily"), col("day"))).as("first_low_day"))
      .orderBy("event_type")
  }

  private val feedHealthOracle: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                             count(*)::BIGINT AS cnt
                      FROM events GROUP BY 1, 2),
         n AS (SELECT event_type, count(*)::BIGINT AS n_days FROM daily GROUP BY 1),
         rk AS (SELECT d.event_type, d.cnt,
                       row_number() OVER (PARTITION BY d.event_type ORDER BY d.cnt, d.day) AS rk,
                       n.n_days
                FROM daily d JOIN n ON d.event_type = n.event_type),
         med AS (SELECT event_type, min(cnt) AS median_daily
                 FROM rk WHERE rk * 2 >= n_days GROUP BY 1)
       SELECT d.event_type, count(*)::BIGINT AS n_days,
              CAST(any_value(m.median_daily) AS BIGINT) AS median_daily,
              sum(CASE WHEN d.cnt * 2 < m.median_daily THEN 1 ELSE 0 END)::BIGINT AS n_low_days,
              min(CASE WHEN d.cnt * 2 < m.median_daily THEN d.day END) AS first_low_day
       FROM daily d JOIN med m ON d.event_type = m.event_type
       GROUP BY 1 ORDER BY d.event_type"""

  /** Population Stability Index between the first half-month of the
    * value distribution and the rest — THE production drift monitor
    * (credit-scoring heritage: PSI < 0.1 stable, > 0.25 act): fixed-
    * width cent bins, Laplace-smoothed shares on both slices, and
    * each (p−q)·ln(p/q) term FLOORED ONTO the 1e-9 integer grid
    * before summation (the js_divergence discipline — ln is the one
    * libm call, the grid makes the sum order-free and cross-engine
    * exact). Emits the per-bin decomposition plus the total
    * (bin = −1) — the actionable artifact is WHERE the drift sits.
    * Scale: one pass to (slice, bin) counts; everything after is
    * bin-grid-sized. */
  val PsiBinCents = 2500L
  val PsiGrid = 1000000000L
  val PsiCutoffDays = 15L
  def mlPsi(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(expr("ts_us div 86400000000").as("day"),
        expr(s"CAST(floor(value * 100 + 0.5) AS BIGINT) div $PsiBinCents").as("bin"))
    val minD = e.agg(min(col("day")).as("mn"))
    val sliced = e.crossJoin(broadcast(minD))
      .select(col("bin"),
        (col("day") < col("mn") + PsiCutoffDays).as("is_expected"))
    val counts = sliced.groupBy("bin")
      .agg(sum(when(col("is_expected"), 1L).otherwise(0L)).as("ce"),
        sum(when(!col("is_expected"), 1L).otherwise(0L)).as("ca"))
    val tot = counts.agg(sum(col("ce")).as("ne"), sum(col("ca")).as("na"),
      count(lit(1)).as("k"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("pe", (col("ce") + 1).cast("double") / (col("ne") + col("k")))
      .withColumn("pa", (col("ca") + 1).cast("double") / (col("na") + col("k")))
      .withColumn("tn",
        floor((col("pe") - col("pa")) * log(col("pe") / col("pa")) * PsiGrid)
          .cast("long"))
    terms.select(col("bin"), col("ce"), col("ca"),
        round(col("tn").cast("double") / PsiGrid, 6).as("psi"))
      .unionAll(terms.agg(sum(col("ce")).as("ce"), sum(col("ca")).as("ca"),
          round(sum(col("tn")).cast("double") / PsiGrid, 6).as("psi"))
        .select(lit(-1L).as("bin"), col("ce"), col("ca"), col("psi")))
      .orderBy("bin")
  }

  private val psiOracle: String =
    s"""WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) // $PsiBinCents AS bin
                   FROM events),
         m AS (SELECT min(day) AS mn FROM e),
         sl AS (SELECT bin, day < mn + $PsiCutoffDays AS is_expected FROM e, m),
         c AS (SELECT bin, sum(CASE WHEN is_expected THEN 1 ELSE 0 END)::BIGINT AS ce,
                      sum(CASE WHEN is_expected THEN 0 ELSE 1 END)::BIGINT AS ca
               FROM sl GROUP BY 1),
         t AS (SELECT sum(ce)::BIGINT AS ne, sum(ca)::BIGINT AS na,
                      count(*)::BIGINT AS k FROM c),
         terms AS (SELECT c.bin, c.ce, c.ca,
                          CAST(floor(((c.ce + 1) / CAST(t.ne + t.k AS DOUBLE)
                                      - (c.ca + 1) / CAST(t.na + t.k AS DOUBLE))
                                     * ln(((c.ce + 1) / CAST(t.ne + t.k AS DOUBLE))
                                          / ((c.ca + 1) / CAST(t.na + t.k AS DOUBLE)))
                                     * $PsiGrid) AS BIGINT) AS tn
                   FROM c, t)
       SELECT bin, ce, ca, round(CAST(tn AS DOUBLE) / $PsiGrid, 6) AS psi FROM terms
       UNION ALL
       SELECT -1, CAST(sum(ce) AS BIGINT), CAST(sum(ca) AS BIGINT),
              round(CAST(sum(tn) AS DOUBLE) / $PsiGrid, 6) FROM terms
       ORDER BY bin"""

  /** q74: purchase-cadence report — the LOWER median / p90 of the gap
    * (in whole days) between a customer's consecutive orders. Per-
    * customer lag windows are bounded by orders-per-customer; the
    * percentile cumsum runs over the bounded gap-day grid with
    * cross-multiplied integer compares (the q71 discipline). */
  def q74OrderGap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .withColumn("prev", lag(col("day"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("day") - col("prev")).as("gap"))
    val hist = gaps.groupBy("gap").agg(count(lit(1)).as("nv"))
    val cw = Window.orderBy("gap")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("nv")).over(cw))
    val tot = cum.agg(max(col("cum")).as("n_gaps"))
    val med = cum.crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n_gaps"))
      .agg(min(col("gap")).as("median_gap_days"), max(col("n_gaps")).as("n_gaps"))
    val p90 = cum.crossJoin(broadcast(tot))
      .filter(col("cum") * 10 >= col("n_gaps") * 9)
      .agg(min(col("gap")).as("p90_gap_days"))
    med.crossJoin(broadcast(p90))
      .select(col("n_gaps"), col("median_gap_days"), col("p90_gap_days"))
  }

  private val orderGapOracle: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
                         epoch_us(o_orderdate) // 86400000000 AS day
                  FROM orders),
         g AS (SELECT day - lag(day) OVER (PARTITION BY o_custkey
                                           ORDER BY day, o_orderkey) AS gap
               FROM o),
         h AS (SELECT gap, count(*)::BIGINT AS nv FROM g WHERE gap IS NOT NULL GROUP BY 1),
         c AS (SELECT gap, sum(nv) OVER (ORDER BY gap ROWS UNBOUNDED PRECEDING) AS cum
               FROM h),
         t AS (SELECT max(cum)::BIGINT AS n_gaps FROM c),
         med AS (SELECT min(gap) AS median_gap_days FROM c, t WHERE cum * 2 >= n_gaps),
         p90 AS (SELECT min(gap) AS p90_gap_days FROM c, t WHERE cum * 10 >= n_gaps * 9)
       SELECT t.n_gaps, CAST(med.median_gap_days AS BIGINT) AS median_gap_days,
              CAST(p90.p90_gap_days AS BIGINT) AS p90_gap_days
       FROM t, med, p90"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ml_psi", mlPsi, Some(psiOracle)),
    QueryDef("q74_order_gap", q74OrderGap, Some(orderGapOracle)),
    QueryDef("q71_time_to_convert", q71TimeToConvert, Some(timeToConvertOracle)),
    QueryDef("q72_feed_health", q72FeedHealth, Some(feedHealthOracle)),
    QueryDef("q68_seasonality", q68Seasonality, Some(seasonalityOracle)),
    QueryDef("q70_ohlc", q70Ohlc, Some(ohlcOracle)),
    QueryDef("q69_cusum", q69Cusum, Some(cusumOracle)),
    QueryDef("q57_attribution", q57Attribution, Some(attributionOracle)),
    QueryDef("q58_attribution_linear", q58AttributionLinear, Some(attributionLinearOracle)),
    QueryDef("q54_sliding_distinct", q54SlidingDistinct, Some(slidingDistinctOracle)),
    QueryDef("q51_seq_support", q51SeqSupport, Some(seqSupportOracle)),
    QueryDef("q48_markov_transitions", q48MarkovTransitions, Some(markovOracle)),
    QueryDef("q49_session_funnel", q49SessionFunnel, Some(sessionFunnelOracle)),
    QueryDef("q37_funnel", q37Funnel, Some(funnelOracle)),
    QueryDef("q38_retention", q38Retention, Some(retentionOracle)),
    QueryDef("q39_funnel_users", q39FunnelUsers, Some(funnelUsersOracle)),
  )
}
