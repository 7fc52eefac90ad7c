package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

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
      .localCheckpoint()
    val stages = scala.collection.mutable.ArrayBuffer(reached)
    FunnelStages.tail.foreach { stage =>
      reached = ev.filter(col("event_type") === stage)
        .join(reached, "user_id")
        .filter(col("ts_us") > col("t"))
        .groupBy("user_id").agg(min(col("ts_us")).as("t"))
        .localCheckpoint()
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q37_funnel", q37Funnel, Some(funnelOracle)),
    QueryDef("q38_retention", q38Retention, Some(retentionOracle)),
    QueryDef("q39_funnel_users", q39FunnelUsers, Some(funnelUsersOracle)),
  )
}
