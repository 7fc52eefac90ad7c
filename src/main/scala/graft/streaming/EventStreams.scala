package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.QueryDef

/** Streaming event analytics (reference: a7).
  *
  * a7/EventCount.scala:69-74 counts events per window; a7/
  * RegionEventCount.scala:63-92 buckets events into named regions and
  * counts per window; a7/TrendingArrivals.scala:46-58,117-145 keeps
  * per-key state to compare a window's count against the previous
  * window and flags ≥2× jumps over a minimum.
  *
  * The reference replays batch files through a DStream queue with a
  * manual clock. Spark-first, each computation is ONE declarative plan
  * with two front-ends:
  *  - `queries` entries: the batch mirror (runs on the events table,
  *    verified against the DuckDB oracle);
  *  - `stream*` builders: the same plan over `readStream` with a
  *    watermark, driven in the specs via the file source + memory sink.
  * Structured Streaming's incrementalization guarantees the streaming
  * result converges to the batch result for these windowed aggregates —
  * that is exactly what the spec asserts.
  *
  * Scale: windowed counts shuffle on (window, key) with map-side
  * partial aggregation; watermarks bound state. The trending op keys
  * state by event_type — state size = |keys|, not |events|.
  */
object EventStreams {
  val HourUs: Long = 3600L * 1000 * 1000
  val TenMinUs: Long = 600L * 1000 * 1000
  // ms mirrors of the window sizes — the stateful cores compute window
  // ends in WATERMARK milliseconds; deriving them here keeps a retune
  // of the *Us constants from silently desynchronizing the state logic
  val HourMs: Long = HourUs / 1000
  val TenMinMs: Long = TenMinUs / 1000
  val TrendMin = 3L

  /** Value-range "regions" standing in for the reference's geo boxes. */
  val regionExpr: org.apache.spark.sql.Column =
    when(col("value") < 50, "low").when(col("value") < 150, "mid").otherwise("high")

  private def events(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir)

  // ---- batch mirrors (driver-verified) ----

  /** a7 EventCount: events per 1 h tumbling window. */
  def eventCountBatch(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .groupBy("window_ms")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("window_ms")

  /** a7 RegionEventCount: per-region counts per 1 h window. */
  def regionCountBatch(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("region", regionExpr)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .groupBy("window_ms", "region")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("window_ms", "region")

  /** Sliding-window counts: 10-minute windows advancing every
    * 5 minutes, so each event lands in exactly TWO windows — the
    * standard smoothing window Spark expresses as
    * `window(ts, "10 minutes", "5 minutes")`. The batch mirror expands
    * each event to its two covering window starts in-row (explode of a
    * 2-element array — no shuffle beyond the final count). */
  def slidingCountBatch(spark: SparkSession, dir: String): DataFrame = {
    val slideUs = TenMinUs / 2
    events(spark, dir)
      // floor to the SLIDE: the covering starts are that and one slide
      // earlier (each ≤ ts and within window length 2·slide)
      .withColumn("s1", expr(s"(ts_us div $slideUs) * $slideUs div 1000"))
      .withColumn("start_ms", explode(array(col("s1"), expr(s"s1 - ${slideUs / 1000}"))))
      .groupBy("start_ms")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("start_ms")
  }

  /** Exactly-once dedup of a replayed feed: the batch mirror unions the
    * event stream with itself (an at-least-once redelivery) and
    * dropDuplicates collapses it back — per-type counts equal the
    * original distinct counts. Dedup covers BOTH columns so the
    * semantics match the oracle's DISTINCT (event_id, event_type)
    * without relying on event_id being globally unique in testdata.
    * `dedupStream` is the streaming front-end (StreamingSpec asserts
    * convergence). */
  def dedupBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_id"), col("event_type"))
    ev.unionAll(ev)
      .dropDuplicates("event_id", "event_type")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  /** Approximate distinct users per 1 h window via KMV sketches
    * (native `kmin_distinct`, k = KmvUsersK): the streaming
    * CARDINALITY primitive — per-window state is ≤ k longs no matter
    * how many events arrive, where an exact countDistinct holds every
    * user id in the state store (unbounded at 100 TB/day). The md5
    * values are deterministic, so the DuckDB oracle replays the sketch
    * AND the (k−1)·2³²/x_k estimator exactly (the q43 discipline);
    * below saturation the estimate IS the exact count.
    * `approxUsersStream` is the watermarked streaming front-end —
    * the TypedImperativeAggregate partial-merges through the state
    * store like any built-in agg; StreamingSpec proves convergence to
    * this batch mirror. */
  val KmvUsersK = 64
  private def userHash: org.apache.spark.sql.Column =
    conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(1L)
  private def kmvEstimate(sk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(sk) < KmvUsersK, size(sk).cast("double"))
      .otherwise(round(
        lit((KmvUsersK - 1).toDouble * 4294967296.0) / element_at(sk, KmvUsersK), 4))

  def approxUsersBatch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .select(col("window_ms"), array(userHash).as("x"))
      .groupBy("window_ms")
      .agg(expr(s"kmin_distinct(x, $KmvUsersK)").as("sk"))
      .select(col("window_ms"), kmvEstimate(col("sk")).as("approx_users"))
      .orderBy("window_ms")
  }

  def approxUsersStream(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("ts"), array(userHash).as("x"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(s"kmin_distinct(x, $KmvUsersK)").as("sk"))
      .select(unix_millis(col("window.start")).as("window_ms"),
        kmvEstimate(col("sk")).as("approx_users"))
  }

  /** Streaming quantiles per 1 h window — q55's bottom-K signature
    * sample through the state store: per-window state is EXACTLY
    * [[QuantK]] (signature, cents) pairs no matter how many events
    * arrive (an exact windowed percentile holds every value), and the
    * sample is a pure function of the keys, so any micro-batch split
    * partial-merges to the identical sketch (q55's split-merge
    * identity IS the state-store merge). Readout: quantile q at rank
    * ⌈q·m⌉ of the value-sorted sample. `streamQuantileStream` is the
    * watermarked front-end; StreamingSpec proves a drained stream
    * matches this batch mirror row for row. */
  val QuantK = 64
  val QuantQs: Seq[Double] = Seq(0.5, 0.9, 0.99)
  private def quantSig: org.apache.spark.sql.Column =
    conv(substring(md5(concat(col("event_id").cast("string"), lit("_"),
      col("ts_us").cast("string"))), 1, 13), 16, 10).cast("long")

  private def quantReadout(sk: DataFrame): DataFrame =
    sk.withColumn("vals", expr("array_sort(transform(sk, e -> e.payload))"))
      .withColumn("m", size(col("vals")))
      .select(col("window_ms"), col("vals"), col("m"),
        explode(array(QuantQs.map(lit(_)): _*)).as("q"))
      .select(col("window_ms"), col("q"),
        expr("element_at(vals, CAST(ceil(q * m) AS INT))").as("est_cents"))
      .orderBy("window_ms", "q")

  def streamQuantileBatch(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    quantReadout(events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .select(col("window_ms"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"), quantSig.as("sig"))
      .groupBy("window_ms")
      .agg(expr(s"top_k_pairs(-CAST(sig AS DOUBLE), cents, $QuantK)").as("sk")))
  }

  def streamQuantileStream(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    quantReadout(readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"), quantSig.as("sig"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(s"top_k_pairs(-CAST(sig AS DOUBLE), cents, $QuantK)").as("sk"))
      .select(unix_millis(col("window.start")).as("window_ms"), col("sk")))
  }

  /** Per-window heavy hitters by count-min sketch — the BOUNDED-STATE
    * sibling of `stream_topk` exactly as `stream_approx_users` is to
    * exact distinct: the streaming half maintains only the sparse
    * CmsD×CmsW counter grid per window (windowed groupBy — partial
    * merges through the state store; an exact per-user top-k holds
    * every user id), and the heavy-hitter readout joins candidates
    * against the emitted counters downstream. One md5 digest per event
    * yields all CmsD row-buckets (the q44 chunking); estimates are
    * min-over-rows, top HhStreamK per window with deterministic ties.
    * `heavyHittersCounterStream` is the watermarked streaming front-end
    * for the counter half; StreamingSpec proves it converges to the
    * batch counters exactly. */
  val CmsStreamD = 4
  val CmsStreamW = 256
  val HhStreamK = 3
  private def cmsBuckets: org.apache.spark.sql.Column = {
    val h = md5(col("user_id").cast("string"))
    array((0 until CmsStreamD).map { j =>
      conv(substring(h, 8 * j + 1, 8), 16, 10).cast("long") % CmsStreamW
    }: _*)
  }

  /** The streaming state: per (window, row, bucket) counts. */
  def heavyHittersCountersBatch(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .select(col("window_ms"), posexplode(cmsBuckets).as(Seq("j", "b")))
      .groupBy("window_ms", "j", "b").agg(count(lit(1)).as("c"))

  def heavyHittersBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
    val counters = heavyHittersCountersBatch(spark, dir)
    val est = ev.select(col("window_ms"), col("user_id")).distinct()
      .select(col("window_ms"), col("user_id"), posexplode(cmsBuckets).as(Seq("j", "b")))
      .join(counters, Seq("window_ms", "j", "b"))
      .groupBy("window_ms", "user_id").agg(min(col("c")).as("est"))
    val w = Window.partitionBy(col("window_ms"))
      .orderBy(col("est").desc, col("user_id"))
    est.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= HhStreamK)
      .select(col("window_ms"), col("rnk"), col("user_id"), col("est"))
      .orderBy("window_ms", "rnk")
  }

  /** Watermarked streaming front-end of the counter half. */
  def heavyHittersCounterStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("ts"), posexplode(cmsBuckets).as(Seq("j", "b")))
      .groupBy(window(col("ts"), "1 hour"), col("j"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(unix_millis(col("window.start")).as("window_ms"),
        col("j"), col("b"), col("c"))

  /** a7 TrendingArrivals: 10 min windows per event_type whose count is
    * ≥ TrendMin and ≥ 2× the count of the PRECEDING window (a missing
    * preceding window counts as 0, like the reference's initial state). */
  def trendingBatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("win"))
    events(spark, dir)
      .withColumn("win", expr(s"ts_us div $TenMinUs"))
      .groupBy("event_type", "win")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prev_win", lag(col("win"), 1).over(w))
      .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
      .withColumn("prev",
        when(col("prev_win").isNotNull && col("prev_win") === col("win") - 1, col("prev_cnt"))
          .otherwise(lit(0L)))
      .filter(col("cnt") >= TrendMin && col("cnt") >= lit(2) * col("prev"))
      .select((col("win") * TenMinMs).as("window_ms"), col("event_type"), col("cnt"), col("prev"))
      .orderBy("window_ms", "event_type")
  }

  /** Session windows: per-user sessions that merge events closer than
    * SessionGap; a gap ≥ 30 min (session_window's boundary is
    * EXCLUSIVE: break at diff ≥ gap, vs q11's hand-rolled `> gap`)
    * starts a new session. Batch mirror of the streaming
    * `session_window` aggregation — dynamic-gap merging is Spark's
    * native session operator, not a window-function emulation.
    * Scale: state per ACTIVE session only (watermark evicts closed
    * sessions); shuffle keyed on user_id. */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000
  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("start_ms"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_ms")

  /** Interval join: per purchase, clicks by the same user in the
    * preceding 30 minutes (batch mirror of the stream-stream time-bound
    * join). Equi-join on user_id + range predicate — one shuffle; at
    * scale the range bound is what lets streaming state be evicted, and
    * in batch it keeps the per-user join output bounded. */
  val JoinWindowUs: Long = 30L * 60 * 1000 * 1000
  def intervalJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts_us").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts_us").as("cts"))
    // range predicate INSIDE the left-join condition: a purchase whose
    // same-user clicks all fall outside the window must still survive
    // with n_clicks = 0
    p.join(c,
        col("pu") === col("cu") &&
          col("cts") >= col("pts") - JoinWindowUs && col("cts") <= col("pts"),
        "left")
      .groupBy(col("pid"), col("pu"), col("pts"))
      .agg(count(col("cid")).as("n_clicks"))
      .select(col("pid").as("event_id"), col("pu").as("user_id"),
        expr("pts div 1000").as("ts_ms"), col("n_clicks"))
      .orderBy("event_id")
  }

  // ---- streaming front-ends (spec-driven; same plans over readStream) ----

  /** Stream-stream interval join (same semantics over two readStreams
    * with watermarks): emits matched (purchase, click) pairs; the time
    * bound + watermarks let Spark evict join state. */
  def intervalJoinStream(spark: SparkSession, dir: String): DataFrame = {
    val p = readEvents(spark, dir).filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "2 hours")
    val c = readEvents(spark, dir).filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "2 hours")
    p.join(c,
      col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
        col("cts") <= col("pts"))
      .select(col("pid"), col("cid"))
  }

  /** Streaming session windows (same plan over readStream). */
  def sessionWindowStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("start_ms"),
        col("n_events"), col("sum_value"))

  def eventSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** readStream view of the events parquet. The stored `ts` physical
    * type is probed from a batch read of the same file (int64 nanos in
    * the legacy layout, naive TIMESTAMP(us) in the current one — the
    * same dual handling as Tables.events) and normalized to `ts_us`
    * epoch micros + a micro-precision `ts`. The file source wants a
    * directory; the single-file testdata layout is bridged with a
    * symlink under a temp dir (read-only on the data). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // naive timestamps must read as plain TIMESTAMP (raw micros pass
    // through, matching DuckDB's epoch_us) — not session-tz-dependent NTZ
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val streamDir = Paths.get(sys.props("java.io.tmpdir"), "graft-stream",
      dir.replaceAll("[^A-Za-z0-9]", "_"))
    Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    if (!Files.exists(link)) Files.createSymbolicLink(link, Paths.get(s"$dir/events.parquet"))
    val raw = spark.readStream.schema(eventSchema(tsType)).parquet(streamDir.toString)
    val withUs = tsType match {
      case LongType => raw.withColumn("ts_us", expr("ts div 1000"))
      case _        => raw.withColumn("ts_us", unix_micros(col("ts")))
    }
    withUs.withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** Streaming a7 EventCount: 1 h tumbling windows with a watermark. */
  def eventCountStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("window_ms"), col("cnt"))

  /** Streaming exactly-once dedup: the same feed replayed (union of two
    * readEvents passes is not expressible on one file stream, so the
    * redelivery is simulated by the file source itself re-listing under
    * `maxFilesPerTrigger` replays in tests) — operationally,
    * dropDuplicates holds the seen-key set in state. */
  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .select(col("event_id"), col("event_type"))
      .dropDuplicates("event_id", "event_type")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))

  /** Streaming sliding-window counts (window length 10 min, slide
    * 5 min) — Spark's native sliding `window()`, converging to
    * `slidingCountBatch`'s in-row two-window expansion. */
  def slidingCountStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("start_ms"), col("cnt"))

  /** Hourly OHLC candles per event type — q70's struct-min/max
    * discipline applied to tumbling windows: open/close come from
    * min/max over the (ts_us, event_id, cents) struct (lexicographic
    * order identical in both engines and through the streaming state
    * store's partial merges — Min/Max are declarative aggregates over
    * any orderable type, so candle state per (window, type) is two
    * structs + three longs, watermark-bounded). */
  def ohlcWindowBatch(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .groupBy("window_ms", "event_type")
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max(col("cents")).as("high"), min(col("cents")).as("low"),
        max(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("close"),
        count(lit(1)).as("volume"))
      .orderBy("window_ms", "event_type")

  /** The same candle plan over readStream (spec-driven). */
  def ohlcStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("open"),
        max(col("cents")).as("high"), min(col("cents")).as("low"),
        max(struct(col("ts_us"), col("event_id"), col("cents")))
          .getField("cents").as("close"),
        count(lit(1)).as("volume"))
      .select(unix_millis(col("window.start")).as("window_ms"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Streaming a7 RegionEventCount. */
  def regionCountStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withColumn("region", regionExpr)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("region"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("window_ms"), col("region"), col("cnt"))

  /** Streaming a7 TrendingArrivals: per-event_type keyed state holding
    * the previous window's count (the Structured Streaming analog of the
    * reference's mapWithState; reference a7/TrendingArrivals.scala:46-58).
    * Emits (window_ms, event_type, cnt, prev) whenever a window's count
    * is ≥ TrendMin and ≥ 2× the preceding window's. */
  def trendingStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 0 s delay: deterministic replay semantics (close as soon as the
    // max seen event time passes a window's end); a live pipeline would
    // set the delay to its out-of-orderness bound
    trendingCoreWatermark(readEvents(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(col("event_type"), expr(s"ts_us div $TenMinUs").as("win"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)])
  }

  /** Core of the trending detector over a (key, window-id) stream.
    * State = (open window counts, last completed win, its count). A
    * window's events may SPAN micro-batches, so counts accumulate in
    * state and a window is only evaluated once a later window appears
    * (event-time completion). The per-key final window therefore stays
    * open at stream end — the specs account for that.
    * [[trendingCoreWatermark]] is the production variant: it closes on
    * watermark timers, so final/idle-key windows emit too. */
  def trendingCore(wins: org.apache.spark.sql.Dataset[(String, Long)]): DataFrame = {
    import wins.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    wins
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Map[Long, Long], Long, Long), (Long, String, Long, Long)](
        OM.Append(), GroupStateTimeout.NoTimeout) {
        (key: String,
         rows: Iterator[(String, Long)],
         state: GroupState[(Map[Long, Long], Long, Long)]) =>
          var (open, lastWin, lastCnt) = state.getOption.getOrElse(
            (Map.empty[Long, Long], Long.MinValue, 0L))
          rows.foreach { case (_, w) => open = open.updated(w, open.getOrElse(w, 0L) + 1) }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
          if (open.nonEmpty) {
            val maxWin = open.keys.max
            open.toSeq.sortBy(_._1).foreach { case (w, c) =>
              if (w < maxWin) { // complete: a later window has started
                val prev = if (w == lastWin + 1) lastCnt else 0L
                if (c >= TrendMin && c >= 2 * prev) out += ((w * TenMinMs, key, c, prev))
                lastWin = w; lastCnt = c
                open = open - w
              }
            }
          }
          state.update((open, lastWin, lastCnt))
          out.iterator
      }
      .toDF("window_ms", "event_type", "cnt", "prev")
  }

  /** Watermark-timer variant of [[trendingCore]] — the production close
    * semantics: input rows are (key, win, ts) with a watermark already
    * declared on ts. A window closes when the event-time WATERMARK
    * passes its end, driven by `GroupStateTimeout.EventTimeTimeout`
    * timers (each key re-arms its timer to its earliest open window's
    * end), so every key's final window emits once the watermark moves
    * past it — no successor window needed, and an idle key still
    * closes via the timer callback. Closing processes windows in
    * ascending order per key, so the prev-window chain is identical to
    * [[trendingCore]]'s and to the batch lag() mirror. */
  def trendingCoreWatermark(
      wins: org.apache.spark.sql.Dataset[(String, Long, java.sql.Timestamp)]): DataFrame = {
    import wins.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    wins
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Map[Long, Long], Long, Long), (Long, String, Long, Long)](
        OM.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key: String,
         rows: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[(Map[Long, Long], Long, Long)]) =>
          var (open, lastWin, lastCnt) = state.getOption.getOrElse(
            (Map.empty[Long, Long], Long.MinValue, 0L))
          rows.foreach { case (_, w, _) => open = open.updated(w, open.getOrElse(w, 0L) + 1) }
          // on a timer callback `rows` is empty and hasTimedOut is set;
          // the same close pass below handles both invocation kinds
          val wmMs = state.getCurrentWatermarkMs()
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
          open.toSeq.sortBy(_._1).foreach { case (w, c) =>
            if ((w + 1) * TenMinMs <= wmMs) { // window end has been passed
              val prev = if (w == lastWin + 1) lastCnt else 0L
              if (c >= TrendMin && c >= 2 * prev) out += ((w * TenMinMs, key, c, prev))
              lastWin = w; lastCnt = c
              open = open - w
            }
          }
          state.update((open, lastWin, lastCnt))
          // every still-open window ends strictly after the watermark
          // (the close pass drained the rest), so the timer is legal
          if (open.nonEmpty) state.setTimeoutTimestamp(open.keys.min * TenMinMs + TenMinMs)
          out.iterator
      }
      .toDF("window_ms", "event_type", "cnt", "prev")
  }

  /** Trailing-window anomaly detection — batch mirror. Per user, each
    * event's value is compared against the mean/σ of its previous
    * AnomalyWindow values (ROWS frame ending 1 PRECEDING — the current
    * value never contaminates its own baseline); an alert fires when
    * |v − mean| > AnomalyZ·σ with at least AnomalyMinPrior history.
    * σ from the avg-of-squares identity (not stddev_samp) so both
    * engines walk the identical float path; mean/σ rounded to 6 dp
    * BEFORE the threshold compare, pinning the alert set cross-engine.
    * Scale: the window partitions by user_id — millions of independent
    * small frames, map-side after one shuffle on user. */
  val AnomalyWindow = 20
  val AnomalyMinPrior = 5
  val AnomalyZ = 3.0
  def anomalyBatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"), col("value"))
      .rowsBetween(-AnomalyWindow, -1)
    events(spark, dir)
      .withColumn("n_prior", count(col("value")).over(w))
      .withColumn("mean_raw", avg(col("value")).over(w))
      .withColumn("m2_raw", avg(col("value") * col("value")).over(w))
      .filter(col("n_prior") >= AnomalyMinPrior)
      .withColumn("mean", round(col("mean_raw"), 6))
      .withColumn("std", round(sqrt(greatest(
        col("m2_raw") - col("mean_raw") * col("mean_raw"), lit(0.0))), 6))
      .filter(abs(col("value") - col("mean")) > lit(AnomalyZ) * col("std"))
      .select(col("event_id"), col("user_id"), expr("ts_us div 1000").as("ts_ms"),
        round(col("value"), 2).as("value"), col("mean"), col("std"))
      .orderBy("user_id", "ts_ms", "event_id")
  }

  /** Streaming front-end: per-user keyed state holding the last
    * AnomalyWindow values in event-time order; each arriving event is
    * tested against the CURRENT state baseline, then pushed into it —
    * exactly the batch mirror's trailing frame when events arrive in
    * order per key (the spec feeds time-ordered batches; a live
    * pipeline would buffer on the watermark before folding). */
  def anomalyStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    anomalyCore(readEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Long, Double)])
  }

  /** Core of the anomaly detector: state = the last AnomalyWindow values
    * per user. Rows within an invocation are folded in (ts, event_id,
    * value) order so a micro-batch's unordered iterator can't reorder
    * the baseline. Emits the same (event_id, user_id, ts_ms, value,
    * mean, std) rows as [[anomalyBatch]]. */
  def anomalyCore(
      evs: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    evs
      .groupByKey(_._2)
      .flatMapGroupsWithState[Vector[Double], (Long, Long, Long, Double, Double, Double)](
        OM.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long,
         rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[Vector[Double]]) =>
          var buf = state.getOption.getOrElse(Vector.empty[Double])
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, Double, Double, Double)]
          rows.toSeq.sortBy { case (eid, _, ts, v) => (ts, eid, v) }
            .foreach { case (eid, _, ts, v) =>
              if (buf.size >= AnomalyMinPrior) {
                val meanRaw = buf.sum / buf.size
                val m2Raw = buf.map(x => x * x).sum / buf.size
                val mean = BigDecimal(meanRaw)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                val std = BigDecimal(math.sqrt(math.max(m2Raw - meanRaw * meanRaw, 0.0)))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (math.abs(v - mean) > AnomalyZ * std)
                  out += ((eid, user, ts / 1000,
                    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
                    mean, std))
              }
              buf = (buf :+ v).takeRight(AnomalyWindow)
            }
          state.update(buf)
          out.iterator
      }
      .toDF("event_id", "user_id", "ts_ms", "value", "mean", "std")
  }

  /** Per-window top-k event types — batch mirror. The rank window runs
    * over the AGGREGATED (window, type) counts, so its group size is
    * |event types| (a small constant), not a corpus-sized sort. */
  val TopKPerWindow = 3
  def topkBatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("window_ms"))
      .orderBy(col("cnt").desc, col("event_type"))
    events(spark, dir)
      .withColumn("window_ms", expr(s"(ts_us div $HourUs) * 3600000"))
      .groupBy("window_ms", "event_type").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopKPerWindow)
      .select("window_ms", "rnk", "event_type", "cnt")
      .orderBy("window_ms", "rnk")
  }

  /** Streaming per-window top-k (same 1 h windows over readStream):
    * keyed state per window accumulates per-type counts across
    * micro-batches; the ranking emits ONCE, when the event-time
    * watermark passes the window's end (EventTimeTimeout timer — the
    * trendingCoreWatermark machinery), then the state drops. State size
    * = |open windows| × |types|, bounded by the watermark. */
  def topkStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    topkCoreWatermark(readEvents(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(expr(s"ts_us div $HourUs").as("win"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)])
  }

  def topkCoreWatermark(
      evs: org.apache.spark.sql.Dataset[(Long, String, java.sql.Timestamp)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    evs
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], (Long, Long, String, Long)](
        OM.Append(), GroupStateTimeout.EventTimeTimeout) {
        (win: Long,
         rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Map[String, Long]]) =>
          var counts = state.getOption.getOrElse(Map.empty[String, Long])
          rows.foreach { case (_, t, _) =>
            counts = counts.updated(t, counts.getOrElse(t, 0L) + 1)
          }
          val winEndMs = (win + 1) * HourMs
          if (winEndMs <= state.getCurrentWatermarkMs()) {
            // window closed (data pass or timer callback): rank + drop
            state.remove()
            counts.toSeq.sortBy { case (t, c) => (-c, t) }
              .take(TopKPerWindow).iterator.zipWithIndex
              .map { case ((t, c), i) => (win * HourMs, i + 1L, t, c) }
          } else {
            state.update(counts)
            state.setTimeoutTimestamp(winEndMs)
            Iterator.empty
          }
      }
      .toDF("window_ms", "rnk", "event_type", "cnt")
  }

  // ---- stream-static enrichment join (dimension lookup at ingest) ----

  /** Batch mirror of the stream-static enrichment: events joined to
    * the customer dimension (user_id = c_custkey), hourly revenue per
    * nation in exact cents. The streaming arm joins the SAME static
    * DataFrame into the stream before the windowed agg — Structured
    * Streaming's stream-static join re-broadcasts the dim per
    * micro-batch; state is only the windowed aggregate. The classic
    * "enrich at ingest" pattern: the dim is a broadcast, the stream
    * never shuffles except for the window keys. */
  def enrichBatch(spark: SparkSession, dir: String): DataFrame =
    enrichCore(events(spark, dir), spark, dir)

  private def enrichCore(ev: DataFrame, spark: SparkSession, dir: String): DataFrame = {
    val dim = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_nationkey").as("nation"))
    ev.select(col("user_id"),
        expr(s"(ts_us div $HourUs) * $HourMs").as("window_ms"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .join(broadcast(dim), "user_id")
      .groupBy("nation", "window_ms")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .orderBy("nation", "window_ms")
  }

  private val enrichOracle: String =
    s"""WITH e AS (SELECT user_id, (epoch_us(ts) // $HourUs) * $HourMs AS window_ms,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                   FROM events),
          dim AS (SELECT c_custkey AS user_id, c_nationkey AS nation FROM customer)
        SELECT d.nation, e.window_ms, count(*) AS n, sum(e.cents)::BIGINT AS cents
        FROM e JOIN dim d USING (user_id)
        GROUP BY 1, 2 ORDER BY nation, window_ms"""

  /** The real streaming plan: readStream → static-dim join → watermark
    * → windowed agg (Complete mode in the spec's memory sink). */
  def enrichStream(spark: SparkSession, dir: String): DataFrame = {
    val dim = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_nationkey").as("nation"))
    readEvents(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim), "user_id")
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
      .groupBy(col("nation"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .select(col("nation"), unix_micros(col("w.start")).*(lit(1L)).as("us"),
        col("n"), col("cents"))
      .select(col("nation"), expr("us div 1000").as("window_ms"), col("n"), col("cents"))
  }

  // ---- streaming CDC (latest-wins materialized state) ----

  /** Batch mirror of the CDC view: each user's LATEST event (max
    * (ts, event_id) — the deterministic total order) is their current
    * state; the registered query summarizes the materialized state
    * table per type with exact cents. The streaming arm is the
    * upsert-at-ingest shape: ONE (ts, eid, type, cents) tuple of
    * state per key, updated monotonically — the materialized-view
    * maintenance every CDC sink (Debezium-style latest-wins) runs. */
  def cdcBatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum(col("cents")).as("cents"))
      .orderBy("event_type")
  }

  private val cdcOracle: String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                   FROM events),
          r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
        SELECT event_type, count(*) AS n_users, sum(cents)::BIGINT AS cents
        FROM r WHERE rn = 1 GROUP BY 1 ORDER BY event_type"""

  def cdcStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cdcCore(readEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)])
  }

  /** Latest-wins state core: state per user = (ts, eid, type, cents)
    * of the winning event; rows fold through a max on (ts, eid).
    * Emits a key's state ONLY when the winning event CHANGED in this
    * invocation — the CDC changelog contract (r12, closing the r11
    * multi-batch caveat): a micro-batch that touches a key without
    * changing its winner appends NOTHING, so multi-batch runs
    * accumulate one row per actual state transition instead of one
    * per (key, batch). A single-batch drain still emits every key
    * exactly once (state starts absent, so the first fold is always
    * a change), which is what the batch-equivalence spec replays; the
    * multi-batch spec asserts the changelog property: final row per
    * key equals the batch mirror and a no-change redelivery appends
    * zero rows. */
  def cdcCore(evs: org.apache.spark.sql.Dataset[(Long, Long, Long, String, Double)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    evs
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long, String, Long),
        (Long, String, Long)](OM.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long,
         rows: Iterator[(Long, Long, Long, String, Double)],
         state: GroupState[(Long, Long, String, Long)]) =>
          val prev = state.getOption
          var cur = prev.getOrElse((Long.MinValue, Long.MinValue, "", 0L))
          rows.foreach { case (eid, _, ts, typ, v) =>
            if (ts > cur._1 || (ts == cur._1 && eid > cur._2))
              cur = (ts, eid, typ, math.floor(v * 100 + 0.5).toLong)
          }
          state.update(cur)
          if (prev.contains(cur)) Iterator.empty
          else Iterator.single((user, cur._3, cur._4))
      }
      .toDF("user_id", "event_type", "cents")
  }

  // ---- streaming EWMA (per-type hourly smoothed metric) ----

  /** Batch mirror of the streaming EWMA: hourly cent-exact value sums
    * per event type, smoothed over the trailing Forecast.EwmaK hourly
    * observations (row-lag semantics, weights renormalized over the
    * present lags — exactly q50_ewma's discipline at streaming
    * granularity). The stream arm keeps (ring of last K−1 x's, open
    * window accumulator) per type in the state store — the smoothed
    * ops-metric at ingest time with |types|-sized state. */
  def ewmaBatch(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .select(col("event_type"),
        expr(s"(ts_us div $HourUs) * $HourMs").as("window_ms"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "window_ms")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .withColumn("x", col("c").cast("double") / 100)
    val w = Window.partitionBy("event_type").orderBy("window_ms")
    val lags = (0 until graft.operators.Forecast.EwmaK)
      .map(k => lag(col("x"), k).over(w))
    val num = lags.zip(graft.operators.Forecast.weights)
      .map { case (l, wt) => coalesce(l * lit(wt), lit(0.0)) }
      .reduceLeft(_ + _)
    val den = lags.zip(graft.operators.Forecast.weights)
      .map { case (l, wt) => when(l.isNotNull, lit(wt)).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    hourly
      .withColumn("ewma", round(num / den, 6))
      .select(col("event_type"), col("window_ms"), col("n"), col("x"), col("ewma"))
      .orderBy("event_type", "window_ms")
  }

  private lazy val ewmaOracle: String = {
    val ws = graft.operators.Forecast.weights
    val nums = ws.zipWithIndex
      .map { case (wt, k) => s"coalesce(lag(x, $k) OVER tw * $wt, 0)" }
      .mkString("(", "\n                 + ", ")")
    val dens = ws.zipWithIndex
      .map { case (wt, k) =>
        s"CASE WHEN lag(x, $k) OVER tw IS NOT NULL THEN $wt ELSE 0 END" }
      .mkString("(", "\n                 + ", ")")
    s"""WITH hourly AS (
          SELECT event_type, (epoch_us(ts) // $HourUs) * $HourMs AS window_ms,
                 count(*) AS n,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
          FROM events GROUP BY 1, 2)
        SELECT event_type, window_ms, n, c::DOUBLE / 100 AS x,
               round($nums
                     / $dens, 6) AS ewma
        FROM hourly
        WINDOW tw AS (PARTITION BY event_type ORDER BY window_ms)
        ORDER BY event_type, window_ms"""
  }

  def ewmaStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ewmaCore(readEvents(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .as[(Long, String, Long, Double)])
  }

  /** Stateful EWMA core. State per type: (ring of last K−1 finalized
    * x's, open window index, its count, its exact cent sum). Rows fold
    * in (ts, event_id) order; a window finalizes when a later window's
    * first event arrives. The still-open tail window is emitted
    * PROVISIONALLY at the end of each invocation (without committing
    * it to state) so a drained stream matches the batch mirror row for
    * row; the float fold adds terms newest-lag-first in exactly the
    * batch plan's reduceLeft order, so the doubles are bit-identical.
    * Multi-micro-batch runs re-emit the provisional tail each batch —
    * see cdcCore's MULTI-BATCH CAVEAT (same discipline, same sink
    * dedup remedy). */
  def ewmaCore(evs: org.apache.spark.sql.Dataset[(Long, String, Long, Double)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val ws = graft.operators.Forecast.weights
    val keep = graft.operators.Forecast.EwmaK - 1
    def smooth(ring: Vector[Double], x: Double): Double = {
      val xs = ring :+ x // oldest..newest
      var num = 0.0
      var den = 0.0
      for (k <- ws.indices) {
        val idx = xs.size - 1 - k
        if (idx >= 0) { num += xs(idx) * ws(k); den += ws(k) }
        else { num += 0.0; den += 0.0 } // mirror the batch coalesce terms
      }
      BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    evs
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Vector[Double], Long, Long, Long),
        (String, Long, Long, Double, Double)](OM.Append(), GroupStateTimeout.NoTimeout) {
        (typ: String,
         rows: Iterator[(Long, String, Long, Double)],
         state: GroupState[(Vector[Double], Long, Long, Long)]) =>
          var (ring, curWin, curN, curC) =
            state.getOption.getOrElse((Vector.empty[Double], -1L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, Long, Double, Double)]
          def closeWindow(): Unit = if (curWin >= 0) {
            val x = curC.toDouble / 100
            out += ((typ, curWin * HourMs, curN, x, smooth(ring, x)))
            ring = (ring :+ x).takeRight(keep)
            curN = 0; curC = 0
          }
          rows.toSeq.sortBy(r => (r._3, r._1)).foreach { case (_, _, ts, v) =>
            val win = ts / HourUs
            if (win != curWin) { closeWindow(); curWin = win }
            curN += 1
            curC += math.floor(v * 100 + 0.5).toLong
          }
          state.update((ring, curWin, curN, curC))
          // provisional tail (not committed): a drained stream reports
          // the open window exactly as the batch mirror does
          if (curWin >= 0) {
            val x = curC.toDouble / 100
            out += ((typ, curWin * HourMs, curN, x, smooth(ring, x)))
          }
          out.iterator
      }
      .toDF("event_type", "window_ms", "n", "x", "ewma")
  }

  /** WATERMARK-CLOSE EWMA — the multi-micro-batch production path
    * (r12, closing the r11 provisional-tail caveat): windows emit
    * EXACTLY ONCE, either when a later window's first event arrives
    * (the ewmaCore close) or when the event-time watermark passes the
    * window end (EventTimeTimeout at winEnd−1 ms — after that no
    * non-late event can land in the window, so the emission is final).
    * No provisional tail: a drained stream materializes precisely the
    * windows whose end ≤ the final watermark (= max event time at 0 s
    * delay), each once, so a run split across ANY number of
    * time-ordered micro-batches equals the batch mirror's closed-
    * window restriction with NO sink dedup. Late rows (window already
    * closed) are dropped — the same contract as Spark's watermarked
    * window aggregation. */
  def ewmaCoreWm(evs: org.apache.spark.sql.Dataset[(Long, String, Long, Double)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val ws = graft.operators.Forecast.weights
    val keep = graft.operators.Forecast.EwmaK - 1
    def smooth(ring: Vector[Double], x: Double): Double = {
      val xs = ring :+ x
      var num = 0.0
      var den = 0.0
      for (k <- ws.indices) {
        val idx = xs.size - 1 - k
        if (idx >= 0) { num += xs(idx) * ws(k); den += ws(k) }
      }
      BigDecimal(num / den).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    evs.toDF("event_id", "event_type", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "0 seconds")
      // the watermark-tagged ts column must SURVIVE into the grouped
      // Dataset — projecting it away detaches the watermark and the
      // event-time timeout is rejected at analysis
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"), col("ts"))
      .as[(Long, String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Vector[Double], Long, Long, Long),
        (String, Long, Long, Double, Double)](OM.Append(), GroupStateTimeout.EventTimeTimeout) {
        (typ: String,
         rows: Iterator[(Long, String, Long, Double, java.sql.Timestamp)],
         state: GroupState[(Vector[Double], Long, Long, Long)]) =>
          var (ring, curWin, curN, curC) =
            state.getOption.getOrElse((Vector.empty[Double], -1L, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, Long, Double, Double)]
          def closeWindow(): Unit = if (curWin >= 0) {
            val x = curC.toDouble / 100
            out += ((typ, curWin * HourMs, curN, x, smooth(ring, x)))
            ring = (ring :+ x).takeRight(keep)
            curN = 0; curC = 0; curWin = -1
          }
          if (state.hasTimedOut) {
            // watermark ≥ winEnd: the open window is final — emit once
            closeWindow()
            state.update((ring, curWin, curN, curC))
          } else {
            val wm = state.getCurrentWatermarkMs()
            rows.toSeq.sortBy(r => (r._3, r._1)).foreach { case (_, _, ts, v, _) =>
              val win = ts / HourUs
              if ((win + 1) * HourMs > wm) { // non-late only
                if (win != curWin) { closeWindow(); curWin = win }
                curN += 1
                curC += math.floor(v * 100 + 0.5).toLong
              }
            }
            state.update((ring, curWin, curN, curC))
            if (curWin >= 0)
              state.setTimeoutTimestamp((curWin + 1) * HourMs - 1)
          }
          out.iterator
      }
      .toDF("event_type", "window_ms", "n", "x", "ewma")
  }

  def ewmaStreamWm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ewmaCoreWm(readEvents(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .as[(Long, String, Long, Double)])
  }

  /** Batch mirror of [[ewmaCoreWm]]'s drained output: ewmaBatch
    * restricted to CLOSED windows (window end ≤ the corpus's max
    * event-time millisecond — exactly the final-watermark cut). The
    * max rides along as a broadcast 1-row aggregate. */
  def ewmaClosedBatch(spark: SparkSession, dir: String): DataFrame = {
    val maxMs = events(spark, dir)
      .agg((max(col("ts_us")).cast("long") / lit(1000L)).cast("long").as("max_ms"))
    ewmaBatch(spark, dir)
      .crossJoin(broadcast(maxMs))
      .filter(col("window_ms") + lit(HourMs) <= col("max_ms"))
      .drop("max_ms")
      .orderBy("event_type", "window_ms")
  }

  private lazy val ewmaClosedOracle: String = {
    val ws = graft.operators.Forecast.weights
    val nums = ws.zipWithIndex
      .map { case (wt, k) => s"coalesce(lag(x, $k) OVER tw * $wt, 0)" }
      .mkString("(", "\n                 + ", ")")
    val dens = ws.zipWithIndex
      .map { case (wt, k) =>
        s"CASE WHEN lag(x, $k) OVER tw IS NOT NULL THEN $wt ELSE 0 END" }
      .mkString("(", "\n                 + ", ")")
    s"""WITH hourly AS (
          SELECT event_type, (epoch_us(ts) // $HourUs) * $HourMs AS window_ms,
                 count(*) AS n,
                 sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
          FROM events GROUP BY 1, 2),
          sm AS (SELECT event_type, window_ms, n, c::DOUBLE / 100 AS x,
               round($nums
                     / $dens, 6) AS ewma
          FROM hourly
          WINDOW tw AS (PARTITION BY event_type ORDER BY window_ms))
        SELECT event_type, window_ms, n, x, ewma FROM sm
        WHERE window_ms + $HourMs <= (SELECT max(epoch_us(ts)) // 1000 FROM events)
        ORDER BY event_type, window_ms"""
  }

  // ---- streaming Holt (level + trend through the state store) ----

  /** Batch mirror of the streaming Holt smoother: hourly cent-exact
    * value sums per event type through Forecast.holtSmooth — q56's
    * level/trend/1-step-forecast at streaming granularity. The stream
    * arm keeps (ring of last HoltK−1 finalized x's, open window
    * accumulator) per type — ewmaCore's state shape with the Holt
    * recurrence as the readout; rows emit only once a full K-window
    * history exists, matching the batch mirror's lag filter. */
  def holtBatch(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .select(col("event_type"),
        expr(s"(ts_us div $HourUs) * $HourMs").as("window_ms"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "window_ms")
      .agg(sum(col("cents")).as("c"))
      .withColumn("x", col("c").cast("double") / 100)
      .select("event_type", "window_ms", "x")
    graft.operators.Forecast.holtSmooth(hourly, "event_type", "window_ms")
      .orderBy("event_type", "window_ms")
  }

  def holtStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    holtCore(readEvents(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .as[(Long, String, Long, Double)])
  }

  /** Stateful Holt core — ewmaCore's windowing discipline (fold rows
    * in (ts, id) order, finalize a window when a later one opens, emit
    * the open tail PROVISIONALLY; multi-micro-batch runs re-emit the
    * tail — see cdcCore's MULTI-BATCH CAVEAT) with the q56 recurrence
    * as readout: the Scala fold performs the IDENTICAL IEEE ops, in
    * the identical order, with the identical printed-and-reparsed
    * (1−α)/(1−β) constants as the lateral-alias formula text both
    * batch engines evaluate — so a drained stream matches the batch
    * mirror bit-for-bit (StreamingSpec proves it). State per type:
    * HoltK−1 doubles + the open accumulator. */
  def holtCore(evs: org.apache.spark.sql.Dataset[(Long, String, Long, Double)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val K = graft.operators.Forecast.HoltK
    val a = graft.operators.Forecast.HoltAlpha
    val be = graft.operators.Forecast.HoltBeta
    val oneMa = 1 - a
    val oneMb = 1 - be
    val keep = K - 1
    // explicit IEEE quantization — identical ops to the batch SQL's
    // floor(x*1e6 + 0.5)/1e6 (see Forecast.holtSmooth's rationale)
    def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    // xs oldest..newest, size K — the x_{K-1}..x_0 lag aliases
    def holt(xs: Vector[Double]): (Double, Double, Double) = {
      var l = xs(0)
      var b = xs(1) - xs(0)
      var j = K - 2
      while (j >= 0) {
        val x = xs(K - 1 - j)
        val l1 = a * x + oneMa * (l + b)
        b = be * (l1 - l) + oneMb * b
        l = l1
        j -= 1
      }
      (r6(l), r6(b), r6(l + b))
    }
    evs
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Vector[Double], Long, Long),
        (String, Long, Double, Double, Double, Double)](OM.Append(), GroupStateTimeout.NoTimeout) {
        (typ: String,
         rows: Iterator[(Long, String, Long, Double)],
         state: GroupState[(Vector[Double], Long, Long)]) =>
          var (ring, curWin, curC) =
            state.getOption.getOrElse((Vector.empty[Double], -1L, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, Double, Double, Double, Double)]
          def emit(provisional: Boolean): Unit = if (curWin >= 0) {
            val x = curC.toDouble / 100
            if (ring.size == keep) {
              val (l, b, f) = holt(ring :+ x)
              out += ((typ, curWin * HourMs, x, l, b, f))
            }
            if (!provisional) { ring = (ring :+ x).takeRight(keep); curC = 0 }
          }
          rows.toSeq.sortBy(r => (r._3, r._1)).foreach { case (_, _, ts, v) =>
            val win = ts / HourUs
            if (win != curWin) { emit(provisional = false); curWin = win }
            curC += math.floor(v * 100 + 0.5).toLong
          }
          state.update((ring, curWin, curC))
          emit(provisional = true)
          out.iterator
      }
      .toDF("event_type", "window_ms", "x", "level", "trend", "forecast1")
  }

  // ---- streaming last-touch attribution (per-user state) ----

  /** Batch mirror of the streaming attribution: q57's per-purchase
    * detail BEFORE the rollup — every purchase with the touch type
    * credited by the 24 h last-touch rule (the running-last window
    * form; see EventAnalytics.q57Attribution). The stream arm keeps
    * ONE (ts, type) pair per user in the state store — attribution at
    * ingest time with |users|-sized state, no window, no join. */
  def attributionBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val look = graft.operators.EventAnalytics.AttrLookbackUs
    val ev = events(spark, dir)
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
      .select(col("event_id").as("purchase_id"), col("user_id"), col("cents"),
        when(col("lt_ts").isNotNull && col("lt_ts") >= col("ts_us") - look,
          col("lt_type")).otherwise(lit("none")).as("touch_type"))
      .orderBy("purchase_id")
  }

  def attributionStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    attributionCore(readEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)])
  }

  /** Stateful attribution core: state per user = the latest touch's
    * (ts, type) — ONE pair, regardless of event volume. Rows fold in
    * (ts, id) order; purchases emit their credit immediately
    * (committed rows, not provisional — attribution is final the
    * moment the purchase arrives, so multi-micro-batch runs do NOT
    * re-emit; the cdcCore caveat does not apply here). */
  def attributionCore(evs: org.apache.spark.sql.Dataset[(Long, Long, Long, String, Double)]): DataFrame = {
    import evs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val look = graft.operators.EventAnalytics.AttrLookbackUs
    evs
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, String),
        (Long, Long, Long, String)](OM.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long,
         rows: Iterator[(Long, Long, Long, String, Double)],
         state: GroupState[(Long, String)]) =>
          var (ltTs, ltType) = state.getOption.getOrElse((Long.MinValue, ""))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
          rows.toSeq.sortBy(r => (r._3, r._1)).foreach { case (eid, _, ts, typ, v) =>
            typ match {
              case "view" | "click" => ltTs = ts; ltType = typ
              case "purchase" =>
                val credit =
                  if (ltTs != Long.MinValue && ltTs >= ts - look) ltType else "none"
                out += ((eid, user, math.floor(v * 100 + 0.5).toLong, credit))
              case _ => ()
            }
          }
          state.update((ltTs, ltType))
          out.iterator
      }
      .toDF("purchase_id", "user_id", "cents", "touch_type")
  }

  // ---- streaming near-dup detection (minhash bands through state) ----

  /** In-row banded minhash of a (doc_id, text) relation: each signature
    * is a per-row `array_min` over the shingle array — NO aggregation,
    * so the whole signature pipeline is a map and the streaming plan
    * has exactly ONE stateful operator (the band-bucket state). Values
    * are identical to GraftOps.minhashSignatures + bandCandidates by
    * construction (same HashingScheme constants, min over the same
    * multiset). */
  def bandRowsInRow(docs: DataFrame): DataFrame = {
    import graft.functions.{HashingScheme => HS}
    val sigCols = (0 until HS.NumHashes).map { i =>
      expr(s"array_min(transform(shs, s -> (${HS.a(i)}L * " +
        s"(CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT) % ${HS.P}L) + " +
        s"${HS.b(i)}L) % ${HS.P}L))").as(s"mh$i")
    }
    val sigs = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("shs", graft.functions.TextFns.shingles("toks", 3))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id") +: sigCols: _*)
    val bandCols = (0 until HS.Bands).map { j =>
      val parts = (j * HS.RowsPerBand until (j + 1) * HS.RowsPerBand)
        .map(i => s"mh$i").mkString(", ")
      expr(s"concat_ws('_', $parts)").as(s"band$j")
    }
    val banded = sigs.select(col("doc_id") +: bandCols: _*)
    (0 until HS.Bands).map(j =>
      banded.select(col("doc_id"), lit(j).as("bj"), col(s"band$j").as("bv")))
      .reduce(_ unionAll _)
  }

  /** Batch mirror of the streaming near-dup detector: a doc is a dup if
    * ANY of its LSH bands was first claimed by an EARLIER (smaller id)
    * doc. Reads the persisted band layout — first-claims are one
    * min-groupBy over it, the verdict one more groupBy; both shuffle
    * ∝ bands×docs. The streaming arm holds one long (earliest claimant)
    * per distinct band bucket in the state store — near-dup detection
    * at ingest time without ever re-scanning the accumulated corpus. */
  def minhashDedupBatch(spark: SparkSession, dir: String): DataFrame = {
    val (_, cand) = graft.operators.Dedup.persistedMinhashLayout(spark, dir)
    val firsts = cand.groupBy("bj", "bv").agg(min("doc_id").as("first_doc"))
    cand.join(firsts, Seq("bj", "bv"))
      .groupBy("doc_id")
      .agg(sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_hot_bands"))
      .select(col("doc_id"), col("n_hot_bands"), (col("n_hot_bands") > 0).as("is_dup"))
      .orderBy("doc_id")
  }

  private lazy val minhashDedupOracle: String =
    s"""WITH ${graft.operators.Dedup.minhashPairCtesFrom("documents")},
          firsts AS (SELECT bj, bv, min(doc_id) AS first_doc FROM cand GROUP BY 1, 2),
          perdoc AS (SELECT c.doc_id,
                            sum(CASE WHEN f.first_doc < c.doc_id THEN 1 ELSE 0 END) AS nh
                     FROM cand c JOIN firsts f ON c.bj = f.bj AND c.bv = f.bv
                     GROUP BY 1)
        SELECT doc_id, CAST(nh AS BIGINT) AS n_hot_bands, nh > 0 AS is_dup
        FROM perdoc ORDER BY doc_id"""

  /** readStream view of the documents parquet (same symlink bridge as
    * [[readEvents]]). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val streamDir = Paths.get(sys.props("java.io.tmpdir"), "graft-stream-docs",
      dir.replaceAll("[^A-Za-z0-9]", "_"))
    Files.createDirectories(streamDir)
    val link = streamDir.resolve("documents.parquet")
    if (!Files.exists(link)) Files.createSymbolicLink(link, Paths.get(s"$dir/documents.parquet"))
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }

  /** Streaming arm: per-(doc, band) dup verdicts through band-bucket
    * state — state per distinct bucket is ONE long (the earliest
    * claimant). Within a micro-batch the handler processes docs in
    * ascending id order, so verdicts equal the batch mirror whenever
    * arrival order respects doc_id order (the testdata file is
    * id-sorted; StreamingSpec asserts the convergence). The per-doc
    * OR-aggregate lives downstream of the stream (a second stateful
    * stage would buy nothing — the band verdicts are the stream's
    * useful granularity). */
  def minhashDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val bands = bandRowsInRow(readDocuments(spark, dir)
        .select(col("doc_id"), col("text")))
      .as[(Long, Int, String)]
    bands
      .groupByKey { case (_, bj, bv) => s"$bj:$bv" }
      .flatMapGroupsWithState[Long, (Long, Int, Boolean)](
        OM.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, Int, String)], state: GroupState[Long]) =>
          var first = state.getOption.getOrElse(Long.MaxValue)
          val out = rows.toSeq.sortBy(_._1).map { case (d, bj, _) =>
            val dup = first < d
            if (d < first) first = d
            (d, bj, dup)
          }
          state.update(first)
          out.iterator
      }
      .toDF("doc_id", "bj", "dup_band")
  }

  // ---- streaming weighted reservoir (r12): A-ES through state ----

  /** JVM mirror of TextFns.hash32 / Curation.hashSql: the first 8 hex
    * chars of md5 as an unsigned 32-bit value. */
  private[graft] def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** The A-ES key exactly as cur_sample_weighted's Spark plan computes
    * it: round(ln((h + 0.5)/2^32) / w, 12) — same Math.log, same
    * HALF_UP decimal rounding, so streamed and batch keys are
    * bit-identical in one JVM. */
  private def esKey(docId: Long, nChars: Long): Double =
    BigDecimal(math.log((hash32(docId.toString).toDouble + 0.5) / 4294967296.0) / nChars)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Streaming weighted reservoir (Efraimidis–Spirakis through the
    * state store): per SOURCE the state is exactly the current top-
    * [[graft.operators.Curation.WeightedK]] (es_key, doc, n_chars)
    * triples — k tuples per source at ANY stream length, where a
    * batch take re-ranks the accumulated corpus. Admission is the
    * classic reservoir test (new key beats the threshold = current
    * k-th key); already-seen docs are ignored, so at-least-once
    * redelivery appends NOTHING. Changelog emission (the cdcCore r12
    * discipline): a source emits its reservoir — each member with its
    * rank and the source's admission threshold — only in invocations
    * where membership or order CHANGED; a single-batch drain
    * therefore emits each source exactly once, materializing the
    * batch mirror. */
  def weightedReservoirCore(
      docs: org.apache.spark.sql.Dataset[(Long, String, Long)]): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode => OM}
    val k = graft.operators.Curation.WeightedK
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[Vector[(Double, Long, Long)],
        (String, Long, Long, Double, Double)](OM.Append(), GroupStateTimeout.NoTimeout) {
        (src: String,
         rows: Iterator[(Long, String, Long)],
         state: GroupState[Vector[(Double, Long, Long)]]) =>
          val prev = state.getOption.getOrElse(Vector.empty)
          var res = prev
          rows.toSeq.sortBy(_._1).foreach { case (d, _, nc) =>
            if (nc > 0 && !res.exists(_._2 == d)) {
              res = ((esKey(d, nc), d, nc) +: res)
                .sortBy { case (key, id, _) => (-key, id) }
                .take(k)
            }
          }
          state.update(res)
          if (res == prev) Iterator.empty
          else {
            val thr = res.map(_._1).min
            res.iterator.zipWithIndex.map { case ((key, d, _), i) =>
              (src, (i + 1).toLong, d, key, thr)
            }
          }
      }
      .toDF("source", "rnk", "doc_id", "es_key", "threshold_key")
  }

  def weightedReservoirStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    weightedReservoirCore(readDocuments(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)])
  }

  /** Batch mirror: the per-source A-ES top-k with the es_key and the
    * admission threshold (min key in the reservoir = the bar a new
    * doc must beat) exposed — the sampler's operational contract,
    * where cur_sample_weighted reports only the membership. */
  def weightedReservoirBatch(spark: SparkSession, dir: String): DataFrame = {
    val k = graft.operators.Curation.WeightedK
    val keyed = graft.sources.Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"),
        round(log((graft.functions.TextFns.hash32(col("doc_id").cast("string"))
            .cast("double") + 0.5d) / 4294967296.0d) / col("n_chars"), 12).as("es_key"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("es_key").desc, col("doc_id"))
    keyed.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .withColumn("threshold_key", min(col("es_key")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("rnk"), col("doc_id"), col("es_key"), col("threshold_key"))
      .orderBy("source", "rnk")
  }

  private lazy val weightedReservoirOracle: String = {
    val k = graft.operators.Curation.WeightedK
    s"""WITH keyed AS (
          SELECT doc_id, source,
                 round(ln((${graft.operators.Curation.hashSql}::DOUBLE + 0.5) / 4294967296.0) / n_chars, 12) AS es_key
          FROM documents WHERE n_chars > 0),
          r AS (SELECT source, doc_id, es_key,
                       row_number() OVER (PARTITION BY source
                         ORDER BY es_key DESC, doc_id) AS rnk
                FROM keyed),
          t AS (SELECT source, rnk, doc_id, es_key,
                       min(es_key) OVER (PARTITION BY source) AS threshold_key
                FROM r WHERE rnk <= $k)
        SELECT source, rnk, doc_id, es_key, threshold_key
        FROM t ORDER BY source, rnk"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("stream_sample_weighted", weightedReservoirBatch, Some(weightedReservoirOracle)),
    QueryDef("stream_minhash_dedup", minhashDedupBatch, Some(minhashDedupOracle)),
    QueryDef("stream_ewma", ewmaBatch, Some(ewmaOracle)),
    QueryDef("stream_ewma_closed", ewmaClosedBatch, Some(ewmaClosedOracle)),
    QueryDef("stream_enrich", enrichBatch, Some(enrichOracle)),
    QueryDef("stream_cdc", cdcBatch, Some(cdcOracle)),
    QueryDef("stream_topk", topkBatch, Some(
      s"""WITH w AS (SELECT (epoch_us(ts) // $HourUs) * 3600000 AS window_ms,
                            event_type, count(*) AS cnt
                     FROM events GROUP BY 1, 2),
            r AS (SELECT window_ms, event_type, cnt,
                         row_number() OVER (PARTITION BY window_ms
                           ORDER BY cnt DESC, event_type) AS rnk
                  FROM w)
          SELECT window_ms, rnk, event_type, cnt FROM r
          WHERE rnk <= $TopKPerWindow ORDER BY window_ms, rnk""")),
    QueryDef("stream_sliding_count", slidingCountBatch, Some {
      val slideUs = TenMinUs / 2 // SAME derivation as slidingCountBatch
      s"""WITH s AS (SELECT (epoch_us(ts) // $slideUs) * $slideUs // 1000 AS s1 FROM events),
            e AS (SELECT s1 AS start_ms FROM s
                  UNION ALL SELECT s1 - ${slideUs / 1000} FROM s)
          SELECT start_ms, count(*) AS cnt FROM e GROUP BY 1 ORDER BY 1"""
    }),
    QueryDef("stream_dedup", dedupBatch, Some(
      """SELECT event_type, count(*) AS cnt
         FROM (SELECT DISTINCT event_id, event_type FROM events)
         GROUP BY 1 ORDER BY 1""")),
    QueryDef("stream_event_count", eventCountBatch, Some(
      s"""SELECT (epoch_us(ts) // $HourUs) * 3600000 AS window_ms, count(*) AS cnt
          FROM events GROUP BY 1 ORDER BY window_ms""")),
    QueryDef("stream_ohlc", ohlcWindowBatch, Some(
      s"""WITH e AS (SELECT event_type, (epoch_us(ts) // $HourUs) * 3600000 AS window_ms,
                            epoch_us(ts) AS ts_us, event_id,
                            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                     FROM events)
          SELECT window_ms, event_type,
                 (min({'ts_us': ts_us, 'event_id': event_id, 'cents': cents})).cents AS open,
                 max(cents) AS high, min(cents) AS low,
                 (max({'ts_us': ts_us, 'event_id': event_id, 'cents': cents})).cents AS close,
                 count(*) AS volume
          FROM e GROUP BY 1, 2 ORDER BY window_ms, event_type""")),
    QueryDef("stream_approx_users", approxUsersBatch, Some {
      val c = (KmvUsersK - 1).toLong * 4294967296L
      s"""WITH ev AS (SELECT DISTINCT (epoch_us(ts) // $HourUs) * 3600000 AS window_ms,
                        ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS x
                      FROM events),
            sk AS (SELECT window_ms, x,
                          row_number() OVER (PARTITION BY window_ms ORDER BY x) AS rk FROM ev),
            kk AS (SELECT window_ms, count(*) AS m, max(x) AS xk
                   FROM sk WHERE rk <= $KmvUsersK GROUP BY 1)
          SELECT window_ms,
                 CASE WHEN m < $KmvUsersK THEN m::DOUBLE
                      ELSE round($c / xk::DOUBLE, 4) END AS approx_users
          FROM kk ORDER BY window_ms"""
    }),
    QueryDef("stream_attribution", attributionBatch, Some {
      val look = graft.operators.EventAnalytics.AttrLookbackUs
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
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
          SELECT event_id AS purchase_id, user_id, cents,
                 CASE WHEN lt_ts IS NOT NULL AND lt_ts >= ts_us - $look
                      THEN lt_type ELSE 'none' END AS touch_type
          FROM lt WHERE event_type = 'purchase'
          ORDER BY purchase_id"""
    }),
    QueryDef("stream_holt", holtBatch, Some {
      val k = graft.operators.Forecast.HoltK
      val lagCols = (0 until k)
        .map(j => s"lag(x, $j) OVER tw AS x$j").mkString(",\n                 ")
      s"""WITH daily AS (
            SELECT event_type, (epoch_us(ts) // $HourUs) * $HourMs AS window_ms,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::DOUBLE / 100 AS x
            FROM events GROUP BY 1, 2),
            lagged AS (SELECT event_type, window_ms, x,
                   $lagCols
            FROM daily
            WINDOW tw AS (PARTITION BY event_type ORDER BY window_ms)),
            holt AS (SELECT event_type, window_ms, x,
                   ${graft.operators.Forecast.holtFormulas.mkString(",\n                   ")}
            FROM lagged WHERE x${k - 1} IS NOT NULL)
          SELECT event_type, window_ms, x,
                 floor(l0 * 1000000 + 0.5) / 1000000 AS level,
                 floor(b0 * 1000000 + 0.5) / 1000000 AS trend,
                 floor((l0 + b0) * 1000000 + 0.5) / 1000000 AS forecast1
          FROM holt ORDER BY event_type, window_ms"""
    }),
    QueryDef("stream_quantile", streamQuantileBatch, Some {
      val qList = QuantQs.mkString("[", ", ", "]")
      s"""WITH x AS (SELECT (epoch_us(ts) // $HourUs) * 3600000 AS window_ms,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_' ||
                                       CAST(epoch_us(ts) AS VARCHAR)), 1, 13))::BIGINT AS h
            FROM events),
            bk AS MATERIALIZED (SELECT window_ms, cents FROM (
                  SELECT window_ms, cents,
                         row_number() OVER (PARTITION BY window_ms ORDER BY h, cents) AS rn
                  FROM x) WHERE rn <= $QuantK),
            srt AS (SELECT window_ms, cents,
                   row_number() OVER (PARTITION BY window_ms ORDER BY cents) AS vr,
                   count(*) OVER (PARTITION BY window_ms) AS m
            FROM bk),
            qs AS (SELECT unnest($qList::DOUBLE[]) AS q)
          SELECT s.window_ms, q.q, s.cents AS est_cents
          FROM srt s JOIN qs q ON s.vr = CAST(ceil(q.q * s.m) AS BIGINT)
          ORDER BY s.window_ms, q.q"""
    }),
    QueryDef("stream_heavy_hitters", heavyHittersBatch, Some {
      val chunks = (0 until CmsStreamD).map(j =>
        s"('0x' || substr(h, ${8 * j + 1}, 8))::BIGINT % $CmsStreamW").mkString(", ")
      s"""WITH ev AS MATERIALIZED (
              SELECT (epoch_us(ts) // $HourUs) * 3600000 AS window_ms, user_id,
                     md5(CAST(user_id AS VARCHAR)) AS h
              FROM events),
            hb AS MATERIALIZED (SELECT window_ms, user_id,
                   unnest([$chunks]) AS b,
                   generate_subscripts([$chunks], 1) - 1 AS j
                 FROM ev),
            cms AS MATERIALIZED (SELECT window_ms, j, b, count(*) AS c
                 FROM hb GROUP BY 1, 2, 3),
            ch AS (SELECT DISTINCT window_ms, user_id, j, b FROM hb),
            est AS (SELECT ch.window_ms, ch.user_id, min(cms.c) AS est
                    FROM ch JOIN cms ON cms.window_ms = ch.window_ms
                      AND cms.j = ch.j AND cms.b = ch.b
                    GROUP BY 1, 2),
            r AS (SELECT window_ms, user_id, est,
                         row_number() OVER (PARTITION BY window_ms
                           ORDER BY est DESC, user_id) AS rnk
                  FROM est)
          SELECT window_ms, rnk, user_id, est FROM r
          WHERE rnk <= $HhStreamK ORDER BY window_ms, rnk"""
    }),
    QueryDef("stream_region_count", regionCountBatch, Some(
      s"""SELECT (epoch_us(ts) // $HourUs) * 3600000 AS window_ms,
                 CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS region,
                 count(*) AS cnt
          FROM events GROUP BY 1, 2 ORDER BY window_ms, region""")),
    QueryDef("stream_interval_join", intervalJoinBatch, Some(
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
            p AS (SELECT event_id AS pid, user_id, ts_us AS pts FROM e WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS cid, user_id, ts_us AS cts FROM e WHERE event_type = 'click')
          SELECT p.pid AS event_id, p.user_id, p.pts // 1000 AS ts_ms, count(c.cid) AS n_clicks
          FROM p LEFT JOIN c ON p.user_id = c.user_id
            AND c.cts >= p.pts - ${JoinWindowUs} AND c.cts <= p.pts
          GROUP BY 1, 2, 3 ORDER BY event_id""")),
    QueryDef("stream_session_window", sessionWindowBatch, Some(
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
            l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
            s AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= $SessionGapUs THEN 1 ELSE 0 END AS brk FROM l),
            c AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                           ROWS UNBOUNDED PRECEDING) AS sess_no FROM s)
          SELECT user_id, min(ts_us) // 1000 AS start_ms, count(*) AS n_events,
                 round(sum(value), 2) AS sum_value
          FROM c GROUP BY user_id, sess_no ORDER BY user_id, start_ms""")),
    QueryDef("stream_anomaly", anomalyBatch, Some(
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
            s AS (SELECT *,
                         count(value) OVER w AS n_prior,
                         avg(value) OVER w AS mean_raw,
                         avg(value * value) OVER w AS m2_raw
                  FROM e WINDOW w AS (PARTITION BY user_id
                    ORDER BY ts_us, event_id, value
                    ROWS BETWEEN $AnomalyWindow PRECEDING AND 1 PRECEDING)),
            f AS (SELECT event_id, user_id, ts_us, value,
                         round(mean_raw, 6) AS mean,
                         round(sqrt(greatest(m2_raw - mean_raw * mean_raw, 0)), 6) AS std
                  FROM s WHERE n_prior >= $AnomalyMinPrior)
          SELECT event_id, user_id, ts_us // 1000 AS ts_ms, round(value, 2) AS value,
                 mean, std
          FROM f WHERE abs(value - mean) > $AnomalyZ * std
          ORDER BY user_id, ts_ms, event_id""")),
    QueryDef("stream_trending", trendingBatch, Some(trendingOracle)),
    QueryDef("stream_trending_recovery", trendingRecovery, Some(trendingOracle)),
  )

  private lazy val trendingOracle: String =
    s"""WITH w AS (SELECT event_type, epoch_us(ts) // $TenMinUs AS win, count(*) AS cnt
                   FROM events GROUP BY 1, 2),
          l AS (SELECT *, lag(win) OVER (PARTITION BY event_type ORDER BY win) AS prev_win,
                       lag(cnt) OVER (PARTITION BY event_type ORDER BY win) AS prev_cnt
                FROM w),
          p AS (SELECT event_type, win, cnt,
                       CASE WHEN prev_win IS NOT NULL AND prev_win = win - 1
                            THEN prev_cnt ELSE 0 END AS prev
                FROM l)
        SELECT win * 600000 AS window_ms, event_type, cnt, prev
        FROM p WHERE cnt >= $TrendMin AND cnt >= 2 * prev
        ORDER BY window_ms, event_type"""

  /** CHECKPOINTED STATE RECOVERY as a registered, oracle-verified query
    * (r13 — the restart semantics the reference's a7 TrendingArrivals
    * exercises with its checkpointed mapWithState; reference
    * a7/TrendingArrivals.scala:117-145): the events table is split in
    * TIME at the middle of a window (so one window's count SPANS the
    * restart and must survive in recovered state), batch 1 runs through
    * the watermarked trending detector with a durable checkpoint + file
    * sink and the query is stopped COLD; a NEW query restarts from the
    * same checkpoint — source offsets, watermark, and the
    * flatMapGroupsWithState store all recovered — and drains batch 2
    * plus a far-future sentinel key that pushes the watermark past
    * every real window's end (the timer-close discipline), so ALL real
    * windows emit. The file sink's commit log makes the union of the
    * two runs exactly-once; the returned frame is the sink read back,
    * and the DuckDB oracle replays the plain BATCH lag() mirror — the
    * restart must be invisible in the output, which is the whole
    * claim.
    * Scale: this is the operational pattern a 100 TB streaming job
    * relies on daily (kill/redeploy without data loss or dupes);
    * checkpoint cost is per-batch state-store deltas, not corpus
    * re-reads. */
  def trendingRecovery(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-trend-recovery").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val base = events(spark, dir)
      .select(col("event_type"), expr(s"ts_us div $TenMinUs").as("win"),
        timestamp_micros(col("ts_us")).as("ts"), col("ts_us"))
    val Row2 = base.agg(min(col("win")).as("lo"), max(col("win")).as("hi")).head()
    val (loWin, hiWin) = (Row2.getLong(0), Row2.getLong(1))
    // cut mid-WINDOW: the cut window's events land on both sides of the
    // restart, so its state must survive the checkpoint round trip
    val cutUs = ((loWin + hiWin) / 2) * TenMinUs + TenMinUs / 2
    base.filter(col("ts_us") < cutUs).drop("ts_us")
      .coalesce(1).write.parquet(s"$in/p1")
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("win", LongType),
      StructField("ts", TimestampType)))
    def run(): Unit = {
      import spark.implicits._
      val stream = spark.readStream.schema(schema).parquet(s"$in/*/")
        .withWatermark("ts", "0 seconds")
        .as[(String, Long, java.sql.Timestamp)]
      val q = trendingCoreWatermark(stream)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .start()
      q.processAllAvailable(); q.stop()
    }
    run() // batch-1 offsets + state committed; query stopped cold
    // batch 2: the rest of the corpus, plus a sentinel whose event time
    // pushes the watermark past the last REAL window's end so every
    // real window timer-closes (the sentinel's own window never closes
    // and thus never emits; its count of 1 is below TrendMin anyway)
    import spark.implicits._
    val sentinelWin = hiWin + 10
    base.filter(col("ts_us") >= cutUs).drop("ts_us")
      .unionAll(Seq(("\u0000sentinel", sentinelWin,
        new java.sql.Timestamp(sentinelWin * TenMinMs + 1000)))
        .toDF("event_type", "win", "ts"))
      .coalesce(1).write.parquet(s"$in/p2")
    run() // restart: offsets/watermark/state recovered from ckpt
    spark.read.parquet(out)
      .select(col("window_ms"), col("event_type"), col("cnt"), col("prev"))
      .orderBy("window_ms", "event_type")
  }
}
