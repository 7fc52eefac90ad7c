package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.EventStreams

/** Drives the REAL Structured Streaming plans (readStream → watermarked
  * window aggs → memory sink) and asserts they converge to the batch
  * mirrors the driver verifies — the stream/batch agreement that
  * Structured Streaming's incremental execution guarantees. */
class StreamingSpec extends SparkSpec {

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: OutputMode = OutputMode.Complete()): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming OHLC candles converge to the batch mirror (struct min/max through state)") {
    runToMemory(EventStreams.ohlcStream(spark, sf), "soh")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("window_ms"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("open"), r.getAs[Long]("high"), r.getAs[Long]("low"),
          r.getAs[Long]("close"), r.getAs[Long]("volume"))
    val streamed = spark.table("soh").collect().map(key).toMap
    val batch = EventStreams.ohlcWindowBatch(spark, sf).collect().map(key).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming event count converges to the batch mirror") {
    runToMemory(EventStreams.eventCountStream(spark, sf), "sec")
    val streamed = spark.table("sec").collect()
      .map(r => r.getAs[Long]("window_ms") -> r.getAs[Long]("cnt")).toMap
    val batch = EventStreams.eventCountBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("window_ms") -> r.getAs[Long]("cnt")).toMap
    assert(streamed == batch)
  }

  test("streaming KMV distinct-user sketches converge to the batch mirror") {
    // the TypedImperativeAggregate must partial-merge through the
    // streaming state store exactly as it does in batch shuffles
    runToMemory(EventStreams.approxUsersStream(spark, sf), "sau")
    val streamed = spark.table("sau").collect()
      .map(r => r.getAs[Long]("window_ms") -> r.getAs[Double]("approx_users")).toMap
    val batch = EventStreams.approxUsersBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("window_ms") -> r.getAs[Double]("approx_users")).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming last-touch attribution converges to the batch window form") {
    // per-user state is ONE (ts, type) pair; purchases emit final
    // (non-provisional) credits at ingest — the drained stream must
    // equal q57's running-last window, row for row
    runToMemory(EventStreams.attributionStream(spark, sf), "sat", OutputMode.Append())
    val streamed = spark.table("sat").collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (r.getAs[Long]("user_id"), r.getAs[Long]("cents"), r.getAs[String]("touch_type"))).toMap
    val batch = EventStreams.attributionBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (r.getAs[Long]("user_id"), r.getAs[Long]("cents"), r.getAs[String]("touch_type"))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming Holt level/trend converges to the batch mirror bit-for-bit") {
    // the Scala fold's IEEE ops match the lateral-alias formula text's
    // exactly (same order, same printed-and-reparsed constants), so a
    // drained stream must reproduce every (level, trend, forecast1)
    runToMemory(EventStreams.holtStream(spark, sf), "sht", OutputMode.Append())
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("event_type"), r.getAs[Long]("window_ms"))
    val streamed = spark.table("sht").collect()
      .map(r => key(r) -> (r.getAs[Double]("x"), r.getAs[Double]("level"),
        r.getAs[Double]("trend"), r.getAs[Double]("forecast1"))).toMap
    val batch = EventStreams.holtBatch(spark, sf).collect()
      .map(r => key(r) -> (r.getAs[Double]("x"), r.getAs[Double]("level"),
        r.getAs[Double]("trend"), r.getAs[Double]("forecast1"))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming bottom-K quantile sketch converges to the batch mirror exactly") {
    // q55's mergeable sample through the state store: the micro-batch
    // partial merges ARE the sketch's split-merge identity, so the
    // drained stream's per-window quantiles must be bit-identical
    runToMemory(EventStreams.streamQuantileStream(spark, sf), "sqt")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("window_ms"), r.getAs[Double]("q"))
    val streamed = spark.table("sqt").collect()
      .map(r => key(r) -> r.getAs[Long]("est_cents")).toMap
    val batch = EventStreams.streamQuantileBatch(spark, sf).collect()
      .map(r => key(r) -> r.getAs[Long]("est_cents")).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming CMS counters converge to the batch counter grid exactly") {
    // the heavy-hitter sketch's streaming half: per-window sparse
    // counter cells must partial-merge through the state store to the
    // identical grid the batch mirror computes
    runToMemory(EventStreams.heavyHittersCounterStream(spark, sf), "shh")
    val streamed = spark.table("shh").collect()
      .map(r => (r.getAs[Long]("window_ms"), r.getAs[Int]("j"), r.getAs[Long]("b")) ->
        r.getAs[Long]("c")).toMap
    val batch = EventStreams.heavyHittersCountersBatch(spark, sf).collect()
      .map(r => (r.getAs[Long]("window_ms"), r.getAs[Int]("j"), r.getAs[Long]("b")) ->
        r.getAs[Long]("c")).toMap
    assert(streamed == batch && streamed.nonEmpty)
    // and per-window state really is bounded by the grid, not the users
    val maxCells = spark.table("shh").groupBy("window_ms").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxCells <= EventStreams.CmsStreamD.toLong * EventStreams.CmsStreamW)
  }

  test("streaming minhash near-dup verdicts converge to the batch mirror") {
    // band-bucket state: one long per distinct bucket; the per-doc
    // OR/count aggregate of the emitted band verdicts must equal the
    // batch mirror's n_hot_bands exactly
    runToMemory(EventStreams.minhashDedupStream(spark, sf), "smd",
      OutputMode.Append())
    val streamed = spark.table("smd").collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.count(_.getAs[Boolean]("dup_band")).toLong }
    val batch = EventStreams.minhashDedupBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hot_bands")).toMap
    assert(streamed == batch && batch.nonEmpty)
    // the detector actually fires on this corpus
    assert(batch.values.exists(_ > 0))
  }

  test("streaming stateful dedup converges to the batch replay-collapse") {
    runToMemory(EventStreams.dedupStream(spark, sf), "sdd")
    val streamed = spark.table("sdd").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("cnt")).toMap
    val batch = EventStreams.dedupBatch(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("cnt")).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming sliding windows converge to the batch two-window expansion") {
    runToMemory(EventStreams.slidingCountStream(spark, sf), "slw")
    val streamed = spark.table("slw").collect()
      .map(r => r.getAs[Long]("start_ms") -> r.getAs[Long]("cnt")).toMap
    val batch = EventStreams.slidingCountBatch(spark, sf).collect()
      .map(r => r.getAs[Long]("start_ms") -> r.getAs[Long]("cnt")).toMap
    assert(streamed == batch)
  }

  test("streaming region count converges to the batch mirror") {
    runToMemory(EventStreams.regionCountStream(spark, sf), "src")
    val streamed = spark.table("src").collect()
      .map(r => (r.getAs[Long]("window_ms"), r.getAs[String]("region")) -> r.getAs[Long]("cnt"))
      .toMap
    val batch = EventStreams.regionCountBatch(spark, sf).collect()
      .map(r => (r.getAs[Long]("window_ms"), r.getAs[String]("region")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(streamed == batch)
  }

  test("streaming session windows converge to the batch mirror") {
    runToMemory(EventStreams.sessionWindowStream(spark, sf), "ssw")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))
    val streamed = spark.table("ssw").collect().map(key).toMap
    val batch = EventStreams.sessionWindowBatch(spark, sf).collect().map(key).toMap
    assert(streamed == batch)
  }

  test("stateful trending stream (flatMapGroupsWithState) matches batch lag()") {
    // sf0.01, not the default smoke sf: the smoke events produce ZERO
    // trending alerts, which would make this assertion vacuous
    val sf01 = "/root/testdata/sf0.01"
    runToMemory(EventStreams.trendingStream(spark, sf01), "trend", OutputMode.Append())
    val alerts = spark.table("trend")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // watermark-timer close: at stream end every window whose END the
    // final watermark (max event time, 0 s delay) has passed is closed —
    // regardless of key activity; only the very last window stays open
    val batchRows = EventStreams.trendingBatch(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val wmMs = graft.sources.Tables.events(spark, sf01)
      .agg(org.apache.spark.sql.functions.expr("max(ts_us div 1000)").as("m"))
      .head().getLong(0)
    val batch = batchRows.filter { case (w, _, _, _) => w + 600000 <= wmMs }.toSet
    assert(alerts == batch)
    assert(alerts.nonEmpty)
  }

  test("stateful anomaly stream matches the batch trailing-window z-score") {
    runToMemory(EventStreams.anomalyStream(spark, sf), "anom", OutputMode.Append())
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"), r.getAs[Long]("ts_ms")) ->
        (r.getAs[Double]("value"), r.getAs[Double]("mean"), r.getAs[Double]("std"))
    val streamed = spark.table("anom").collect().map(key).toMap
    val batch = EventStreams.anomalyBatch(spark, sf).collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stateful EWMA stream converges to the batch hourly smoothing") {
    runToMemory(EventStreams.ewmaStream(spark, sf), "sewma", OutputMode.Append())
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("event_type"), r.getAs[Long]("window_ms")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("x"), r.getAs[Double]("ewma"))
    val streamed = spark.table("sewma").collect().map(key).toMap
    val batch = EventStreams.ewmaBatch(spark, sf).collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-static enrichment join converges to the batch mirror") {
    runToMemory(EventStreams.enrichStream(spark, sf), "senr")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Number]("nation").longValue(), r.getAs[Long]("window_ms")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents"))
    val streamed = spark.table("senr").collect().map(key).toMap
    val batch = EventStreams.enrichBatch(spark, sf).collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("latest-wins CDC state converges to the batch materialized view") {
    runToMemory(EventStreams.cdcStream(spark, sf), "scdc", OutputMode.Append())
    val streamed = spark.table("scdc").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cents")))
      .groupBy(_._1).view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val batch = EventStreams.cdcBatch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("multi-batch CDC changelog: one row per state transition, final rows = batch mirror") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import SparkSpec.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(_._3) // time-ordered chunks — the CDC ingest shape
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val stream = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventStreams.cdcCore(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("mbcdc").start()
    chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    val afterDrain = spark.table("mbcdc").count()
    // redeliver the last chunk: every touched key folds the same events
    // again, no winner changes — the changelog must append ZERO rows
    stream.addData(chunks.last.toSeq)
    q.processAllAvailable()
    val afterRedeliver = spark.table("mbcdc").count()
    q.stop()
    assert(afterRedeliver == afterDrain,
      s"no-change redelivery appended ${afterRedeliver - afterDrain} rows")
    // changelog equality: the sink must hold EXACTLY the per-chunk
    // prefix winners with consecutive duplicates collapsed (the state
    // transitions) — computed independently from the chunked data.
    // The final transition per user is the global winner, so equality
    // here implies the batch-mirror state too.
    def winner(evs: Iterable[(Long, Long, Long, String, Double)]) =
      evs.maxBy(e => (e._3, e._1)) // (ts, event_id) total order
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (user, evs) =>
      val prefixes = chunks.indices.map(k =>
        evs.filter(e => chunks.take(k + 1).exists(_.contains(e))))
      prefixes.filter(_.nonEmpty).map(pfx => winner(pfx))
        .map(w => (user, w._4, math.floor(w._5 * 100 + 0.5).toLong))
        .distinct // consecutive prefix winners are monotone, so distinct = collapse
    }.sorted
    val emitted = spark.table("mbcdc").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("cents"))).toSeq.sorted
    assert(emitted == expected,
      s"changelog ${emitted.size} rows != expected ${expected.size} transitions")
    // final transition per user reconstructs the batch materialized view
    val streamed = rows.groupBy(_._2).view.mapValues(g => winner(g.toSeq)).values
      .map(w => (w._4, math.floor(w._5 * 100 + 0.5).toLong)).toSeq
      .groupBy(_._1).view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val batch = EventStreams.cdcBatch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("watermark-close EWMA: multi-batch drain equals the closed-window batch mirror, no dedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import SparkSpec.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._3)
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val stream = MemoryStream[(Long, String, Long, Double)]
    val q = EventStreams.ewmaCoreWm(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("mbewma").start()
    chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    q.processAllAvailable()
    q.stop()
    // RAW multiset equality — no dedup, no last-wins: every closed
    // window was emitted exactly once across the three micro-batches
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("event_type"), r.getAs[Long]("window_ms"),
        r.getAs[Long]("n"), r.getAs[Double]("x"), r.getAs[Double]("ewma"))
    val streamed = spark.table("mbewma").collect().map(key).toSeq.sorted
    val batch = EventStreams.ewmaClosedBatch(spark, sf).collect().map(key).toSeq.sorted
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("watermark-close EWMA single-batch drain also equals the closed-window mirror") {
    runToMemory(EventStreams.ewmaStreamWm(spark, sf), "sewmawm", OutputMode.Append())
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("event_type"), r.getAs[Long]("window_ms"),
        r.getAs[Long]("n"), r.getAs[Double]("x"), r.getAs[Double]("ewma"))
    val streamed = spark.table("sewmawm").collect().map(key).toSeq.sorted
    val batch = EventStreams.ewmaClosedBatch(spark, sf).collect().map(key).toSeq.sorted
    assert(streamed == batch)
  }

  test("streaming weighted reservoir: single-batch drain equals the A-ES batch mirror") {
    runToMemory(EventStreams.weightedReservoirStream(spark, sf), "swr", OutputMode.Append())
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("source"), r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("es_key"), r.getAs[Double]("threshold_key"))
    val streamed = spark.table("swr").collect().map(key).toSeq.sorted
    val batch = EventStreams.weightedReservoirBatch(spark, sf).collect().map(key).toSeq.sorted
    assert(streamed == batch, s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("multi-batch weighted reservoir: changelog transitions, zero-append redelivery, final = batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import SparkSpec.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.sources.Tables.documents(spark, sf)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val chunks = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
    val stream = MemoryStream[(Long, String, Long)]
    val q = EventStreams.weightedReservoirCore(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("mbwr").start()
    chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    val afterDrain = spark.table("mbwr").count()
    // at-least-once redelivery: every doc already sits in or below the
    // reservoir — membership cannot change, so nothing may be emitted
    stream.addData(chunks.last.toSeq)
    q.processAllAvailable()
    val afterRedeliver = spark.table("mbwr").count()
    q.stop()
    assert(afterRedeliver == afterDrain,
      s"redelivery appended ${afterRedeliver - afterDrain} rows")
    // final reservoir per source (max rnk block per source = the last
    // emission) must equal the batch mirror; emissions overall must be
    // exactly the per-chunk prefix reservoirs with consecutive
    // duplicates collapsed
    val k = graft.operators.Curation.WeightedK
    def reservoir(docs: Seq[(Long, String, Long)], src: String): Seq[(Long, Long)] = {
      val keyed = docs.filter(_._2 == src).map { case (d, _, nc) =>
        (BigDecimal(math.log((EventStreams.hash32(d.toString).toDouble + 0.5) /
            4294967296.0) / nc)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble, d)
      }
      keyed.sortBy { case (key, id) => (-key, id) }.take(k)
        .zipWithIndex.map { case ((_, d), i) => ((i + 1).toLong, d) }
    }
    val sources = rows.map(_._2).distinct.toSeq
    val expected = sources.flatMap { src =>
      val prefixes = chunks.indices.map(i => chunks.take(i + 1).flatten.toSeq)
      prefixes.map(p => reservoir(p, src)).distinct // consecutive collapse
        .flatMap(_.map { case (rnk, d) => (src, rnk, d) })
    }.sorted
    val emitted = spark.table("mbwr").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rnk"), r.getAs[Long]("doc_id")))
      .toSeq.sorted
    assert(emitted == expected,
      s"changelog ${emitted.size} rows != expected ${expected.size}")
    val batch = EventStreams.weightedReservoirBatch(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rnk"), r.getAs[Long]("doc_id")))
      .toSet
    val finalPerSource = sources.flatMap(src =>
      reservoir(rows.toSeq, src).map { case (rnk, d) => (src, rnk, d) }).toSet
    assert(finalPerSource == batch, "prefix-complete reservoir != batch mirror")
  }

  test("stream-stream interval join emits exactly the batch pair set") {
    runToMemory(EventStreams.intervalJoinStream(spark, sf), "ssj", OutputMode.Append())
    val streamed = spark.table("ssj").collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[Long]("cid"))).toSet
    val ev = graft.sources.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts_us").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts_us").as("cts"))
    val batch = p.join(c,
        col("pu") === col("cu") &&
          col("cts") >= col("pts") - EventStreams.JoinWindowUs && col("cts") <= col("pts"))
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("rate source sustains a watermarked windowed aggregation (load smoke)") {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", 1000).load()
      .withWatermark("timestamp", "10 seconds")
      .groupBy(window(col("timestamp"), "1 second"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_v"))
    val q = stream.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("ratewin").start()
    try {
      // assert sustained PROGRESS (several batches, rows flowing), not a
      // fixed-throughput deadline — a wall-clock rows/sec target flakes
      // on saturated CI machines
      val deadline = System.currentTimeMillis() + 30000
      var rows = 0L
      var batches = 0
      while ((rows < 1000 || batches < 2) && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        rows = q.recentProgress.map(_.numInputRows).sum
        batches = q.recentProgress.length
      }
      assert(rows >= 1000 && batches >= 2,
        s"only $rows rows / $batches batches ingested — rate source stalled")
    } finally q.stop()
  }

  test("file sink + checkpoint recovery: restart resumes offsets exactly-once") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val schema = StructType(Seq(StructField("id", LongType)))
    def write(ids: Range, name: String): Unit =
      ids.map(_.toLong).toDF("id").coalesce(1).write.parquet(s"$in/$name")
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$in/*")
        .select(col("id"), (col("id") * 2).as("doubled"))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode(OutputMode.Append()).start()
      q.processAllAvailable(); q.stop()
    }
    write(0 until 100, "f1"); run()   // batch 1 committed, query stopped
    write(100 until 250, "f2"); run() // restart from checkpoint picks up only f2
    val rows = spark.read.parquet(out).collect()
    assert(rows.length === 250)                         // no f1 reprocessing
    assert(rows.map(_.getLong(0)).toSet === (0L until 250L).toSet)
    assert(rows.forall(r => r.getLong(1) === 2 * r.getLong(0)))
  }

  test("trending state survives a window split across micro-batches") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.types._
    // two files = two micro-batches (maxFilesPerTrigger=1); the split
    // point cuts a window in half, so its count must accumulate in state
    val dir = java.nio.file.Files.createTempDirectory("graft-mb").toString
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr(s"ts_us div ${EventStreams.TenMinUs}").as("win"))
      .orderBy("win").collect().map(r => (r.getString(0), r.getLong(1)))
    val mid = ev.length / 2
    Seq(ev.take(mid) -> "p1", ev.drop(mid) -> "p2").foreach { case (rows, name) =>
      rows.toSeq.toDF("event_type", "win").coalesce(1)
        .write.parquet(s"$dir/$name")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("win", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*/")
      .as[(String, Long)]
    val q = EventStreams.trendingCore(stream)
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("mb").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("mb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // expected: batch alert computation over all rows, minus final windows
    val byKey = ev.groupBy(_._1)
    val expected = byKey.flatMap { case (k, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val maxWin = counts.map(_._1).max
      var (lw, lc) = (Long.MinValue, 0L)
      counts.flatMap { case (w, c) =>
        val prev = if (w == lw + 1) lc else 0L
        lw = w; lc = c
        if (w < maxWin && c >= EventStreams.TrendMin && c >= 2 * prev)
          Some((w * 600000, k, c, prev))
        else None
      }
    }.toSet
    assert(streamed == expected)
  }

  test("streaming per-window top-k emits closed windows and converges to batch") {
    runToMemory(EventStreams.topkStream(spark, sf), "stk", OutputMode.Append())
    val streamed = spark.table("stk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    // the stream can only emit windows whose END the final watermark
    // passed (the last window stays open — its timer never fires after
    // the final batch); batch restricted to those must match exactly
    val wmMs = graft.sources.Tables.events(spark, sf)
      .agg(org.apache.spark.sql.functions.expr("max(ts_us div 1000)").as("m"))
      .head().getLong(0)
    val batch = EventStreams.topkBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .filter { case (w, _, _, _) => w + 3600000 <= wmMs }.toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("watermark timer closes a key's FINAL window once the watermark passes it") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.types._
    // batch 1: key "a" gets 4 events in window 100 and never appears
    // again — under event-time completion that window would stay open
    // forever. batch 2: a lone far-future sentinel on another key pushes
    // the WATERMARK past window 100's end, so the timer must close and
    // emit it.
    val dir = java.nio.file.Files.createTempDirectory("graft-wm").toString
    def ts(win: Long): java.sql.Timestamp = new java.sql.Timestamp(win * 600000 + 1000)
    val b1 = Seq.fill(4)(("a", 100L, ts(100)))
    val b2 = Seq(("zz", 200L, ts(200)))
    Seq(b1 -> "p1", b2 -> "p2").foreach { case (rows, name) =>
      rows.toDF("event_type", "win", "ts").coalesce(1).write.parquet(s"$dir/$name")
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("win", LongType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*/")
      .withWatermark("ts", "0 seconds")
      .as[(String, Long, java.sql.Timestamp)]
    val q = EventStreams.trendingCoreWatermark(stream)
      .writeStream.outputMode(OutputMode.Append()).format("memory").queryName("wmclose").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("wmclose")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == Set((100L * 600000, "a", 4L, 0L)),
      s"final window did not close on the watermark timer: $streamed")
  }

  test("checkpointed cold restart: trending recovery output equals the batch mirror") {
    // the registered stream_trending_recovery entry end-to-end at smoke
    // scale: run 1 drains half the corpus and stops cold; run 2
    // restarts from the checkpoint (offsets + watermark + state) — the
    // union of sink output must make the restart invisible
    // sf0.01, not the sf0.001 smoke dir: the trend minimum needs the
    // denser corpus to fire at all (stream_trending's documented
    // sparse-corpus emptiness), and an empty-vs-empty pass would prove
    // nothing about state recovery
    val denseSf = "/root/testdata/sf0.01"
    def tup(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got = tup(EventStreams.trendingRecovery(spark, denseSf))
    val want = tup(EventStreams.trendingBatch(spark, denseSf))
    assert(got == want, s"restart visible in output: ${got.diff(want)} / ${want.diff(got)}")
    assert(got.nonEmpty)
  }
}
