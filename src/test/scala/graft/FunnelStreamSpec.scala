package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.EventAnalytics

/** Stateful streaming funnel: per-user mapGroupsWithState folding
  * events in time order must reach exactly the batch mirror's
  * (user, highest stage, time) table. State is (stage index, time of
  * that stage's completion) — a constant few bytes per user. */
class FunnelStreamSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("stateful streaming funnel equals the per-user batch mirror") {
    val stages = EventAnalytics.FunnelStages
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3) // feed in event-time order, as a watermarked buffer would

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Long)]
    val advances = stream.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long,
         rows: Iterator[(Long, String, Long)],
         state: GroupState[(Int, Long)]) =>
          var (stage, t) = state.getOption.getOrElse((0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, ts) =>
            if (stage < stages.length && typ == stages(stage) &&
                (stage == 0 || ts > t)) {
              stage += 1; t = ts
              out += ((user, stage.toLong, ts / 1000))
            }
          }
          state.update((stage, t))
          out.iterator
      }
      .toDF("user_id", "stage", "ts_ms")
    val q = advances.writeStream.outputMode("append")
      .format("memory").queryName("fnl").start()
    // three micro-batches in time order
    ev.grouped(math.max(1, ev.length / 3 + 1)).foreach { b =>
      stream.addData(b.toSeq); q.processAllAvailable()
    }
    q.stop()

    // highest advance per user = the streamed funnel state
    val streamed = spark.table("fnl")
      .groupBy("user_id")
      .agg(max(struct(col("stage"), col("ts_ms"))).as("m"))
      .select(col("user_id"), col("m.stage"), col("m.ts_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventAnalytics.q39FunnelUsers(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
