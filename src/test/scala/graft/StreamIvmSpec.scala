package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Streaming incremental view maintenance: a foreachBatch front-end
  * folding each micro-batch of deltas into the maintained aggregate
  * with GraftOps.mergeAggState (q33's core) must equal the full
  * recompute over everything ingested — including retraction batches
  * that drop fully-retracted groups. The maintained state is the view;
  * each micro-batch costs |delta|, never the base. */
class StreamIvmSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("foreachBatch mergeAggState equals full recompute, retractions included") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value"))
    val rows = ev.collect().map(r => (r.getString(0), r.getDouble(1)))
    val (b1, b2) = rows.splitAt(rows.length / 2)
    // batch 3 retracts half of batch 1 (negated measures)
    val retract = b1.take(b1.length / 2).map { case (t, v) => (t, -v, -1L) }

    def agg(d: DataFrame): DataFrame =
      d.groupBy("event_type")
        .agg(sum(col("w")).as("cnt"), sum(col("value")).as("sum_v"))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, Double, Long)]
    var state: DataFrame = Seq.empty[(String, Long, Double)]
      .toDF("event_type", "cnt", "sum_v")
    val q = stream.toDF().toDF("event_type", "value", "w")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          state = GraftOps.mergeAggState(state, agg(batch),
            keys = Seq("event_type")).localCheckpoint()
        ()
      }
      .start()
    Seq(b1.map { case (t, v) => (t, v, 1L) },
        b2.map { case (t, v) => (t, v, 1L) },
        retract).foreach { b =>
      stream.addData(b.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val got = state.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // full recompute over surviving rows (b1 second half + b2); sums
    // compared with a float tolerance — incremental and recompute add
    // the same values in different orders
    val survivors = b1.drop(b1.length / 2) ++ b2
    val want = survivors.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.size.toLong, xs.map(_._2).sum)
    }
    assert(got.keySet == want.keySet, s"groups ${got.keySet} vs ${want.keySet}")
    want.foreach { case (t, (n, s)) =>
      assert(got(t)._1 == n, s"$t count ${got(t)._1} != $n")
      assert(math.abs(got(t)._2 - s) < 1e-6, s"$t sum ${got(t)._2} != $s")
    }
    assert(got.nonEmpty)
  }
}
