package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Streaming k-means: a foreachBatch front-end applying
  * GraftOps.miniBatchStep per micro-batch must produce EXACTLY the
  * centroids of the registered batch mirror (kmeansMiniBatch) when fed
  * the same hash batches in the same order — the stream/batch agreement
  * the mini-batch design guarantees (each micro-batch = one step). */
class StreamKMeansSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val K = 4
  private val Batches = 3

  test("foreachBatch mini-batch steps equal the batch-mirror centroids") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    // batch mirror (the registered operator's core)
    val expected = GraftOps.kmeansMiniBatch(emb, "vec_id", "embedding", K, Batches)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // streaming front-end: same seeds, then one miniBatchStep per
    // micro-batch; hash-batch membership matches kmeansMiniBatch's rule
    graft.functions.VectorExpressions.register(spark)
    val e = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    var cents: DataFrame = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(K)
      .select(col("vec_id").as("cid"), col("v").as("cv"), lit(0L).as("cnt"))
      .localCheckpoint()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float])]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          cents = GraftOps.miniBatchStep(cents, batch, "vec_id", "embedding")
            .localCheckpoint()
        ()
      }
      .start()
    val bOf = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % Batches).toInt
    }
    (0 until Batches).foreach { b =>
      stream.addData(rows.filter(r => bOf(r._1) == b).toSeq)
      q.processAllAvailable() // one micro-batch per hash batch, in order
    }
    q.stop()

    val streamed = cents
      .select(col("cid"), col("cnt").as("n_seen"),
        round(element_at(col("cv"), 1), 6).as("c0"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == expected,
      s"streamed $streamed\nexpected $expected")
    // every row was absorbed exactly once across the batches
    assert(streamed.toSeq.map(_._2).sum == rows.length)
  }
}
