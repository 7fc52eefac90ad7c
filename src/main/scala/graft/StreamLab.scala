package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off throughput lab for the stream-stream interval join (r12
  * verdict item 6): measures the Bench streamSection's interval-join
  * harness under state-store / partitioning variants so the chosen
  * production config is a recorded measurement, not a guess. */
object StreamLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def joinRate(label: String, parts: Int, rocks: Boolean): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      if (rocks)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      val a = spark.readStream.format("rate")
        .option("rowsPerSecond", 100000).option("numPartitions", 4).load()
        .withWatermark("timestamp", "2 seconds")
        .select(col("value").as("ka"), col("timestamp").as("ta"))
      val b = spark.readStream.format("rate")
        .option("rowsPerSecond", 100000).option("numPartitions", 4).load()
        .withWatermark("timestamp", "2 seconds")
        .select(col("value").as("kb"), col("timestamp").as("tb"))
      val j = a.join(b, expr(
        "ka = kb AND tb BETWEEN ta - INTERVAL 1 SECOND AND ta + INTERVAL 1 SECOND"))
      val q = j.writeStream.outputMode("append").format("noop").start()
      try {
        val start = System.currentTimeMillis()
        val deadline = start + 25000
        def sustained = q.recentProgress.length >= 2 &&
          System.currentTimeMillis() - start >= 10000
        while (!sustained && System.currentTimeMillis() < deadline)
          Thread.sleep(500)
        val progress = q.recentProgress
        val rows = progress.map(_.numInputRows).sum
        val secs = progress.map(_.batchDuration).sum / 1000.0
        println(f"LAB $label parts=$parts rocks=$rocks rate=${rows / secs}%.0f rows/s batches=${progress.length}")
      } finally q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    // r12 recorded sweep (n=2): p32 109-130k, p32+rocksdb 122k,
    // p16 154-157k, p8 166-183k (winner, adopted in Bench),
    // p8+rocksdb 127k, p4 157-165k rows/s
    for (_ <- 1 to 2) {
      joinRate("p32", 32, rocks = false)
      joinRate("p16", 16, rocks = false)
      joinRate("p8", 8, rocks = false)
      joinRate("p4", 4, rocks = false)
      joinRate("p32-rocksdb", 32, rocks = true)
      joinRate("p8-rocksdb", 8, rocks = true)
    }
    spark.stop()
  }
}
