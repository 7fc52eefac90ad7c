package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        graft.operators.Graph.reset(); graft.operators.SuffixArray.reset()
        graft.operators.Classify.reset(); graft.sources.IoRoundtrip.reset()
        graft.operators.Similarity.reset(); graft.operators.Bpe.reset()
        graft.operators.CurationQuality.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).collect()
        println(s"XX $name pass$i ${(System.nanoTime()-t0)/1e9}")
      }
    }
    spark.stop()
  }
}
