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
    // -1 marks a FAILED query — never report time-to-exception as a
    // (fast-looking) legitimate timing
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}"); -1.0 }
    }
    // declaration order (not alphabetical) so memo-producing ops run
    // before their consumers and each timing reflects its real compute
    // (alphabetical put spam_apply before spam_train, crediting training
    // to the wrong query)
    // optional args: query-name filter (local iteration aid; the driver
    // passes none and benches the full inventory)
    val names = SparkEntry.all.map(q => q.name -> q.fn)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    def pass(): Map[String, Double] = {
      operators.Graph.reset(); operators.Classify.reset()
      // also drop CacheManager state: cache()d fragments are keyed by
      // canonicalized plan, so pass 2's identical plans would silently
      // reuse pass 1's materialized data and under-report their cost
      spark.catalog.clearCache()
      names.map { case (name, fn) => name -> time(fn) }.toMap
    }
    val (p1, p2) = (pass(), pass())
    def best(a: Double, b: Double): Double = if (a < 0 || b < 0) -1.0 else math.min(a, b)
    val results = names.map { case (name, _) => name -> best(p1(name), p2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // console capture can truncate long lines mid-JSON; the file copy is
    // the durable artifact
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
