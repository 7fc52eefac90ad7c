package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** q55's two load-bearing claims: the bottom-K signature sample is
  * MERGEABLE (any split of the data, sketched separately and merged,
  * yields the identical sample — the property that makes the sketch
  * partition/arrival-order independent at 1000 executors) and its
  * quantile estimates respect the DKW rank-error bound. */
class QuantileSketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def signed = {
    graft.functions.VectorExpressions.register(spark)
    graft.sources.Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
      conv(substring(md5(concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"))), 1, 13), 16, 10)
        .cast("long").as("sig"))
  }

  private def sampleOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.groupBy("l_returnflag")
      .agg(expr(s"top_k_pairs(-CAST(sig AS DOUBLE), cents, ${QuantileSketch.SketchK})").as("sk"))
      .select(col("l_returnflag"), expr("array_sort(transform(sk, e -> e.payload))").as("vals"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

  test("merge associativity: sketch(A ∪ B) == merge(sketch(A), sketch(B)) for any split") {
    val x = signed.localCheckpoint()
    val whole = sampleOf(x)
    // arbitrary 2-way split on a column uncorrelated with the signature
    for (splitMod <- Seq(2L, 7L)) {
      val halves = x.withColumn("half", pmod(col("cents"), lit(splitMod)) === 0)
      // two-level aggregation: per-(flag, half) sketches, re-exploded and
      // re-aggregated — exactly the partial/final merge tree a cluster runs
      val merged = halves.groupBy("l_returnflag", "half")
        .agg(expr(s"top_k_pairs(-CAST(sig AS DOUBLE), cents, ${QuantileSketch.SketchK})").as("sk"))
        .select(col("l_returnflag"), explode(col("sk")).as("e"))
        .select(col("l_returnflag"), col("e.payload").as("cents"),
          (-col("e.ord")).cast("long").as("sig"))
      assert(sampleOf(merged) == whole,
        s"split-mod-$splitMod merge produced a different sample")
    }
  }

  test("estimates respect the DKW rank-error bound (and beat it comfortably here)") {
    val x = signed.localCheckpoint()
    val exactRanks = x.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = QuantileSketch.quantileSketch(spark, dir).collect()
    assert(est.length == exactRanks.size * QuantileSketch.Quantiles.size)
    // DKW at K=256, δ=0.001: ε = sqrt(ln(2/δ) / 2K) ≈ 0.122
    val eps = math.sqrt(math.log(2 / 0.001) / (2.0 * QuantileSketch.SketchK))
    var worst = 0.0
    est.foreach { r =>
      val flag = r.getString(0); val q = r.getDouble(1); val v = r.getLong(2)
      val n = exactRanks(flag)
      val below = x.filter(col("l_returnflag") === flag && col("cents") <= v).count()
      val err = math.abs(below.toDouble / n - q)
      worst = math.max(worst, err)
      assert(err <= eps, f"flag=$flag q=$q rank error $err%.4f exceeds DKW ε=$eps%.4f")
    }
    info(f"worst rank error ${worst}%.4f vs DKW ε $eps%.4f (K=${QuantileSketch.SketchK})")
  }
}
