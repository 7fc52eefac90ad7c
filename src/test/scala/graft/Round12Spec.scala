package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-12 persisted-base-layout assertions: the incremental Louvain
  * and PageRank entries READ their cold base run from a bucketed
  * managed table written once per (session, dir) — the
  * dedup_minhash_incremental discipline — instead of recomputing it
  * inside every timed call. */
class Round12Spec extends SparkSpec {

  test("persisted louvain base: memo identity + value identity vs direct cold run") {
    // memo identity: two calls resolve to the SAME persisted relation
    // (same table, no second write — the files underneath are identical)
    val a = Graph.persistedLouvainBase(spark, sf)
    val filesOf = (df: org.apache.spark.sql.DataFrame) =>
      df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    val b = Graph.persistedLouvainBase(spark, sf)
    assert(filesOf(a) == filesOf(b), "second call re-resolved a different layout")
    // value identity: the stored labels are bit-identical to a direct
    // cold run on the same base graph (longs — parquet roundtrip exact)
    val base = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 < Graph.IncCut)
      .select(col("l_suppkey").as("s"),
        (col("l_partkey") + Graph.PartOffset).as("p"))
      .distinct()
    val direct = graft.api.GraftOps.louvain(base, "s", "p",
      Graph.LouvainL1Rounds, Graph.LouvainL2Rounds)
      .collect().map(_.toString).sorted.toSeq
    val stored = a.collect().map(_.toString).sorted.toSeq
    assert(stored == direct, "persisted base labels differ from a direct cold run")
  }

  test("persisted pagerank base: value identity vs direct cold converge") {
    val stored = Graph.persistedPagerankBase(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val basePairs = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 10 < Graph.IncCut)
      .select(col("l_suppkey").as("src"),
        (col("l_partkey") + Graph.PartOffset).as("dst"))
      .distinct()
    val direct = graft.api.GraftOps.personalizedPageRank(basePairs, "src", "dst",
      Graph.Sources, Graph.Alpha, Graph.Iters)
      .collect().map(_.toString).sorted.toSeq
    assert(stored == direct, "persisted base ranks differ from a direct cold run")
  }

  test("q60 deterministic HLL: estimates within the m=4096 error band of exact") {
    val est = graft.operators.Relational.q60HllDeterministic(spark, sf)
      .collect().map(r => r.getAs[String]("returnflag") ->
        (r.getAs[Double]("hll_orders"), r.getAs[Double]("hll_parts"))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("rf"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getAs[String]("rf") ->
        (r.getAs[Long]("o"), r.getAs[Long]("p"))).toMap
    // standard error 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma + small-n slack
    exact.foreach { case (rf, (o, p)) =>
      val (eo, ep) = est(rf)
      assert(math.abs(eo - o) / o.toDouble < 0.07,
        s"$rf hll_orders $eo vs exact $o out of band")
      assert(math.abs(ep - p) / p.toDouble < 0.07,
        s"$rf hll_parts $ep vs exact $p out of band")
    }
  }

  test("cur_sample_weighted: A-ES take is deterministic, per-source exact-k, and length-biased") {
    val out = graft.operators.Curation.sampleWeighted(spark, sf)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exact k per source (every corpus source has >= k docs)
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.length == graft.operators.Curation.WeightedK, s"$src took ${g.length}")
      assert(g.map(_._2).sorted.toSeq == (1L to graft.operators.Curation.WeightedK), s"$src ranks")
    }
    // determinism: a second evaluation is bit-identical (no RNG anywhere)
    val again = graft.operators.Curation.sampleWeighted(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
    // the WEIGHTED property: P(doc) rises with n_chars, so the sampled
    // mean length must clearly exceed the corpus mean (u^(1/w) keys)
    val sampledMean = rows.map(_._4).sum.toDouble / rows.length
    val corpusMean = graft.sources.Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    info(f"sampled mean n_chars $sampledMean%.0f vs corpus mean $corpusMean%.0f")
    assert(sampledMean > corpusMean,
      s"weighted sample not length-biased: $sampledMean <= $corpusMean")
  }

  test("WavDecoder is a real parser: round-trips synthesis, rejects malformed bytes") {
    import graft.operators.Multimodal.{WavPayload, WavDecoder}
    val good = WavPayload.build("the quick brown fox".getBytes("US-ASCII"))
    val (rate, ns, off) = WavDecoder.decode(good)
    assert(rate == WavPayload.SampleRate && off == 44)
    assert(ns == WavPayload.nSamples(19))
    assert(good.length == 44 + ns + ns % 2) // RIFF pad on odd data chunks
    // sample stream honesty: byte k of the data chunk is text[(2k+1) % n]
    val txt = "the quick brown fox".getBytes("US-ASCII")
    (0 until ns).foreach { k =>
      assert(good(off + k) == txt((2 * k + 1) % txt.length), s"sample $k")
    }
    // corruption in any structural field must throw, not return garbage
    def corrupt(at: Int, to: Byte): Unit = {
      val bad = good.clone(); bad(at) = to
      intercept[IllegalArgumentException](WavDecoder.decode(bad))
    }
    corrupt(0, 'X')        // RIFF magic
    corrupt(4, 99)         // riff size
    corrupt(8, 'X')        // WAVE tag
    corrupt(20, 2)         // audio format != PCM
    corrupt(22, 2)         // stereo
    corrupt(34, 16)        // 16-bit
    intercept[IllegalArgumentException](WavDecoder.decode(good.take(30))) // truncation
  }

  test("q58 linear attribution conserves credit exactly at any fan-out (synthetic n=17)") {
    // 17 touches before one purchase: 720720 = 2^4*3^2*5*7*11*13 is NOT
    // divisible by 17 — the pre-r12 truncating split lost credit here
    val scale = graft.operators.EventAnalytics.AttrCreditScale
    val n = 17L
    val base = scale / n
    val rem = (scale % n).toInt
    // first `rem` touches get one extra micro-unit; units must sum to scale
    val units = (1 to n.toInt).map(i => base + (if (i <= rem) 1L else 0L))
    assert(units.sum == scale, s"unit split ${units.sum} != $scale")
  }
}
