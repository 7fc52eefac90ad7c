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

  test("q64 weighted percentile: matches a driver-side lower-weighted-percentile replay") {
    val out = graft.operators.Relational2.q64WeightedPercentile(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (g, rows) =>
      val tw = rows.map(_._3).sum
      val sorted = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      def lowerPct(num: Long, den: Long): Long = { // min v with cum*den >= num*tw
        var cum = 0L
        sorted.find { case (_, w) => cum += w; cum * den >= num * tw }.get._1
      }
      val (gotTw, gotMed, gotP90) = out(g)
      assert(gotTw == tw, s"$g total weight")
      assert(gotMed == lowerPct(1, 2), s"$g weighted median")
      assert(gotP90 == lowerPct(9, 10), s"$g weighted p90")
    }
  }

  test("ml_lift_curve: tie-respecting deciles — monotone gains, exact totals at decile 10") {
    val rows = graft.operators.Classify.mlLiftCurve(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L), "all ten deciles present")
    // n_taken and pos_taken nondecreasing; gain nondecreasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4,
        s"monotonicity broken between deciles ${a._1} and ${b._1}")
    }
    // decile 10 takes the whole corpus: gain 1.0, lift 1.0
    val last = rows.last
    assert(last._4 == 1.0 && last._5 == 1.0, s"decile 10 gain/lift $last")
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(last._2 == n, s"decile 10 n_taken ${last._2} != corpus $n")
    // internal identity: lift ≡ gain normalized by the taken fraction,
    // recomputed from each row's own exact counts (P from decile 10)
    val pTot = last._3
    rows.foreach { case (k, nt, pt, _, lift) =>
      val want = BigDecimal(pt.toDouble * n / (nt.toDouble * pTot))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lift - want) < 1e-9, s"decile $k lift $lift != $want")
    }
  }

  test("sim_mips: inner-product ranking is a genuinely different statistic than cosine") {
    val mips = graft.operators.Similarity.simMips(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cos = graft.operators.Similarity.cosineTopk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mips.keySet == cos.keySet, "same (query, rank) grid")
    // unnormalized norms must reorder at least one neighbor list
    assert(mips != cos, "MIPS ranking identical to cosine — norms carry no signal?")
    // self is excluded everywhere
    mips.foreach { case ((q, _), n) => assert(n != q, s"query $q returned itself") }
  }

  test("ml_mcc: shares kappa's exact 2x2 table and replays the phi formula bit-exactly") {
    val m = graft.operators.Classify.mlMcc(spark, sf).collect().head
    val kp = graft.operators.Classify.mlKappa(spark, sf).collect().head
    val (n, a, b, c, d) =
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
    // same agreement table as ml_kappa (same inputs, same join)
    assert((n, a, b, c, d) ==
      (kp.getLong(0), kp.getLong(1), kp.getLong(2), kp.getLong(3), kp.getLong(4)),
      "mcc and kappa disagree on the 2x2 table")
    assert(a + b + c + d == n, "cells do not partition the corpus")
    // driver-side replay of the phi formula, exact determinant first
    val det = a * d - b * c
    val want =
      if (a + b == 0 || a + c == 0 || c + d == 0 || b + d == 0) 0.0
      else BigDecimal(det.toDouble /
          (math.sqrt((a + b).toDouble) * math.sqrt((a + c).toDouble)
            * math.sqrt((c + d).toDouble) * math.sqrt((b + d).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getDouble(5) == want, s"mcc ${m.getDouble(5)} != replay $want")
    // phi is bounded and sign-consistent with the determinant
    assert(math.abs(m.getDouble(5)) <= 1.0, "mcc out of [-1,1]")
    if (det != 0 && math.abs(m.getDouble(5)) > 1e-9)
      assert(math.signum(m.getDouble(5)) == math.signum(det.toDouble),
        "mcc sign disagrees with the determinant")
  }

  test("ml_ks_stat: bounded, and dominates the gap at every PR-curve threshold") {
    val ks = graft.operators.Classify.mlKsStat(spark, sf).collect().head
    val (nPos, nNeg, atP, ksVal) =
      (ks.getLong(0), ks.getLong(1), ks.getDouble(2), ks.getDouble(3))
    assert(ksVal >= 0.0 && ksVal <= 1.0, s"ks $ksVal out of [0,1]")
    assert(atP >= 0.0 && atP <= 1.0, s"at_p $atP out of [0,1]")
    // KS is the max CDF gap over ALL thresholds, so it must dominate
    // the gap |TPR - FPR| at each of ml_pr_curve's nine thresholds
    val pr = graft.operators.Classify.mlPrCurve(spark, sf).collect()
    pr.foreach { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp + fn == nPos, "pr-curve positives disagree with ks n_pos")
      val gap = math.abs(tp.toDouble / nPos - fp.toDouble / nNeg)
      assert(ksVal >= gap - 1e-6,
        s"ks $ksVal below threshold-${r.getLong(0)} gap $gap")
    }
  }

  test("ml_chi2_select: exact replay of the presence contingency, ranking and all") {
    val out = graft.operators.Classify.mlChi2Select(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0) % 3 == 0, r.getString(1).split(" ").filter(_.nonEmpty).distinct))
    val s = docs.count(_._1).toLong
    val h = docs.size - s
    val df = scala.collection.mutable.Map[String, (Long, Long)]()
    docs.foreach { case (spam, toks) =>
      toks.foreach { t =>
        val (a, b) = df.getOrElse(t, (0L, 0L))
        df(t) = if (spam) (a + 1, b) else (a, b + 1)
      }
    }
    val expect = df.toSeq
      .filter { case (_, (a, b)) => a + b >= graft.operators.Classify.Chi2MinDf }
      .map { case (t, (a, b)) =>
        val det = a * (h - b) - b * (s - a)
        val chi2 = if (s + h - a - b == 0) 0.0
          else BigDecimal((s + h).toDouble * det * det /
            ((a + b).toDouble * (s + h - a - b) * s * h))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, a, b, chi2)
      }
      .sortBy { case (t, _, _, c) => (-c, t) }
      .take(graft.operators.Classify.Chi2SelectK)
      .zipWithIndex.map { case ((t, a, b, c), i) => (i + 1L, t, a, b, c) }
    assert(out.toSeq == expect, s"top-k table differs:\n${out.toSeq}\nvs\n$expect")
  }

  test("ml_ridge: r2 sits below OLS (shrunk fit), coefficients shrink toward zero") {
    val ols = graft.operators.MlTrees.mlLinearReg2(spark, sf).collect().head
    val rid = graft.operators.MlTrees.mlRidge(spark, sf).collect().head
    assert(rid.getDouble(4) <= ols.getDouble(4) + 1e-12,
      s"ridge r2 ${rid.getDouble(4)} above OLS ${ols.getDouble(4)}")
    // on this corpus the slope coefficient visibly shrinks but stays close
    assert(math.abs(rid.getDouble(2)) <= math.abs(ols.getDouble(2)) + 1e-12,
      "ridge |b1| above OLS |b1|")
    assert(math.abs(rid.getDouble(2) - ols.getDouble(2)) < 0.05,
      "ridge b1 implausibly far from OLS")
  }

  test("q66_mom_growth: growth replays from the emitted exact cents") {
    val rows = graft.operators.Relational2.q66MomGrowth(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    rows.groupBy(_._1).foreach { case (region, rs) =>
      val ordered = rs.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, _, cents, growth), i) =>
        if (i == 0) assert(growth.isEmpty, s"$region first month not NULL")
        else {
          val prev = ordered(i - 1)._3
          val want = BigDecimal((cents - prev).toDouble / prev.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(growth.contains(want),
            s"$region ym ${ordered(i)._2}: $growth != $want")
        }
      }
    }
  }

  test("io_compaction_plan: exact replay of the order-preserving bin-packing rule") {
    val out = graft.operators.ScaleOps.ioCompactionPlan(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val files = graft.sources.Tables.events(spark, sf)
      .withColumn("day", expr("ts_us div 86400000000"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = files.groupBy(_._1).flatMap { case (tpe, fs) =>
      var before = 0L
      fs.sortBy(_._2).map { case (_, day, n) =>
        val bin = before / graft.operators.ScaleOps.CompactTargetRows
        before += n
        (tpe, bin, day, n)
      }.groupBy { case (_, bin, _, _) => bin }
        .map { case (bin, g) =>
          (tpe, bin) -> (g.size.toLong, g.map(_._4).sum,
            g.map(_._3).min, g.map(_._3).max)
        }
    }
    assert(out == expect, "compaction plan differs from the driver replay")
  }

  test("ml_ttest: replays from exact driver-side moments; df inside the Welch bounds") {
    val r = graft.operators.MlTrees.mlTtest(spark, sf).collect().head
    val ys = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    def mom(g: String) = {
      val v = ys.filter(_._1 == g).map(_._2)
      (v.length.toLong, v.map(BigInt(_)).sum, v.map(x => BigInt(x) * x).sum)
    }
    val (n1, s1, ss1) = mom("A"); val (n2, s2, ss2) = mom("N")
    assert(r.getLong(0) == n1 && r.getLong(1) == n2, "group sizes")
    def d(b: BigInt) = b.toDouble
    val (m1, m2) = (d(s1) / n1, d(s2) / n2)
    val v1 = (d(ss1) - d(s1) * d(s1) / n1) / (n1 - 1)
    val v2 = (d(ss2) - d(s2) * d(s2) / n2) / (n2 - 1)
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(math.abs(r.getDouble(4) - t) < 1e-3, s"t ${r.getDouble(4)} vs replay $t")
    val df = r.getDouble(5)
    assert(df >= math.min(n1, n2) - 1 && df <= (n1 + n2 - 2).toDouble,
      s"Welch df $df outside [min(n)-1, n1+n2-2]")
  }

  test("ml_corr_matrix: six pairs, all in [-1,1], qty-price pair replays from raw moments") {
    val rows = graft.operators.MlTrees.mlCorrMatrix(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 6, "six distinct pairs")
    rows.values.foreach(c => assert(math.abs(c) <= 1.0, s"corr $c out of [-1,1]"))
    val b = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = b.length.toLong
    val (sq, sy) = (b.map(x => BigInt(x._1)).sum, b.map(x => BigInt(x._2)).sum)
    val (sqq, syy) = (b.map(x => BigInt(x._1) * x._1).sum, b.map(x => BigInt(x._2) * x._2).sum)
    val sqy = b.map(x => BigInt(x._1) * x._2).sum
    val want = (BigDecimal(n) * BigDecimal(sqy) - BigDecimal(sq) * BigDecimal(sy)).toDouble /
      (math.sqrt((BigDecimal(n) * BigDecimal(sqq) - BigDecimal(sq) * BigDecimal(sq)).toDouble) *
        math.sqrt((BigDecimal(n) * BigDecimal(syy) - BigDecimal(sy) * BigDecimal(sy)).toDouble))
    assert(math.abs(rows(("qty", "price")) - want) < 1e-4,
      s"qty-price corr ${rows(("qty", "price"))} vs replay $want")
  }

  test("q67_gini: equals the brute-force ranked Gini per group") {
    val out = graft.operators.Relational2.q67Gini(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.length.toLong
      val t = xs.map(BigInt(_)).sum
      val s = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = (BigDecimal(2 * s) - BigDecimal(n + 1) * BigDecimal(t)).toDouble /
        (n.toDouble * t.toDouble)
      val (gotN, gotT, gotG) = out(g)
      assert(gotN == n && gotT == t.toLong, s"$g totals")
      assert(gotG >= 0.0 && gotG < 1.0, s"$g gini $gotG out of [0,1)")
      assert(math.abs(gotG - gini) < 1e-5, s"$g gini $gotG vs brute $gini")
    }
  }

  test("q68_seasonality: indexes replay from the emitted exact counts and cents") {
    val rows = graft.operators.EventAnalytics.q68Seasonality(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val nAll = rs.map(_._3).sum
      val cAll = rs.map(_._4).sum
      rs.foreach { case (_, dow, n, cents, idx) =>
        assert(dow >= 0 && dow < 7, s"dow $dow")
        val want = BigDecimal(cents.toDouble * nAll / (n.toDouble * cAll))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(idx - want) < 1e-9, s"$tpe dow $dow idx $idx vs $want")
      }
    }
  }

  test("q69_cusum: peak day and score replay from the daily series") {
    val out = graft.operators.EventAnalytics.q69Cusum(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("event_type", "day").agg(sum(col("c")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, rs) =>
      val series = rs.sortBy(_._2)
      val n = series.length.toLong
      val tot = series.map(x => BigInt(x._3)).sum
      var cum = BigInt(0)
      val stats = series.zipWithIndex.map { case ((_, day, x), i) =>
        cum += x
        (day, (cum * n - BigInt(i + 1) * tot).abs)
      }
      val (bestDay, bestS) = stats.minBy { case (day, s) => (-s, day) }
      val (gotDay, gotScore) = out(tpe)
      assert(gotDay == bestDay, s"$tpe peak day $gotDay vs $bestDay")
      val want = BigDecimal(bestS.toDouble / (n.toDouble * tot.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gotScore - want) < 1e-9, s"$tpe score $gotScore vs $want")
    }
  }

  test("q70_ohlc: open/close replay from the raw event order; candle invariants hold") {
    val out = graft.operators.EventAnalytics.q70Ohlc(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val raw = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts_us div 86400000000"), col("ts_us"),
        col("event_id"), floor(col("value") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    raw.groupBy(r => (r._1, r._2)).foreach { case (key, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._4))
      val (open, high, low, close, vol) = out(key)
      assert(open == ordered.head._5, s"$key open")
      assert(close == ordered.last._5, s"$key close")
      assert(high == rs.map(_._5).max && low == rs.map(_._5).min, s"$key high/low")
      assert(vol == rs.size, s"$key volume")
      assert(low <= open && open <= high && low <= close && close <= high, s"$key bounds")
    }
  }

  test("ml_anova: F replays from driver-side exact moments; eta2 in [0,1]") {
    val r = graft.operators.MlTrees.mlAnova(spark, sf).collect().head
    val ys = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val groups = Seq("A", "N", "R").map(g => ys.filter(_._1 == g).map(_._2))
    val n = groups.map(_.length.toLong)
    val s = groups.map(_.map(BigInt(_)).sum)
    val ss = groups.map(_.map(x => BigInt(x) * x).sum)
    val nAll = n.sum.toDouble
    val sAll = s.map(_.toDouble).sum
    val ssb = (0 until 3).map(i => s(i).toDouble * s(i).toDouble / n(i)).sum - sAll * sAll / nAll
    val ssw = (0 until 3).map(i => ss(i).toDouble - s(i).toDouble * s(i).toDouble / n(i)).sum
    val f = (ssb / 2) / (ssw / (nAll - 3))
    assert(r.getLong(0) == n.sum, "total n")
    assert(math.abs(r.getDouble(1) - f) < 1e-2, s"F ${r.getDouble(1)} vs replay $f")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, "eta2 out of [0,1]")
  }

  test("cur_token_budget: bucket selection is maximal and replays exactly") {
    val r = graft.operators.Curation.tokenBudget(spark, sf).collect().head
    val (budget, cutoff, nDocs, toks, util) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val perDoc = graft.sources.Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("toks"))
      .select(size(col("toks")).cast("long"),
        expr("CAST(round(size(array_distinct(toks)) / size(toks) * 1e6) AS BIGINT)"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val total = perDoc.map(_._1).sum
    assert(budget == total * 3 / 5, "budget is 3/5 of corpus tokens")
    val hist = perDoc.groupBy(_._2).view.mapValues(v => (v.size.toLong, v.map(_._1).sum))
      .toSeq.sortBy(-_._1)
    var (cum, cnt) = (0L, 0L); var cut = Long.MaxValue; var next = -1L
    hist.foreach { case (score, (nd, t)) =>
      if (cum + t <= budget && next == -1L) { cum += t; cnt += nd; cut = score }
      else if (next == -1L) next = t
    }
    assert(toks == cum && nDocs == cnt && cutoff == cut, s"selection ($toks,$nDocs,$cutoff) vs ($cum,$cnt,$cut)")
    assert(toks <= budget, "budget respected")
    if (next >= 0) assert(toks + next > budget, "selection not maximal — next bucket still fits")
    val wantU = BigDecimal(toks.toDouble / budget.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(util - wantU) < 1e-9, "utilization replay")
  }

  test("graph_rich_club: exact replay from driver-side degrees; club shrinks with k") {
    val out = graft.operators.Graph.graphRichClub(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val fwd = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), (col("l_partkey") + graft.operators.Graph.PartOffset))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = fwd ++ fwd.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    out.foreach { case (k, (nK, eK, phi)) =>
      val club = deg.filter(_._2 > k).keySet
      val e2 = sym.count(e => club(e._1) && club(e._2)).toLong
      assert(nK == club.size, s"k=$k n_k")
      assert(eK == e2 / 2, s"k=$k e_k")
      val want = if (club.size < 2) 0.0
        else BigDecimal(e2.toDouble / (club.size.toDouble * (club.size - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(phi - want) < 1e-9, s"k=$k phi $phi vs $want")
    }
    val ks = out.keys.toSeq.sorted
    ks.sliding(2).foreach { case Seq(a, b) =>
      assert(out(a)._1 >= out(b)._1, s"club size grows from k=$a to $b") }
  }

  test("sim_mmr: the greedy trajectory replays exactly from the pool and pair sims") {
    val outRows = graft.operators.Similarity.simMmr(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val all = graft.sources.Tables.embeddings(spark, sf)
    val pool = graft.api.GraftOps.cosineTopK(all, "vec_id", "embedding",
        all.filter(col("vec_id") < graft.operators.Similarity.NumQueries),
        graft.operators.Similarity.MmrPool)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val vecs = all.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = pool.groupBy(_._1).toSeq.flatMap { case (q, cands0) =>
      val cands = cands0.map(c => (c._2, c._3))
      var chosen = Vector(cands.maxBy(c => (c._2, -c._1)))
      var scores = Vector(chosen.head._2)
      while (chosen.size < graft.operators.Similarity.TopK) {
        val rem = cands.filterNot(c => chosen.exists(_._1 == c._1))
        val scored = rem.map { case (id, rel) =>
          val ms = chosen.map(s => cos(vecs(id), vecs(s._1))).max
          (id, BigDecimal(0.7 * rel - 0.3 * ms)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        val pick = scored.maxBy(c => (c._2, -c._1))
        chosen :+= (pick._1, 0.0); scores :+= pick._2
      }
      chosen.zip(scores).zipWithIndex.map { case (((id, _), sc), i) =>
        (q, id, i + 1L, sc) }
    }
    assert(outRows.sortBy(r => (r._1, r._3)).toSeq == expect.sortBy(r => (r._1, r._3)),
      "greedy MMR trajectory differs from the driver replay")
  }

  test("io_stats_report: exact counts, exact small-column NDV, typed min/max replay") {
    val out = graft.operators.ScaleOps.ioStatsReport(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4), r.getString(5),
          r.getDouble(6))).toMap
    val orders = graft.sources.Tables.orders(spark, sf)
    val n = orders.count()
    out.values.foreach { case (nn, nulls, _, _, _, _) =>
      assert(nn == n, "row count"); assert(nulls == 0L, "null count") }
    // below-k columns: the KMV estimate IS the exact distinct count
    val exactStatus = orders.select("o_orderstatus").distinct().count()
    assert(out("o_orderstatus")._3 == exactStatus.toDouble, "status ndv exact below k")
    // saturated column: estimate within the KMV error envelope
    val exactKeys = orders.select("o_orderkey").distinct().count()
    assert(math.abs(out("o_orderkey")._3 - exactKeys) / exactKeys < 0.25,
      s"orderkey ndv ${out("o_orderkey")._3} vs $exactKeys")
    // typed min/max surface as canonical string reprs
    val (mn, mx) = orders.agg(min("o_orderkey"), max("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(out("o_orderkey")._4 == mn.toString && out("o_orderkey")._5 == mx.toString,
      "orderkey min/max repr")
  }

  test("ml_bootstrap_ci: resample-1 mean replays from the exact threshold draw; CI sane") {
    val r = graft.operators.MlTrees.mlBootstrapCi(spark, sf).collect().head
    val (n, mean, lo, hi) = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi, "CI ordered")
    assert(lo <= mean && mean <= hi, "CI brackets the point estimate on this corpus")
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "CAST(l_linenumber AS BIGINT)",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(n == rows.length, "row count")
    val wantMean = BigDecimal(rows.map(x => BigInt(x._3)).sum.toDouble / rows.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mean == wantMean, s"mean $mean vs $wantMean")
    // replay resample b=1 exactly: md5 base hash -> universal-hash
    // affine draw -> inverse-CDF threshold count
    val md = java.security.MessageDigest.getInstance("MD5")
    val ts = graft.operators.MlTrees.bootThresholdsForSpec
    val (a1, b1off, p) = graft.operators.MlTrees.bootFamilyForSpec(1)
    var (s1, w1) = (BigInt(0), 0L)
    rows.foreach { case (ok, ln, y) =>
      val x = java.lang.Long.parseLong(
        md.digest(s"$ok-$ln".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16) % p
      val h = (a1 * x + b1off) % p
      val w = ts.count(h >= _)
      s1 += BigInt(w) * y; w1 += w
    }
    val wantB1 = BigDecimal(s1.toDouble / w1)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b1 = graft.operators.MlTrees.bootResampleMeanForSpec(spark, sf, 1)
    assert(b1 == wantB1, s"resample-1 mean $b1 vs replay $wantB1")
  }

  test("q71_time_to_convert: delays replay exactly; percentile rule is the lower-percentile") {
    val r = graft.operators.EventAnalytics.q71TimeToConvert(spark, sf).collect().head
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val su = ev.filter(_._2 == "signup").groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val delays = ev.filter(_._2 == "purchase").flatMap { case (u, _, t) =>
      su.get(u).filter(t >= _).map(s => (u, t - s)) }
      .groupBy(_._1).values.map(_.map(_._2).min / 60000000L).toSeq.sorted
    assert(r.getLong(0) == su.size, "n_signed")
    assert(r.getLong(1) == delays.size, "n_conv")
    def lowerPct(num: Long, den: Long): Long = {
      var cum = 0L
      delays.groupBy(identity).toSeq.sortBy(_._1)
        .find { case (_, g) => cum += g.size; cum * den >= num * delays.size }.get._1
    }
    assert(r.getLong(3) == lowerPct(1, 2), s"median ${r.getLong(3)}")
    assert(r.getLong(4) == lowerPct(9, 10), s"p90 ${r.getLong(4)}")
  }

  test("q72_feed_health: a planted underfeed day is detected, healthy feeds read zero") {
    import SparkSpec.spark.implicits._
    // healthy on the real corpus (synthetic feed is dense): all zeros
    val real = graft.operators.EventAnalytics.q72FeedHealth(spark, sf).collect()
    real.foreach { r => assert(r.getLong(1) > 0, "days counted") }
    // planted: 9 days at 100, one day at 30 (< half the median 100)
    val daily = ((1L to 9L).map(d => ("t", d, 100L)) :+ (("t", 10L, 30L)))
      .toDF("event_type", "day", "cnt")
    val out = graft.operators.EventAnalytics.feedHealthCore(daily).collect().head
    assert(out.getLong(1) == 10 && out.getLong(2) == 100L, "median of planted series")
    assert(out.getLong(3) == 1L && out.getLong(4) == 10L,
      s"planted underfeed day not flagged: ${out.mkString(",")}")
  }

  test("dedup_source_report: totals replay from the cluster assignment joined to sources") {
    val rep = graft.operators.Dedup.dedupSourceReport(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val assign = graft.operators.Dedup.dedupCluster(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val src = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val keeperSrc = assign.filter(_._3).map(a => a._2 -> src(a._1)).toMap
    val expect = assign.groupBy(a => src(a._1)).map { case (s, as) =>
      s -> (as.size.toLong, as.count(!_._3).toLong,
        as.count(a => !a._3 && keeperSrc(a._2) != s).toLong)
    }
    assert(rep == expect, "per-source report differs from the assignment replay")
    assert(rep.values.map(_._1).sum ==
      graft.sources.Tables.documents(spark, sf).count(), "docs partitioned")
  }

  test("text_hash_embedding: the hashing trick replays exactly from driver-side md5") {
    val out = graft.operators.TextProfile.textHashEmbedding(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = graft.operators.TextProfile.EmbedDims
    val expect = scala.collection.mutable.Map[(Long, Int), Long]()
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().foreach { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).foreach { t =>
          val h = java.lang.Long.parseLong(
            md.digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
          val key = (r.getLong(0), (h % d).toInt)
          expect(key) = expect.getOrElse(key, 0L) + (1 - (h / d) % 2 * 2)
        }
      }
    assert(out == expect.filter(_._2 != 0).toMap, "sparse embedding differs")
  }

  test("text_embed_knn: neighbor cosines recompute from the sparse vectors") {
    val knn = graft.operators.TextProfile.textEmbedKnn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    val d = graft.operators.TextProfile.EmbedDims
    val sp = graft.operators.TextProfile.hashEmbedSparse(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { rs =>
        val v = new Array[Double](d); rs.foreach(x => v(x._2) = x._3.toDouble); v
      }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dp, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i => dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    knn.foreach { case ((q, n), c) =>
      assert(n != q, s"query $q returned itself")
      assert(math.abs(cos(sp(q), sp(n)) - c) < 1e-9, s"($q,$n) cosine $c")
    }
  }

  test("q73_basket_size: histogram replays; shares integrate to one") {
    val out = graft.operators.Relational2.q73BasketSize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val sizes = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(count(lit(1)).as("sz"))
      .collect().map(_.getLong(1))
    val hist = sizes.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq == hist, "histogram differs")
    assert(out.last._4 == 1.0, "cumulative share must end at 1")
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4, "shares sum to ~1")
  }

  test("ml_confusion_by_source: slices partition ml_kappa's global 2x2 table") {
    val slices = graft.operators.Classify.mlConfusionBySource(spark, sf).collect()
    val g = graft.operators.Classify.mlKappa(spark, sf).collect().head
    assert(slices.map(_.getLong(1)).sum == g.getLong(0), "n")
    assert(slices.map(_.getLong(2)).sum == g.getLong(1), "tp = a")
    assert(slices.map(_.getLong(3)).sum == g.getLong(2), "fn = b")
    assert(slices.map(_.getLong(4)).sum == g.getLong(3), "fp = c")
    assert(slices.map(_.getLong(5)).sum == g.getLong(4), "tn = d")
  }

  test("io_snapshot_diff: the planted late-arrival split yields all three statuses") {
    val rows = graft.sources.IoRoundtrip.ioSnapshotDiff(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(5)))
    val statuses = rows.map(_._4).toSet
    assert(statuses == Set("added", "changed", "same"), s"statuses $statuses")
    rows.foreach { case (day, old, nu, st) =>
      assert(old <= nu, s"day $day shrank")
      st match {
        case "added" => assert(old == 0L, s"day $day added but old rows $old")
        case "same" => assert(old == nu, s"day $day same but counts differ")
        case "changed" => assert(old < nu, s"day $day changed but counts equal")
      }
    }
  }

  test("cur_pipeline_v7: budget binds against v1's identical pre-selection chain") {
    val v1 = graft.operators.CurationQuality.pipeline(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v7 = graft.operators.CurationQuality.pipelineV7(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // v7 = v1 + the token-budget stage: per-split counts can only shrink
    v7.foreach { case (split, (n7, t7)) =>
      val (n1, t1) = v1(split)
      assert(n7 <= n1 && t7 <= t1, s"$split grew under selection")
    }
    // the budget is 3/5 of the kept pool's tokens — v1's total IS that pool
    val poolToks = v1.values.map(_._2).sum
    assert(v7.values.map(_._2).sum <= poolToks * 3 / 5,
      s"admitted tokens ${v7.values.map(_._2).sum} exceed the 3/5 budget of $poolToks")
  }

  test("ml_tree_depth2: root equals the best stump; children partition the root's sides") {
    val nodes = graft.operators.MlTrees.mlTreeDepth2(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(7))).toMap
    val stumpTop = graft.operators.MlTrees.mlTreeStump(spark, sf).collect().head
    val root = nodes("root")
    assert(root._1 == stumpTop.getString(0) && root._2 == stumpTop.getLong(1),
      "root split differs from the best stump")
    assert(nodes("L")._3 + nodes("L")._4 == root._3,
      "L child rows != root n_left")
    assert(nodes("R")._3 + nodes("R")._4 == root._4,
      "R child rows != root n_right")
    Seq("L", "R").foreach { n =>
      assert(nodes(n)._5 >= 0.0, s"$n gain negative") }
  }

  test("graph_knn_curve: exact replay from driver-side degrees") {
    val out = graft.operators.Graph.graphKnnCurve(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val fwd = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), (col("l_partkey") + graft.operators.Graph.PartOffset))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = fwd ++ fwd.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nk = deg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sums = sym.groupBy(e => deg(e._1)).view
      .mapValues(_.map(e => BigInt(deg(e._2))).sum).toMap
    assert(out.keySet == nk.keySet, "degree spine differs")
    out.foreach { case (k, (n, s, knn)) =>
      assert(n == nk(k) && BigInt(s) == sums(k), s"k=$k counts")
      val want = BigDecimal(sums(k).toDouble / (k.toDouble * nk(k)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(knn - want) < 1e-9, s"k=$k knn $knn vs $want")
    }
  }

  test("text_lexical_diversity: exact replay; hapax and TTR in (0,1]") {
    val out = graft.operators.TextProfile.textLexicalDiversity(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val words = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map(r.getString(0) -> _))
    out.foreach { case (src, (toks, types, _, ttr, hapax)) =>
      val ws = words.filter(_._1 == src).map(_._2)
      val counts = ws.groupBy(identity).view.mapValues(_.length).toMap
      assert(toks == ws.length.toLong && types == counts.size.toLong, s"$src counts")
      assert(ttr > 0 && ttr <= 1 && hapax >= 0 && hapax <= 1, s"$src ratios")
      val wantH = BigDecimal(counts.values.count(_ == 1).toDouble / counts.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(hapax - wantH) < 1e-9, s"$src hapax $hapax vs $wantH")
    }
  }

  test("ml_learning_curve: the final iteration's AUC equals ml_auc bit-for-bit") {
    val curve = graft.operators.Classify.mlLearningCurve(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(curve.keySet == (1L to 5L).toSet, "five iterations")
    curve.values.foreach(a => assert(a >= 0.0 && a <= 1.0, s"auc $a"))
    val finalAuc = graft.operators.Classify.mlAuc(spark, sf).collect().head.getDouble(2)
    assert(curve(5L) == finalAuc,
      s"iter-5 auc ${curve(5L)} != ml_auc $finalAuc (same chain, same statistic)")
  }

  test("ml_psi: every term nonnegative; total row sums the bins; slices partition the corpus") {
    val rows = graft.operators.EventAnalytics.mlPsi(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (tot, bins) = rows.partition(_._1 == -1L)
    assert(tot.length == 1, "one total row")
    bins.foreach { case (b, _, _, p) => assert(p >= 0.0, s"bin $b psi $p negative") }
    // (p-q) and ln(p/q) share sign, so each grid term >= 0 and the total
    // is the exact sum of the per-bin grid terms
    val sumBins = BigDecimal(bins.map(r => BigDecimal(r._4)).sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(tot.head._4 - sumBins) < 2e-6,
      s"total ${tot.head._4} vs bin sum $sumBins")
    val n = graft.sources.Tables.events(spark, sf).count()
    assert(tot.head._2 + tot.head._3 == n, "slices partition the corpus")
  }

  test("q74_order_gap: gaps replay exactly; lower-percentile rule") {
    val r = graft.operators.EventAnalytics.q74OrderGap(spark, sf).collect().head
    val orders = graft.sources.Tables.orders(spark, sf)
      .selectExpr("o_custkey", "o_orderkey", "unix_micros(o_orderdate) div 86400000000")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val gaps = orders.groupBy(_._1).values.flatMap { os =>
      val days = os.sortBy(o => (o._3, o._2)).map(_._3)
      days.zip(days.drop(1)).map { case (a, b) => b - a }
    }.toSeq.sorted
    assert(r.getLong(0) == gaps.size, "gap count")
    def lowerPct(num: Long, den: Long): Long = {
      var cum = 0L
      gaps.groupBy(identity).toSeq.sortBy(_._1)
        .find { case (_, g) => cum += g.size; cum * den >= num * gaps.size }.get._1
    }
    assert(r.getLong(1) == lowerPct(1, 2), "median gap")
    assert(r.getLong(2) == lowerPct(9, 10), "p90 gap")
  }

  test("q75_pareto: the prefix is minimal and covers 80% exactly by the ranked replay") {
    val r = graft.operators.Relational2.q75Pareto(spark, sf).collect().head
    val revs = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("c"))
      .collect().map(_.getLong(1)).sortBy(-_)
    assert(r.getLong(0) == revs.length, "customer count")
    val total = revs.map(BigInt(_)).sum
    assert(BigInt(r.getLong(1)) == total, "total cents")
    // value-bucket granularity: the reported prefix ends at a value
    // boundary — all customers sharing the boundary value are included
    var cum = BigInt(0); var k = 0
    while (cum * 5 < total * 4) { cum += revs(k); k += 1 }
    while (k < revs.length && revs(k) == revs(k - 1)) { cum += revs(k); k += 1 }
    assert(r.getLong(2) == k, s"prefix ${r.getLong(2)} vs ranked replay $k")
  }

  test("ml_target_encoding: encoding shrinks every category toward the global mean") {
    val rows = graft.operators.MlTrees.mlTargetEncoding(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val mu = {
      val ys = graft.sources.Tables.orders(spark, sf)
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")).collect().map(_.getLong(0))
      ys.map(BigInt(_)).sum.toDouble / ys.length
    }
    rows.foreach { case (p, n, raw, enc) =>
      // the blend sits strictly between the raw mean and the prior
      assert((enc - raw).abs <= (mu - raw).abs + 1e-6, s"$p overshoots the prior")
      assert((enc - raw) * (mu - raw) >= 0.0 || raw == mu, s"$p shrinks the wrong way")
      // m/(n+m) blend replays exactly
      val m = graft.operators.MlTrees.TargetEncM.toDouble
      val ys = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === p)
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")).collect().map(_.getLong(0))
      val want = BigDecimal((ys.map(BigInt(_)).sum.toDouble + m * mu) / (n + m))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(enc - want) < 1e-3, s"$p encoded $enc vs $want")
    }
  }

  test("graph_component_sizes: sizes partition the vertex set; consistent with graph_components") {
    val hist = graft.operators.Graph.graphComponentSizes(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = graft.operators.Graph.graphComponents(spark, sf)
      .collect().map(r => r.getLong(1))
    val want = labels.groupBy(identity).values.map(_.size.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    assert(hist.toSeq == want, "size histogram differs from the label replay")
    assert(hist.map(t => t._1 * t._2).sum == labels.length.toLong,
      "sizes do not partition the vertex set")
  }

  test("cur_novelty: first-occurrence replay; the first doc of the corpus is fully novel") {
    val out = graft.operators.TextProfile.curNovelty(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    def shingles(t: String): Seq[String] = {
      val w = t.split(" ")
      if (w.length < 3) Seq.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").distinct
    }
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, _, t) =>
      shingles(t).foreach(sh => if (!firstDoc.contains(sh)) firstDoc(sh) = id) }
    val expect = docs.groupBy(_._2).view.mapValues { ds =>
      val shs = ds.flatMap { case (id, _, t) => shingles(t).map(id -> _) }
      (shs.size.toLong, shs.count { case (id, sh) => firstDoc(sh) == id }.toLong)
    }.toMap
    assert(out == expect, "per-source novelty counts differ from the replay")
    // the corpus' first doc (smallest doc_id with >= 3 tokens) is 100% novel
    val firstId = docs.find(_._3.split(" ").length >= 3).get._1
    val fSh = shingles(docs.find(_._1 == firstId).get._3)
    assert(fSh.forall(sh => firstDoc(sh) == firstId), "first doc not fully novel")
  }

  test("text_chi2: bit-exact vs a driver-side contingency replay of the chi-square formula") {
    val out = graft.operators.TextRank.textChi2(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // rebuild the bigram contingency in plain Scala from the corpus
    val bigs = graft.sources.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t => val w = t.split(" "); w.dropRight(1).zip(w.drop(1)) }
    val k = bigs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r1 = bigs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c1 = bigs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = bigs.length.toLong
    val expect = k.filter(_._2 >= graft.operators.TextRank.LlrMinPair).map {
      case ((w1, w2), k11) =>
        val (r, c) = (r1(w1), c1(w2))
        val det = k11 * (nn - r - c + k11) - (r - k11) * (c - k11)
        val chi2 = if (r == nn || c == nn) 0.0
          else BigDecimal(nn.toDouble * det * det /
            (r.toDouble * c * (nn - r) * (nn - c)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (w1, w2) -> (k11, chi2)
    }
    assert(out.keySet == expect.keySet, "pair set differs")
    expect.foreach { case (p, (k11, chi2)) =>
      assert(out(p)._1 == k11, s"$p count")
      assert(math.abs(out(p)._2 - chi2) < 1e-9, s"$p chi2 ${out(p)._2} vs $chi2")
    }
  }
}
