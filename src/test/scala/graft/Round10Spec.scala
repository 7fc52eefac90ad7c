package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-10 additions: forecasting, sequence mining, KN smoothing,
  * Adamic–Adar, histogram trees, batch-GD logistic regression, DBSCAN. */
class Round10Spec extends SparkSpec {

  test("q50_ewma: smoothed value stays inside the trailing window's range") {
    val rows = Forecast.q50Ewma(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val xs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      rs.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
        val window = xs.slice(math.max(0, i - Forecast.EwmaK + 1), i + 1)
        val e = r.getDouble(4)
        assert(e >= window.min - 1e-6 && e <= window.max + 1e-6,
          s"ewma $e outside window [${window.min}, ${window.max}]")
      }
      // first observation: no history, EWMA = x exactly
      val first = rs.minBy(_.getLong(1))
      assert(math.abs(first.getDouble(4) - first.getDouble(3)) < 1e-6)
    }
  }

  test("q51_seq_support: the (view,click,purchase) cell equals the q37 funnel's stage 3") {
    val sup = EventAnalytics.q51SeqSupport(spark, sf)
      .filter(col("a") === "view" && col("b") === "click" && col("c") === "purchase")
      .collect()
    val funnel = EventAnalytics.q37Funnel(spark, sf)
      .filter(col("stage") === 3).collect()
    assert(funnel.length == 1)
    val f3 = funnel.head.getLong(2)
    val s3 = if (sup.isEmpty) 0L else sup.head.getLong(3)
    // exists-a-before-b-before-c ≡ the greedy first-occurrence chain
    assert(s3 == f3, s"seq support $s3 != funnel stage-3 $f3")
  }

  test("text_kneser_ney: probabilities in (0, 1], bounded below by the discounted MLE term") {
    val rows = TextRank.textKneserNey(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c12, c1, pkn) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(pkn > 0 && pkn <= 1.0)
      val mle = (c12 - TextRank.KnDiscount) / c1.toDouble
      assert(pkn >= mle - 1e-6, s"pkn $pkn < discounted MLE $mle")
    }
  }

  test("graph_adamic_adar: integer nano-weights stay clear of floor boundaries; scores consistent") {
    val rows = Graph.graphAdamicAdar(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, nano, aa) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(common >= 1)
      // score equals the quantized sum at 6dp
      assert(math.abs(aa - math.rint(nano / 1e9 * 1e6) / 1e6) < 1e-9)
      // each shared item contributes at most 1/ln(2)
      assert(nano <= common * math.ceil(1e9 / math.log(2)).toLong)
    }
    // the grid-margin discipline: every realizable part degree's
    // nano-weight is far from an integer boundary (cross-libm ulps
    // can't flip the floor)
    (2 to 4096).foreach { d =>
      val x = 1e9 / math.log(d.toDouble)
      val frac = x - math.floor(x)
      assert(frac > 1e-4 && frac < 1 - 1e-4 || x < 1e-9,
        s"degree $d nano-weight $x within 1e-4 of a floor boundary")
    }
  }

  test("ml_tree_stump: candidates ranked by gain, partitions add up") {
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    val rows = MlTrees.mlTreeStump(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= MlTrees.StumpTopK)
    val gains = rows.map(_.getDouble(6))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b }, "gains not descending")
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == total)
      assert(r.getDouble(6) >= 0, "variance reduction must be non-negative")
    }
  }

  test("ml_gbt_stumps: training MSE strictly decreases round over round") {
    val rows = MlTrees.mlGbtStumps(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.length == MlTrees.GbtRounds)
    val mses = rows.map(_.getDouble(7))
    mses.zip(mses.tail).foreach { case (a, b) =>
      assert(b < a, s"MSE did not decrease: $a -> $b")
    }
  }

  test("ml_logreg_batch: finite micro-grid weights that separate the classes") {
    val w = Classify.mlLogregBatch(spark, sf).collect()
    assert(w.nonEmpty)
    assert(w.forall(r => math.abs(r.getDouble(1)) < 100))
    assert(w.exists(r => r.getDouble(1) != 0.0), "all-zero weights: training did nothing")
    // scoring the training set with the learned weights must beat the
    // 50% coin on the is_spam = (doc_id % 3 == 0) labels
    val wm = w.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val inst = Classify.instances(spark, sf).collect()
    val correct = inst.count { r =>
      val score = r.getSeq[Int](2).map(f => wm.getOrElse(f, 0.0)).sum
      (score > 0) == r.getBoolean(1)
    }
    assert(correct.toDouble / inst.length > 0.5,
      s"train accuracy ${correct.toDouble / inst.length} not above chance")
  }

  test("text_suffix_array: a true suffix array — permutation ranks, lexicographic order, depth bound") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % SuffixArray.SampleMod === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the doubling depth must cover every suffix or ties would break
    // differently from the full-string oracle
    assert(docs.values.map(_.length).max <= (1 << SuffixArray.Rounds))
    val sa = SuffixArray.textSuffixArray(spark, sf).collect()
    assert(sa.length == docs.values.map(_.length).sum)
    val ranks = sa.map(_.getLong(2)).sorted
    assert(ranks.head == 1L && ranks.last == sa.length &&
      ranks.distinct.length == sa.length, "ranks are not a permutation of 1..n")
    // rank order IS lexicographic suffix order with (doc, pos) tie-break
    val byRank = sa.sortBy(_.getLong(2))
      .map(r => (docs(r.getLong(0)).substring(r.getLong(1).toInt - 1), r.getLong(0), r.getLong(1)))
    byRank.zip(byRank.tail).foreach { case ((s1, d1, p1), (s2, d2, p2)) =>
      val cmp = s1.compareTo(s2)
      assert(cmp < 0 || (cmp == 0 && (d1 < d2 || (d1 == d2 && p1 < p2))),
        s"suffix order violated at ($d1,$p1) vs ($d2,$p2)")
    }
  }

  test("dedup_substring_sa: every reported repeat really occurs at both positions") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % SuffixArray.SampleMod === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val reps = SuffixArray.dedupSubstringSa(spark, sf).collect()
    reps.foreach { r =>
      val (da, pa, db, pb, lcp, snip) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))
      assert(lcp >= SuffixArray.MinRep && lcp <= SuffixArray.LcpCap)
      assert(snip.length == math.min(lcp, 40L))
      assert(docs(da).startsWith(snip, pa.toInt - 1), s"snippet absent at ($da,$pa)")
      assert(docs(db).startsWith(snip, pb.toInt - 1), s"snippet absent at ($db,$pb)")
      // the claimed LCP is exact (below the cap): next char differs or a doc ends
      if (lcp < SuffixArray.LcpCap) {
        val sa1 = docs(da).substring(pa.toInt - 1)
        val sb1 = docs(db).substring(pb.toInt - 1)
        assert(sa1.take(lcp.toInt) == sb1.take(lcp.toInt))
        assert(sa1.length == lcp || sb1.length == lcp ||
          sa1.charAt(lcp.toInt) != sb1.charAt(lcp.toInt), "LCP not maximal")
      }
    }
  }

  test("graph_ktruss: the fixed-round peel reaches its fixpoint and every edge is truss-supported") {
    val rows = Truss.graphKtruss(spark, sf).collect()
    val edges = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(r.getLong(2) >= Truss.TrussK - 2, "surviving edge below support bar")
    }
    // fixpoint: recompute support INSIDE the surviving subgraph — every
    // edge must still close >= k-2 triangles there (one more round
    // would change nothing)
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    edges.foreach { case (a, b) =>
      val tri = verts.count(c => c != a && c != b &&
        edges.contains((math.min(a, c), math.max(a, c))) &&
        edges.contains((math.min(b, c), math.max(b, c))))
      assert(tri >= Truss.TrussK - 2,
        s"edge ($a,$b) has only $tri surviving triangles")
    }
  }

  test("ml_calibration: buckets partition the corpus and probabilities are coherent") {
    val rows = Classify.mlCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val docs = Classify.instances(spark, sf)
      .filter(size(col("features")) > 0).count()
    assert(total == docs, s"bucket counts $total != scored docs $docs")
    rows.foreach { r =>
      val (b, mp, fp) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(b >= 0 && b <= 9)
      assert(mp >= b / 10.0 - 1e-6 && mp <= (b + 1) / 10.0 + 1e-6,
        s"bucket $b mean_pred $mp outside its decile")
      assert(fp >= 0 && fp <= 1)
    }
  }

  test("ml_linear_reg2: recovers the bilinear revenue law to first order") {
    val r = MlTrees.mlLinearReg2(spark, sf).collect().head
    val (b1, b2, r2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    // y = price(1 - disc/100): b1 ≈ 1 - E[disc]/100 ∈ (0.9, 1),
    // b2 ≈ -E[price cents]/100 < 0, fit near-perfect but NOT exact
    // (the interaction residual stays in 1 - r²)
    assert(b1 > 0.9 && b1 < 1.0, s"b1 $b1")
    assert(b2 < 0, s"b2 $b2")
    assert(r2 > 0.99 && r2 < 1.0, s"r2 $r2")
  }

  test("stream_ewma: the stateful streaming core converges to the batch mirror") {
    val ss = spark
    import ss.implicits._
    val batch = graft.streaming.EventStreams.ewmaBatch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    val evs = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("ts_us"), col("value"))
      .as[(Long, String, Long, Double)]
    val streamed = graft.streaming.EventStreams.ewmaCore(evs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("cur_perplexity_kn: scores are negative log-probs, kept docs score higher") {
    val rows = TextRank.curPerplexityKn(spark, sf).collect()
    assert(rows.nonEmpty)
    val (kept, dropped) = rows.filter(_.getLong(1) > 0).partition(_.getBoolean(3))
    rows.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getDouble(2) < 0, "bigram log-prob must be negative")
    }
    if (kept.nonEmpty && dropped.nonEmpty)
      assert(kept.map(_.getDouble(2)).min >= dropped.map(_.getDouble(2)).max,
        "keep flag must be a threshold on avg_lp")
    rows.filter(_.getLong(1) == 0).foreach(r => assert(!r.getBoolean(3)))
  }

  test("cur_chunk_passages: chunks tile each doc with the declared overlap") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val rows = Curation.chunkPassages(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc must produce chunks")
    byDoc.foreach { case (d, chunks) =>
      val toks = docs(d)
      val sorted = chunks.sortBy(_.getLong(1))
      sorted.foreach { c =>
        val (cid, n, passage) = (c.getLong(1).toInt, c.getLong(2), c.getString(3))
        val start = cid * Curation.ChunkStride
        val expected = toks.slice(start, start + math.min(Curation.ChunkLen, toks.length - start))
        assert(passage == expected.mkString(" "), s"doc $d chunk $cid content mismatch")
        assert(n == expected.length)
      }
      // coverage: the union of chunks reaches the last token
      val last = sorted.last
      assert(last.getLong(1).toInt * Curation.ChunkStride + last.getLong(2) == toks.length,
        s"doc $d tail not covered")
      // no chunk is a suffix of its predecessor
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) == a.getLong(1) + 1)
          assert(b.getLong(2) > Curation.ChunkLen - Curation.ChunkStride ||
            b.getLong(1) == 0)
        case _ =>
      }
    }
  }

  test("q52_rfm: quintile scores are monotone in their metrics and ties share scores") {
    val rows = Relational2.q52Rfm(spark, sf).collect()
    assert(rows.nonEmpty)
    def check(metric: Int, score: Int, ascending: Boolean): Unit = {
      val pairs = rows.map(r => (r.getLong(metric), r.getLong(score)))
      pairs.groupBy(_._1).foreach { case (m, ss) =>
        assert(ss.map(_._2).distinct.length == 1, s"tied metric $m got differing scores")
      }
      val sorted = pairs.sortBy(_._1)
      val dir = sorted.map(_._2)
      dir.zip(dir.tail).foreach { case (a, b) =>
        if (ascending) assert(b >= a) else assert(b <= a)
      }
      assert(pairs.map(_._2).forall(s => s >= 1 && s <= 5))
    }
    check(metric = 1, score = 4, ascending = false) // recency: more days → lower score
    check(metric = 2, score = 5, ascending = true)  // frequency
    check(metric = 3, score = 6, ascending = true)  // monetary
    rows.foreach { r =>
      assert(r.getLong(7) == r.getLong(4) * 100 + r.getLong(5) * 10 + r.getLong(6))
    }
  }

  test("mm_dedup_phash: reported hamming is the true blockhash distance; exact pairs collide at 0") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def code(text: String): Seq[Int] = {
      val cs = text.map(_.toInt.toLong)
      val n = cs.length
      val total = cs.sum
      (0 until 64).map { j =>
        val lo = (j * n / 64).toInt
        val hi = ((j + 1) * n / 64).toInt
        if (cs.slice(lo, hi).sum * 64 > total) 1 else 0
      }
    }
    val rows = Multimodal.mmDedupPhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val trueH = code(docs(a)).zip(code(docs(b))).count { case (x, y) => x != y }
      assert(h == trueH, s"pair ($a,$b) hamming $h != recomputed $trueH")
      assert(h <= Multimodal.PhashMaxHamming)
    }
    // identical payloads MUST be found at hamming 0 (the pigeonhole
    // guarantee at its extreme)
    val exactDups = docs.groupBy(_._2).values.filter(_.size > 1)
    exactDups.foreach { g =>
      val ids = g.keys.toSeq.sorted
      ids.combinations(2).foreach { case Seq(x, y) =>
        assert(rows.exists(r => r.getLong(0) == x && r.getLong(1) == y && r.getLong(2) == 0),
          s"exact dup pair ($x,$y) missing")
      }
    }
  }

  test("mm_phash_cluster: clusters are closed over the pair graph with min-id keepers") {
    val pairs = Multimodal.mmDedupPhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = Multimodal.mmPhashCluster(spark, sf).collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"paired payloads $a/$b in different clusters")
    }
    rows.foreach { r =>
      val (d, c, keep) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(c <= d, "cluster label must be the min member id")
      assert(keep == (d == c))
    }
    // every cluster keeps exactly one
    rows.groupBy(_.getLong(1)).foreach { case (_, g) =>
      assert(g.count(_.getBoolean(2)) == 1)
    }
  }

  test("cur_chunk_passages plans with zero Exchange (pure in-row restructuring)") {
    val plan = Curation.chunkPassages(spark, sf).queryExecution.executedPlan
    def countEx(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        case _ => 0
      }) + p.children.map(countEx).sum
    // the single orderBy for presentation is the only allowed exchange
    assert(countEx(plan) <= 1, s"unexpected shuffles in:\n$plan")
  }

  test("cur_contamination_bloom: never under-counts the exact scan (no false negatives)") {
    val exact = CurationQuality.contamination(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = CurationQuality.contaminationBloom(spark, sf).collect()
    assert(bloom.nonEmpty)
    bloom.foreach { r =>
      val (doc, n, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(h >= exact(doc), s"doc $doc: bloom $h < exact ${exact(doc)} — impossible")
      assert(h <= n)
    }
    // at this load factor (|bench shingles| << 2^18 bits) the filter
    // should be near-exact; allow a small FP budget
    val fp = bloom.map(r => r.getLong(2) - exact(r.getLong(0))).sum
    assert(fp <= math.max(1L, bloom.map(_.getLong(1)).sum / 100),
      s"false-positive mass $fp exceeds 1% of probes")
  }

  test("ml_pr_curve: monotone threshold behavior and exact confusion totals") {
    val rows = Classify.mlPrCurve(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.length == 9)
    val total = Classify.instances(spark, sf)
      .filter(size(col("features")) > 0).count()
    val positives = Classify.instances(spark, sf)
      .filter(size(col("features")) > 0 && col("is_spam")).count()
    rows.foreach { r =>
      val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tp + fn == positives, "tp+fn must equal the positive count")
      assert(tp + fp <= total)
    }
    // raising the threshold can only shrink the predicted-positive set
    val preds = rows.map(r => r.getLong(1) + r.getLong(2))
    preds.zip(preds.tail).foreach { case (a, b) => assert(b <= a) }
    // recall is non-increasing in the threshold
    val recalls = rows.map(_.getDouble(5))
    recalls.zip(recalls.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
  }

  test("io_schema_evolution: old-epoch rows survive with NULLs in the evolved column") {
    val rows = graft.sources.IoRoundtrip.schemaEvolution(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L)._2 == 0, "epoch-1 files predate the column: all NULL")
    assert(rows(2L)._2 == rows(2L)._1, "epoch-2 rows all carry the column")
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows(1L)._1 + rows(2L)._1 == total, "no rows lost in the merged read")
  }

  test("cur_pipeline_v5: the added perplexity gate can only shrink v4's corpus") {
    val v4 = CurationQuality.pipelineV4(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v5 = CurationQuality.pipelineV5(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v5.nonEmpty)
    // when the KN gate passes the whole corpus (true on this uniformly
    // self-fluent synthetic text), v5 must equal v4 EXACTLY — the
    // composition is provably a pass-through; a downstream-stage drift
    // would surface here. (Keeper counts are NOT monotone in the pool
    // in general — removing a chain-link doc can split a dup cluster —
    // so the conditional identity is the strong checkable property.)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val withBigrams = docs.filter(size(split(col("text"), " ")) >= 2).count()
    val knPass = TextRank.knKeep(spark, sf, docs).count()
    if (knPass == withBigrams) assert(v5 == v4, "KN gate passed everything but v5 != v4")
  }

  test("ml_auc: matches the brute-force pairwise statistic exactly") {
    val r = Classify.mlAuc(spark, sf).collect().head
    val (nPos, nNeg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(auc >= 0 && auc <= 1)
    // recompute over all (pos, neg) pairs from the raw grid scores
    val w = Classify.mlLogregBatch(spark, sf).collect()
      .map(x => x.getInt(0) -> math.rint(x.getDouble(1) * 1e6).toLong).toMap
    val scored = Classify.instances(spark, sf).collect()
      .filter(_.getSeq[Int](2).nonEmpty)
      .map { x =>
        val sc = x.getSeq[Int](2).map(f => w.getOrElse(f, 0L)).sum
        val p = math.floor(1.0 / (1.0 + math.exp(-(sc / 1e6))) * Classify.ProbGrid + 0.5).toLong
        (x.getBoolean(1), p)
      }
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filter(!_._1).map(_._2)
    assert(pos.length == nPos && neg.length == nNeg)
    val num2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    val brute = num2.toDouble / (2.0 * nPos * nNeg)
    assert(math.abs(auc - brute) < 5e-9, s"auc $auc != brute $brute")
  }

  test("q53_mode_median: the mode really is the most frequent value") {
    val hist = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("qty"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
    Relational2.q53ModeMedian(spark, sf).collect().foreach { r =>
      val (g, mq, mc) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rows = hist(g).map(x => (x.getLong(1), x.getLong(2)))
      assert(rows.map(_._2).max == mc, s"group $g: mode count $mc not maximal")
      assert(rows.filter(_._2 == mc).map(_._1).min == mq, s"group $g: tie not broken to smallest")
      val med = r.getDouble(3)
      assert(med >= rows.map(_._1).min && r.getLong(4) == rows.map(_._2).sum)
    }
  }

  test("sim_recall_report: per-query rows intersect the two registered operators exactly") {
    val exact = Similarity.cosineTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val ann = Similarity.annLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val rows = Similarity.simRecallReport(spark, sf).collect()
    val perQ = rows.filter(_.getLong(0) >= 0)
    perQ.foreach { r =>
      val q = r.getLong(0)
      val expHits = exact(q).map(_._2).toSet
        .intersect(ann.getOrElse(q, Array.empty[(Long, Long)]).map(_._2).toSet).size
      assert(r.getLong(2) == expHits, s"query $q hit count mismatch")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
    val mean = rows.filter(_.getLong(0) == -1L).head
    assert(mean.getLong(1) == perQ.map(_.getLong(1)).sum)
    assert(mean.getLong(2) == perQ.map(_.getLong(2)).sum)
  }

  test("q54_sliding_distinct: every window equals the brute-force distinct count") {
    val du = graft.sources.Tables.events(spark, sf)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = EventAnalytics.q54SlidingDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, n) = (r.getLong(0), r.getLong(1))
      val expect = du.filter { case (d, _) => d <= w && d > w - EventAnalytics.SlideDays }
        .map(_._2).distinct.length
      assert(n == expect, s"window $w: $n != brute $expect")
    }
  }

  test("graph_reciprocity: matches the brute-force reverse-edge count") {
    val e = Graph.sccEdges(spark, sf).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val es = e.toSet
    val r = Graph.graphReciprocity(spark, sf).collect().head
    assert(r.getLong(0) == e.length)
    assert(r.getLong(1) == e.count { case (a, b) => es.contains((b, a)) })
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
  }

  test("graph_degree_hist: bins partition the vertex set with power-of-two bounds") {
    val rows = Graph.graphDegreeHist(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bin, lo, _, mn, mx) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(lo == (1L << bin))
      assert(mn >= lo && mx < 2 * lo, s"bin $bin bounds violated: [$mn,$mx] vs [$lo,${2 * lo})")
    }
    val nVerts = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .select(explode(array(col("l_suppkey"), col("l_partkey") + Graph.PartOffset)).as("v"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum == nVerts, "bins must partition the vertex set")
  }

  test("text_heaps_fit: a real sublinear growth law on this corpus") {
    val r = TextProfile.heapsFit(spark, sf).collect().head
    val (slope, r2) = (r.getDouble(1), r.getDouble(3))
    assert(slope > 0 && slope <= 1, s"Heaps beta $slope outside (0,1]")
    assert(r2 >= 0 && r2 <= 1)
  }

  test("ml_dbscan: core/border/noise labels are consistent with the candidate graph") {
    val pairs = graft.api.GraftOps.embeddingNearDupPairs(
        graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding", Dbscan.DbEps)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = Dbscan.mlDbscan(spark, sf).collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val isCore = rows.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    rows.foreach { r =>
      val (v, c, core) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      val deg = nbrs.getOrElse(v, Set.empty).size
      if (core) {
        assert(deg >= Dbscan.DbMinNb, s"core $v has only $deg neighbors")
        assert(c >= 0)
        // core neighbors of a core point share its cluster
        nbrs(v).filter(isCore).foreach { u =>
          assert(cluster(u) == c, s"core neighbors $v/$u in different clusters")
        }
      } else if (c >= 0) {
        // border: must have a core neighbor carrying that cluster
        assert(nbrs.getOrElse(v, Set.empty).exists(u => isCore(u) && cluster(u) == c))
      } else {
        // noise: no core neighbor at all
        assert(!nbrs.getOrElse(v, Set.empty).exists(isCore))
      }
    }
  }
}
