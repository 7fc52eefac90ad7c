package graft

import org.apache.spark.sql.functions._
import graft.api.GraftOps.implicits._

/** The user-facing library surface: generic operators via implicit
  * syntax on arbitrary DataFrames (not the driver test tables). */
class ApiSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap here at all"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
  ).toDF("id", "body")

  test("dedupExact groups identical bodies") {
    val groups = corpus.dedupExact("id", "body").collect()
    assert(groups.length == 3)
    val dupGroup = groups.find(_.getAs[Long]("n_dups") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("ngramJaccardPairs finds the near-dup and not the unrelated doc") {
    val pairs = corpus.ngramJaccardPairs("id", "body", n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // one-word diff
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashCandidates surfaces the exact-dup pair with est 1.0") {
    val cands = corpus.minhashCandidates("id", "body")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(cands.get((1L, 4L)).contains(1.0))
  }

  test("simhashCandidates: identical docs at hamming 0, unrelated doc absent") {
    val cands = corpus.simhashCandidates("id", "body")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(cands.get((1L, 4L)).contains(0L))
    assert(!cands.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cosineTopK on arbitrary vectors ranks the aligned vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
    ).toDF("vid", "emb")
    val top = vecs.cosineTopK("vid", "emb", vecs.filter(col("vid") === 0L), k = 3)
      .collect().map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("neighbor")))
    assert(top.toSeq.sorted.map(_._2) == Seq(1L, 2L, 3L))
  }

  test("sessionize splits on gaps for any key/timestamp columns") {
    val ev = Seq(
      ("u1", 1000000L), ("u1", 2000000L), ("u1", 100000000L),
      ("u2", 5000000L),
    ).toDF("user", "t_us")
    val sess = ev.sessionize("user", "t_us", gapUs = 10000000L)
      .collect().map(r => (r.getAs[String]("user"), r.getAs[Long]("session_id"), r.getAs[Long]("n_events")))
      .toSet
    assert(sess == Set(("u1", 1L, 2L), ("u1", 2L, 1L), ("u2", 1L, 1L)))
  }

  test("saltedJoin matches a plain join exactly") {
    val left = Seq((1, "a"), (1, "b"), (2, "c"), (1, "d")).toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    val salted = left.saltedJoin(right, "k", salt = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("topKPerGroup keeps k rows per partition key") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 9)).toDF("g", "x")
    val top = df.topKPerGroup("g", col("x").desc, 2).collect()
    assert(top.count(_.getAs[String]("g") == "a") == 2)
    assert(top.count(_.getAs[String]("g") == "b") == 1)
  }

  test("tfidfTopTerms: discriminative term tops its doc, stopword-ish term does not") {
    val top = corpus.tfidfTopTerms("id", "body", k = 3).collect()
    val doc3Top = top.filter(r => r.getAs[Long]("id") == 3L && r.getAs[Long]("rnk") == 1L)
    assert(doc3Top.nonEmpty) // unique-vocab doc has positive-idf terms
    // 'the' appears in all docs → idf ln(1)=0 → never outranks unique terms
    assert(!top.filter(_.getAs[Long]("rnk") == 1L).exists(_.getAs[String]("term") == "the"))
  }

  test("bm25Rank: docs containing more query terms rank first") {
    val ranked = corpus.bm25Rank("id", "body", Seq("fox", "overlap"), k = 4).collect()
    assert(ranked.nonEmpty)
    assert(ranked.forall(_.getAs[Double]("bm25") > 0.0))
  }

  test("mergeAggState: delta merge, retraction, and full-retraction group drop") {
    val state = Seq(("a", 3L, 30L), ("b", 2L, 20L)).toDF("k", "cnt", "total")
    val delta = Seq(("a", 1L, 5L), ("b", -2L, -20L), ("c", 4L, 7L))
      .toDF("k", "cnt", "total")
    val got = graft.api.GraftOps.mergeAggState(state, delta, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // b fully retracted and dropped; a incremented; c inserted
    assert(got == Set(("a", 4L, 35L), ("c", 4L, 7L)))
  }

  test("profileApprox: HLL distinct counts within rsd bounds of the exact profile") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val exact = orders.profile().collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = graft.api.GraftOps.profileApprox(orders).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact.keySet == approx.keySet)
    // HLL++ at default rsd 2.3%: allow 4 sigma (and ±2 absolute for
    // tiny cardinalities where the sketch is exact-ish)
    exact.foreach { case (c, n) =>
      val tol = math.max(2.0, 4 * 0.023 * n)
      assert(math.abs(approx(c) - n) <= tol,
        s"$c: approx ${approx(c)} vs exact $n (tol $tol)")
    }
    // non-distinct stats must be identical, not approximate
    val exactRest = orders.profile().drop("n_distinct").collect().map(_.toString).sorted.toSeq
    val approxRest = graft.api.GraftOps.profileApprox(orders).drop("n_distinct")
      .collect().map(_.toString).sorted.toSeq
    assert(exactRest == approxRest)
  }

  test("connectedComponents: two islands get two labels, converged") {
    // path 1-2-3 and island 10-11
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val comp = und.connectedComponents("u", "v", iters = 4).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("comp")).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("triangleCount: toy graph with one triangle and one pendant edge") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val r = und.triangleCount("u", "v").head
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_edges") == 4L)
  }

  test("contaminationScan: copied shingles are flagged against the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // benchmark
      (2L, "alpha beta gamma delta unrelated tail here"), // copies a prefix
      (3L, "totally fresh words nothing shared at all"),
      (4L, "too short") // < w tokens: zero shingles, must still report
    ).toDF("id", "body")
    val rows = docs.contaminationScan("id", "body", isBench = col("id") === 1L,
        w = 3, threshold = 0.1).collect()
    val res = rows.map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("flagged")).toMap
    assert(res(2L) && !res(3L))
    assert(!res.contains(1L)) // benchmark rows are not candidates
    // short doc appears with an explicit zero-shingle row, not silence
    val short = rows.find(_.getAs[Long]("id") == 4L).get
    assert(short.getAs[Long]("n_shingles") === 0L && !short.getAs[Boolean]("flagged"))
  }

  test("upsertByKey: updates win, unmatched base survives, new keys insert") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val merged = base.upsertByKey(updates, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged === Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("upsertByKey with versionCol resolves duplicate-key deltas latest-wins") {
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "ver")
    val dupDelta = Seq((1L, "old", 5L), (1L, "new", 9L), (2L, "x", 1L))
      .toDF("k", "v", "ver")
    val merged = base.upsertByKey(dupDelta, "k", versionCol = Some("ver"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged === Map(1L -> "new", 2L -> "x")) // one row per key, max version
  }

  test("upsertByKey is idempotent; snapshotDiff(x, x) is all-unchanged") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val delta = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val once = base.upsertByKey(delta, "k")
    val twice = once.upsertByKey(delta, "k")
    assert(once.collect().map(_.toSeq).toSet === twice.collect().map(_.toSeq).toSet)
    val self = once.snapshotDiff(once, "k", Seq("v"))
      .select("change_type").distinct().collect().map(_.getString(0)).toSeq
    assert(self === Seq("unchanged"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged (null-safe)") {
    val prev = Seq((1L, Some("a")), (2L, Some("b")), (3L, None)).toDF("k", "v")
    val cur = Seq((2L, Some("B")), (3L, None), (4L, Some("d"))).toDF("k", "v")
    val d = prev.snapshotDiff(cur, "k", Seq("v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "removed", 2L -> "changed", 3L -> "unchanged", 4L -> "added"))
  }

  test("domainMixSample: quotas follow weights and never exceed domain sizes") {
    val df = (1 to 40).map(i => (i.toLong, if (i <= 30) "big" else "small"))
      .toDF("id", "dom")
    val kept = df.domainMixSample("id", "dom",
        weight = when(col("dom") === "big", 0.75).otherwise(0.25))
      .groupBy("dom").count().collect()
      .map(r => r.getAs[String]("dom") -> r.getAs[Long]("count")).toMap
    // T = min(30/.75, 10/.25) = 40 → quotas 30 and 10
    assert(kept("big") == 30L && kept("small") == 10L)
  }

  test("domainMixSample histogram selection ≡ naive per-domain hash rank") {
    // 3 domains: two partial keeps exercising different cut buckets,
    // and a zero-quota domain (floor(p·T) = 0 → no cut row → the inner
    // join drops the domain entirely)
    val df = (1 to 300).map { i =>
      val dom = if (i <= 200) "web" else if (i <= 290) "code" else "rare"
      (s"doc$i", dom)
    }.toDF("id", "dom")
    val w = when(col("dom") === "web", 0.69)
      .when(col("dom") === "code", 0.309).otherwise(0.001)
    val kept = df.domainMixSample("id", "dom", w)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // naive form the histogram path must reproduce bit-for-bit
    val base = df.select(col("dom"), col("id"),
      graft.functions.TextFns.hash32(col("id")).as("h"))
    val counts = base.groupBy("dom").agg(count(lit(1)).as("n")).withColumn("p", w)
    val t = counts.agg(min(col("n") / col("p")).as("t"))
    val naive = base
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("dom"))
          .orderBy(col("h"), col("id"))).cast("long"))
      .join(counts.crossJoin(t).select(col("dom"),
        floor(col("p") * col("t")).as("q")), "dom")
      .filter(col("rn") <= col("q"))
      .select("dom", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == naive)
    assert(kept.nonEmpty && !kept.exists(_._1 == "rare")) // zero quota → dropped
  }
}
