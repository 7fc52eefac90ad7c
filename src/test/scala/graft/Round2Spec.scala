package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Invariants for the round-2 operators: graph analytics, ranked
  * retrieval, curation filters, relational reshaping. */
class Round2Spec extends SparkSpec {

  test("graph_components: labels are stable under one more iteration (converged)") {
    import SparkSpec.spark.implicits._
    val labels = Graph.graphComponents(spark, sf).cache()
    // one extra min-propagation round must not change any label
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
    val fwd = li.select(col("l_suppkey").as("src"), (col("l_partkey") + Graph.PartOffset).as("dst"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val nbrMin = edges.join(labels, edges("src") === labels("v"))
      .groupBy(edges("dst").as("v")).agg(min(col("comp")).as("nc"))
    val changed = labels.join(nbrMin, Seq("v"), "left")
      .filter(least(col("comp"), coalesce(col("nc"), col("comp"))) =!= col("comp"))
      .count()
    assert(changed === 0L)
    // every component label is a member of its own component (a root)
    val badRoots = labels.as("a").join(labels.as("b"), col("a.comp") === col("b.v"), "left_anti").count()
    assert(badRoots === 0L)
  }

  test("graph_degree: sum(degree * n_nodes) = 2|E|") {
    val deg = Graph.graphDegree(spark, sf)
    val total = deg.select(sum(col("degree") * col("n_nodes"))).head.getLong(0)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().count()
    assert(total === 2 * li)
  }

  test("graph_triangles: degree-ordered count equals naive id-ordered count") {
    val r = Graph.graphTriangles(spark, sf).head
    graft.sources.Tables.lineitem(spark, sf).createOrReplaceTempView("li_tri")
    // independent id-ordered formulation over the same co-purchase graph
    val naive = spark.sql(
      """WITH op AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM li_tri),
           e AS (SELECT DISTINCT x.pk a, y.pk b FROM op x JOIN op y
                 ON x.ok = y.ok AND x.pk < y.pk)
         SELECT count(*) FROM e e1 JOIN e e2 ON e1.b = e2.a
         WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)""")
      .head.getLong(0)
    assert(r.getAs[Long]("n_triangles") === naive)
    assert(r.getAs[Long]("n_triangles") > 0L) // non-degenerate at sf0.001
  }

  test("text_tfidf: rare terms outrank common terms within a doc") {
    val top = TextRank.textTfidf(spark, sf)
    // rank-1 term's df must be <= the median df among that doc's top-5
    // (idf monotonicity sanity, not an exact oracle — that's DuckDB's job)
    val r = top.filter(col("rnk") === 1).select(avg(col("df"))).head.getDouble(0)
    val all = top.select(avg(col("df"))).head.getDouble(0)
    assert(r <= all, s"rank-1 avg df $r should be <= overall avg df $all")
    // every doc with >=5 distinct terms yields exactly 5 rows
    val counts = top.groupBy("doc_id").count()
    assert(counts.filter(col("count") > 5).count() === 0L)
  }

  test("text_bm25: scores positive; shorter doc outranks longer at equal tf") {
    val res = TextRank.textBm25(spark, sf).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getDouble(res.head.fieldIndex("bm25")) > 0.0))
    // length normalization direction: same single query-term occurrence,
    // different doc lengths → the shorter doc must score strictly higher
    import SparkSpec.spark.implicits._
    val toy = Seq(
      (1L, "needle plus just a few other words"),
      (2L, "needle " + Seq.fill(60)("filler").mkString(" "))
    ).toDF("id", "body")
    val scores = graft.api.GraftOps.bm25Rank(toy, "id", "body", Seq("needle"), k = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("bm25")).toMap
    assert(scores(1L) > scores(2L),
      s"shorter doc must outrank longer at equal tf: $scores")
  }

  test("dedup_cluster: paired docs share a cluster; keeper is the cluster min") {
    val clusters = Dedup.dedupCluster(spark, sf).cache()
    val pairs = Dedup.dedupMinhash(spark, sf).select("a", "b")
    val ca = clusters.select(col("doc_id").as("a"), col("cluster").as("cl_a"))
    val cb = clusters.select(col("doc_id").as("b"), col("cluster").as("cl_b"))
    // every candidate pair must land in the same cluster (transitivity)
    assert(pairs.join(ca, "a").join(cb, "b")
      .filter(col("cl_a") =!= col("cl_b")).count() === 0L)
    // exactly one keeper per cluster, and it's the min doc_id
    val byCluster = clusters.groupBy("cluster")
      .agg(min(col("doc_id")).as("mn"),
        sum(when(col("is_keep"), 1).otherwise(0)).as("keepers"))
    assert(byCluster.filter(col("keepers") =!= 1 || col("mn") =!= col("cluster")).count() === 0L)
  }

  test("spam_nb: model covers the vocabulary; accuracy tracks the class prior") {
    val model = Classify.nbTrain(spark, sf).cache()
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").distinct().count()
    assert(model.count() === vocab)
    // labels are independent of text → NB can do no better than priors;
    // it must at least not collapse below chance
    val applied = Classify.nbApply(spark, sf)
    val acc = applied.filter(col("correct")).count().toDouble / applied.count()
    assert(acc >= 0.5 && acc <= 0.9, s"accuracy $acc outside sane band")
  }

  test("cur_quality_filter: keep <=> empty reasons; every rule fires somewhere") {
    val qf = CurationQuality.qualityFilter(spark, sf).cache()
    assert(qf.filter(col("keep") =!= (col("reasons") === "")).count() === 0L)
    val reasons = qf.select(explode(split(col("reasons"), ";")).as("r"))
      .filter(col("r") =!= "").select("r").distinct().collect().map(_.getString(0)).toSet
    assert(reasons.contains("len")) // 10..99-token corpus: len rule must fire
  }

  test("cur_contamination: benchmark docs excluded; ratio in [0,1]") {
    val c = CurationQuality.contamination(spark, sf).cache()
    assert(c.filter(col("ratio") < 0 || col("ratio") > 1).count() === 0L)
    assert(c.filter(col("n_hits") > col("n_shingles")).count() === 0L)
  }

  test("cur_pii: crafted rows are detected and redacted") {
    import SparkSpec.spark.implicits._
    Seq(
      (1L, "contact me at bob@example.com or +1 (555) 123-4567 ok"),
      (2L, "ssn-ish 123456789 and clean text"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text").createOrReplaceTempView("pii_toy")
    // functions API, not spark.sql: SQL string literals would re-process
    // the regex backslashes (the operator itself uses the functions API)
    val r = spark.table("pii_toy").select(col("doc_id"),
        regexp_count(col("text"), lit(CurationQuality.EmailRe)).cast("int").as("e"),
        regexp_count(col("text"), lit(CurationQuality.DigitRunRe)).cast("int").as("d"),
        regexp_count(col("text"), lit(CurationQuality.PhoneRe)).cast("int").as("p"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          CurationQuality.EmailRe, "<EMAIL>"),
          CurationQuality.DigitRunRe, "<ID>"),
          CurationQuality.PhoneRe, "<PHONE>").as("red"))
      .orderBy("doc_id").collect()
    assert(r(0).getInt(1) === 1 && r(0).getInt(3) >= 1) // email + phone
    assert(r(1).getInt(2) === 1)                        // digit run
    assert(r(0).getString(4).contains("<EMAIL>") && !r(0).getString(4).contains("bob@"))
    assert(r(2).getInt(1) + r(2).getInt(2) + r(2).getInt(3) === 0)
  }

  test("cur_domain_mix: per-source kept counts realize the quota mixture") {
    val kept = CurationQuality.domainMix(spark, sf)
      .groupBy("source").count().cache()
    // even sources get 3x odd sources' weight → kept ratio ~3:1 wherever
    // quotas bind; at minimum every kept count must not exceed the source size
    val sizes = graft.sources.Tables.documents(spark, sf).groupBy("source").count()
      .withColumnRenamed("count", "n")
    assert(kept.join(sizes, "source").filter(col("count") > col("n")).count() === 0L)
    assert(kept.count() > 0)
  }

  test("q22_range_join: bucket arithmetic equals declarative range semantics") {
    import SparkSpec.spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("value"),
        floor(col("value") / Relational2.BucketWidth).as("bid"))
    val bad = ev.filter(
      col("value") < col("bid") * Relational2.BucketWidth ||
      col("value") >= (col("bid") + 1) * Relational2.BucketWidth).count()
    assert(bad === 0L)
  }

  test("q20_setops: both + only_1995 partitions the 1995 customer set") {
    val r = Relational2.q20Setops(spark, sf).cache()
    val both = r.filter(col("tag") === "both").count()
    val only = r.filter(col("tag") === "only_1995").count()
    val c95 = graft.sources.Tables.orders(spark, sf)
      .filter(year(to_date(col("o_orderdate"))) === 1995)
      .select("o_custkey").distinct().count()
    assert(both + only === c95)
  }
}
