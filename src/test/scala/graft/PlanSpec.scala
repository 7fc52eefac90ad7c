package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Physical-plan assertions: the properties that make these plans
  * survive a 100× scale-up must hold STRUCTURALLY, not by eyeball.
  * Pushdown and pruning are checked on the scan nodes themselves
  * (plan strings truncate ReadSchema); join strategy on the plan tree. */
class PlanSpec extends SparkSpec {

  private def sparkPlan(name: String) =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  private def scans(name: String): Seq[FileSourceScanExec] =
    sparkPlan(name).collect { case f: FileSourceScanExec => f }

  test("q1: the shipdate predicate is pushed into the parquet scan") {
    val s = scans("q1_filter_count")
    assert(s.nonEmpty)
    val pushed = s.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("l_shipdate"), s"no pushed shipdate filter: $pushed")
    assert(pushed.contains("IsNotNull") || pushed.contains("EqualTo"))
  }

  test("q6: scan reads exactly the four needed lineitem columns") {
    val s = scans("q6_revenue")
    assert(s.nonEmpty)
    val read = s.head.requiredSchema.fieldNames.toSet
    assert(read == Set("l_extendedprice", "l_discount", "l_quantity", "l_shipdate"),
      s"over-read: $read")
  }

  test("q3: both dim joins plan as broadcast hash joins (no shuffle)") {
    val p = sparkPlan("q3_broadcast_join").toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), s"dim join shuffles:\n${p.take(1200)}")
  }

  test("q3 UNHINTED: size-based planning alone broadcasts both dim joins") {
    // BASELINE.md's caveat: the broadcast() hints in q3 are reference
    // fidelity; "the at-scale plan would let AQE decide". Prove the
    // hint is cosmetic — the same query WITHOUT hints, planned on a
    // clean cloned session (default autoBroadcastJoinThreshold, no
    // conf residue), must still pick BroadcastHashJoin for part and
    // supplier from parquet size statistics alone.
    import org.apache.spark.sql.functions.{col, lit, to_date}
    val s = spark.newSession()
    val li = sources.Tables.lineitem(s, sf)
      .filter(to_date(col("l_shipdate")) === lit(operators.Relational.ShipDate))
    val unhinted = li
      .join(sources.Tables.part(s, sf), col("l_partkey") === col("p_partkey"))
      .join(sources.Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("p_name"), col("s_name"))
    val plan = unhinted.queryExecution.sparkPlan
    val bhj = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b }
    assert(bhj.size == 2, s"expected 2 size-based broadcasts, got ${bhj.size}:\n" +
      plan.toString.take(1200))
    assert(!plan.toString.contains("SortMergeJoin"))
  }

  test("text wordcount scan prunes documents to the text column") {
    val s = scans("wordcount")
    assert(s.nonEmpty && s.head.requiredSchema.fieldNames.toSet == Set("text"))
  }

  test("dedup_exact scan prunes documents to (doc_id, text)") {
    val s = scans("dedup_exact")
    assert(s.nonEmpty && s.head.requiredSchema.fieldNames.toSet == Set("doc_id", "text"))
  }

  test("q42: all three box predicates (two ints + timestamp) reach the z3 scan pushed") {
    val s = scans("q42_zorder3_box")
    assert(s.nonEmpty)
    val pushed = s.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    for (c <- Seq("l_partkey", "l_suppkey", "l_shipdate"))
      assert(pushed.contains(s"GreaterThan($c") || pushed.contains(s"GreaterThanOrEqual($c"),
        s"$c range not pushed: $pushed")
  }

  test("graph_anf plans without Window and without cartesian products") {
    val p = sparkPlan("graph_anf").toString
    assert(!p.contains("Window"), "ANF merge regressed to a window sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("q62: the interval overlap join is an equi-join on (user, bucket), not a theta join") {
    // the chunked layout's whole point: pairs meet through hash keys,
    // never a BroadcastNestedLoopJoin over the row cross product
    val p = sparkPlan("q62_interval_overlap").toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "overlap join degenerated to a theta join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "no hash/merge equi-join found")
  }

  test("q34: the day filter prunes to exactly one partition directory") {
    import org.apache.spark.sql.functions._
    val path = graft.operators.ScaleOps.partitionedEventsPath(spark, sf)
    val ev = spark.read.parquet(path)
    val day = ev.agg(min(col("day")).cast("long")).head().getLong(0) + 3
    val sliced = ev.filter(col("day") === day)
    val scan = sliced.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.nonEmpty, "day filter did not become a partition filter")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).length == 1,
      "more than one partition directory survives the filter")
  }

  test("io_partitioned_write: the type filter prunes to exactly the two selected directories") {
    val pruned = graft.sources.IoRoundtrip.partitionedPruned(spark, sf)
    val scan = pruned.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.nonEmpty,
      "event_type filter did not become a partition filter")
    val dirs = scan.relation.location.listFiles(scan.partitionFilters, Nil).length
    assert(dirs == graft.sources.IoRoundtrip.PrunedTypes.length,
      s"$dirs partition directories survive a ${graft.sources.IoRoundtrip.PrunedTypes.length}-type filter")
  }

  test("dynamic partition pruning fires on a dim-filtered join against the partitioned layout") {
    import org.apache.spark.sql.functions._
    import SparkSpec.spark.implicits._
    val path = graft.operators.ScaleOps.partitionedEventsPath(spark, sf)
    val ev = spark.read.parquet(path)
    val d0 = ev.agg(min(col("day")).cast("long")).head().getLong(0)
    // dim key must match the inferred partition-column type EXACTLY (a
    // cast on the partition side defeats the rule), and the dim must be
    // a FILE source: a local relation's filter is constant-folded away
    // before the pruning rule can see a selective predicate
    val dayType = ev.schema("day").dataType.simpleString
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Seq((d0, "keep"), (d0 + 1, "drop"), (d0 + 2, "drop"))
      .toDF("day0", "tag")
      .select(col("day0").cast(dayType).as("day"), col("tag"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val conf = spark.conf
    val saved = conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val j = ev.join(dim, ev("day") === dim("day"))
      val plan = j.queryExecution.sparkPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n${plan.take(1200)}")
    } finally conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", saved)
  }

  test("q61: DynamicPruningExpression lands on the registered query's fact scan") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    // tiny-SF stats under-estimate the pruning benefit; the production
    // posture (real partition counts) doesn't need the toggle
    conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val plan = graft.operators.ScaleOps.q61DppJoin(spark, sf)
        .queryExecution.sparkPlan.toString.toLowerCase
      assert(plan.contains("dynamicpruning"),
        s"registered q61 plans without dynamic partition pruning:\n${plan.take(1500)}")
    } finally conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", saved)
  }

  test("similarity tier ranks through the heap aggregate, not a per-query window") {
    // a Window.partitionBy(qid) would collapse the scored 100 TB stream
    // onto |Q| tasks and fully sort each; the top_k_pairs form shuffles
    // ≤ k rows per query per partition (VERDICT r3 #1/#2)
    for (q <- Seq("sim_cosine_topk", "sim_ann_lsh", "sim_ann_ivf")) {
      val p = sparkPlan(q).toString
      assert(!p.contains("Window"), s"$q still plans a Window:\n${p.take(1200)}")
      assert(p.contains("top_k_pairs"), s"$q does not rank via top_k_pairs")
    }
  }

  test("sim_ann_ivf assigns cells map-side: no shuffle before the probe join") {
    // cell assignment is array_max(transform(...)) over one broadcast
    // centroid array — the N×|centroids| expansion of the old window
    // argmax must not reappear as an Exchange under the corpus scan
    val p = sparkPlan("sim_ann_ivf")
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    // allowed shuffles: the final top_k_pairs group-by (and nothing per-row)
    assert(exchanges.size <= 2,
      s"unexpected shuffles (${exchanges.size}):\n${p.toString.take(1500)}")
  }

  test("sim_knn_graph ranks all N nodes through the heap aggregate, not a window") {
    // the k-NN graph makes EVERY vector a query — a per-node window
    // would sort the full candidate stream on |V| tasks; the heap form
    // caps emission at k per node per partition
    val p = sparkPlan("sim_knn_graph").toString
    assert(!p.contains("Window"), s"knn graph plans a Window:\n${p.take(1200)}")
    assert(p.contains("top_k_pairs"), "knn graph does not rank via top_k_pairs")
  }

  test("graph_walks steps are equi-joins: no Generate under the walk joins") {
    // each step must be two |walks|-sized equi-joins (degree, (src,idx))
    // — a neighborhood explode (Generate) would cost deg(u) rows per
    // walk and melt on hub nodes
    val p = sparkPlan("graph_walks")
    val generates = p.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g }
    assert(generates.isEmpty, s"walk step explodes neighborhoods:\n${p.toString.take(1200)}")
    assert(p.toString.contains("SortMergeJoin") || p.toString.contains("BroadcastHashJoin"))
  }

  test("cur_ccnet_buckets: corpus rank runs in (lang, score) tie groups") {
    // the doc-level rank must come from the tie-group row_number (≥2
    // partition keys) — a corpus row_number over PARTITION BY lang
    // would put each language on one reducer at scale. The one
    // single-key window allowed is the cumulative sum over the (lang,
    // score) HISTOGRAM, whose input is aggregate-sized, and it must
    // sit above a groupBy (HashAggregate), not the raw doc stream.
    val plan = sparkPlan("cur_ccnet_buckets")
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.exists(_.partitionSpec.size >= 2),
      "no tie-group window — doc ranks would run per-language")
    for (w <- windows if w.partitionSpec.size < 2)
      assert(w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
          case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
        }.nonEmpty,
        s"single-key window over non-aggregated input:\n${w.toString.take(600)}")
  }

  test("sim_ann_pq ranks both stages through heap aggregates, not windows") {
    // ADC shortlist AND exact re-rank go through top_k_pairs; a Window
    // would collapse the corpus-sized scored stream onto |Q| tasks
    val p = sparkPlan("sim_ann_pq").toString
    assert(!p.contains("Window"), s"PQ plans a Window:\n${p.take(1200)}")
    assert(p.contains("top_k_pairs"))
  }

  test("ml_kmeans assignment expands nothing: no per-row centroid join") {
    // assignment is array_max(transform(cs, ...)) over ONE broadcast
    // 1-row centroid array — the N×k row expansion a join would cause
    // must not appear; generated code references the transform
    val p = sparkPlan("ml_kmeans").toString
    assert(!p.contains("Window"), "kmeans plans a Window")
    assert(p.contains("array_max") || p.contains("transform"),
      s"no in-row argmax found:\n${p.take(1200)}")
  }

  test("domain-mix selection sorts only the cut bucket, not the corpus") {
    // the Window in the histogram path may only consume the boundary
    // bucket's rows: its input subtree must carry the __b = __cutb
    // filter; the keep-all branch must be window-free
    val p = sparkPlan("cur_domain_mix")
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    // one tiny CDF window over the histogram + one boundary-bucket
    // ranking window — and the ranking window's input is filtered
    assert(windows.nonEmpty, "expected the histogram CDF window")
    val rankWin = windows.filter(_.toString().contains("row_number"))
    assert(rankWin.nonEmpty, "boundary ranking window missing")
    rankWin.foreach { w =>
      val sub = w.child.toString()
      assert(sub.contains("__cutb"),
        s"ranking window input not restricted to the cut bucket:\n${sub.take(800)}")
    }
  }

  test("winnow fingerprint extraction is in-row: no shuffle before the sketch explode") {
    // shingle hashing + window-min selection happen in transform/slice/
    // array_min over the token array — the per-doc sketch must leave the
    // scan task fully formed (shuffles only from the df-cap + pair join)
    val fps = graft.api.GraftOps.winnowFingerprints(
      graft.sources.Tables.documents(spark, sf), "doc_id", "text")
    val exchanges = fps.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"fingerprint extraction shuffles (${exchanges.size})")
  }

  test("sim_ann_ivfpq ranks through heap aggregates and encodes map-side") {
    val p = sparkPlan("sim_ann_ivfpq").toString
    assert(!p.contains("Window"), s"IVF-PQ plans a Window:\n${p.take(1200)}")
    assert(p.contains("top_k_pairs"))
  }

  test("q36_skyline's global window consumes only local-skyline survivors") {
    // phase 2's un-partitioned window would be a single-task sort of the
    // corpus if fed the raw points; its input subtree must carry phase
    // 1's partitioned runmax filter
    val p = sparkPlan("q36_skyline")
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size >= 2, "expected local + global skyline windows")
    // the LAST window in execution order (first in top-down collect) is
    // the global one; its child must contain the phase-1 filter on runmax
    val global = windows.head
    assert(global.child.toString().contains("runmax"),
      s"global window input unfiltered:\n${global.child.toString().take(800)}")
  }

  test("q35_histogram bounds come from a broadcast, not a collect") {
    val p = sparkPlan("q35_histogram").toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"histogram bounds not broadcast:\n${p.take(1200)}")
  }

  test("q37_funnel plans no windows: conditional-min aggs only") {
    val p = sparkPlan("q37_funnel")
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "funnel must not sort per-user event sequences")
  }

  test("q40: the runtime bloom filter lands on the fact side of the join") {
    val df = graft.operators.ScaleOps.q40RuntimeFilter(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"no runtime bloom filter injected:\n${opt.take(1500)}")
    // and it guards the FACT scan: the filter must sit above lineitem,
    // not the already-selective orders side
    val factSide = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("might_contain") => f
    }
    assert(factSide.exists(_.toString.contains("l_orderkey")),
      "bloom filter did not land on the lineitem side")
  }

  test("graph_jaccard: wedge self-join reuses the cap window's part partitioning") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = sparkPlan("graph_jaccard")
    // at toy SF the capped side broadcasts (BHJ); at scale it's an SMJ
    // on part — either way the cap must not add a shuffle of its own
    val wedge = plan.collect { case j: BaseJoinExec
      if j.leftKeys.exists(_.toString.contains("l_partkey")) => j }
    assert(wedge.nonEmpty, s"wedge self-join not found:\n${plan.toString.take(1500)}")
    // the hub cap must be free: the row_number window already
    // hash-partitions by part, exactly what the wedge join needs —
    // no Exchange may appear between the window and the join
    def exchangesAboveWindow(p: SparkPlan): Int =
      if (p.getClass.getSimpleName.startsWith("Window")) 0
      else (p match { case _: ShuffleExchangeExec => 1; case _ => 0 }) +
        p.children.map(exchangesAboveWindow).sum
    wedge.head.children.foreach { side =>
      assert(exchangesAboveWindow(side) == 0,
        s"extra shuffle between cap window and wedge join:\n${side.toString.take(1200)}")
    }
  }

  test("cur_mix_temperature: the rate table joins as broadcast; corpus never sorts") {
    val p = sparkPlan("cur_mix_temperature").toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    // the only Sort is the final |langs|-row presentation orderBy
    val sorts = sparkPlan("cur_mix_temperature").collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(sorts.size <= 1, s"unexpected global sorts: ${sorts.size}")
  }

  test("cur_dsir: the 128-row model broadcasts back; selection is a threshold, not a sort") {
    val p = sparkPlan("cur_dsir").toString
    assert(p.contains("BroadcastHashJoin"), "log-ratio model join should broadcast")
    val sorts = sparkPlan("cur_dsir").collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(sorts.size <= 1, "selection must not globally sort the corpus")
  }

  test("q47_assoc_rules: order-total rides as broadcast; scan prunes to (orderkey, partkey)") {
    val s = scans("q47_assoc_rules")
    assert(s.nonEmpty &&
      s.head.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_partkey"))
    assert(sparkPlan("q47_assoc_rules").toString.contains("BroadcastNestedLoopJoin") ||
      sparkPlan("q47_assoc_rules").toString.contains("BroadcastExchange"))
  }

  test("ml_linear_reg: one pass — a single scan, no joins") {
    val plan = sparkPlan("ml_linear_reg")
    assert(scans("ml_linear_reg").size == 1)
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, "moment fit must not join")
  }

  test("hot paths stay inside whole-stage codegen") {
    // run the query first: under AQE, codegen stages appear in the
    // executed plan only once stages have materialized
    for (q <- Seq("q1_filter_count", "q6_revenue", "text_tokens", "sim_radius")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      // codegen stages render as "*(n) Operator" in the simple plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), s"$q has no codegen span:\n${p.take(800)}")
    }
  }
}
