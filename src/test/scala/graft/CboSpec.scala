package graft

import org.apache.spark.sql.functions._

/** The 100 TB join-reorder story, demonstrated: ANALYZE TABLE column
  * stats + spark.sql.cbo drive the q8 snowflake plan WITHOUT any
  * broadcast() hints — dims broadcast from their (tiny, now known)
  * row counts, selectivity estimates come from column min/max, and a
  * deliberately scrambled join order still plans hash joins with no
  * cartesian product and returns the exact q8 answer. The registered
  * q8_region_revenue keeps its hinted form for oracle determinism;
  * this spec is the evidence that at cluster scale the same plan
  * falls out of statistics instead of hints. */
class CboSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private val tables = Seq("lineitem", "orders", "customer", "nation", "region")

  private def withCbo[A](body: => A): A = {
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.cbo.planStats.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      keys.foreach(conf.set(_, "true"))
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  private def analyzed(): Unit = tables.foreach { t =>
    if (!spark.catalog.tableExists(s"cbo_$t")) {
      spark.sql(s"CREATE TABLE cbo_$t USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  test("ANALYZE lands exact row counts on the optimized plan") {
    analyzed()
    withCbo {
      val nation = spark.table("cbo_nation").queryExecution.optimizedPlan.stats
      assert(nation.rowCount.contains(BigInt(25)), s"nation stats: $nation")
      val region = spark.table("cbo_region").queryExecution.optimizedPlan.stats
      assert(region.rowCount.contains(BigInt(5)), s"region stats: $region")
      val li = spark.table("cbo_lineitem").queryExecution.optimizedPlan.stats
      assert(li.rowCount.contains(BigInt(spark.table("cbo_lineitem").count())))
    }
  }

  test("column min/max stats produce a selective (not table-sized) filter estimate") {
    analyzed()
    withCbo {
      val full = spark.table("cbo_orders").queryExecution.optimizedPlan.stats.rowCount.get
      val cut = spark.sql(
        "SELECT * FROM cbo_orders WHERE o_totalprice < 1000.0")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(cut.isDefined, "CBO produced no estimate for the range filter")
      assert(cut.get < full, s"estimate ${cut.get} not below table rows $full")
    }
  }

  test("q8 snowflake with NO hints and a scrambled join order: stats give broadcast dims, no cartesian, exact answer") {
    analyzed()
    withCbo {
      // dims-first left-deep order (the 'wrong way round' — fact last),
      // zero broadcast() hints anywhere
      val df = spark.sql(
        """SELECT r_name AS region,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM cbo_region
           JOIN cbo_nation   ON n_regionkey = r_regionkey
           JOIN cbo_customer ON c_nationkey = n_nationkey
           JOIN cbo_orders   ON o_custkey = c_custkey
             AND to_date(o_orderdate) BETWEEN '1996-01-01' AND '1996-12-31'
           JOIN cbo_lineitem ON l_orderkey = o_orderkey
           GROUP BY r_name ORDER BY region""")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"),
        "scrambled join order planned a cartesian product")
      val nBroadcast = "BroadcastHashJoin".r.findAllIn(phys).length
      assert(nBroadcast >= 2,
        s"expected the nation+region dims to broadcast without hints, got $nBroadcast:\n$phys")
      // the stats-driven plan computes the exact hinted-q8 answer
      val expected = graft.operators.Relational.q8RegionRevenue(spark, dir)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == expected, s"CBO plan answer diverged: $got vs $expected")
    }
  }
}
