package graft

import graft.operators.EventAnalytics

/** q48_markov_transitions + q49_session_funnel behavior. */
class EventSeqSpec extends SparkSpec {

  test("markov transitions: rows per observed pair, probabilities sum to 1 per source state") {
    val out = EventAnalytics.q48MarkovTransitions(spark, sf).collect()
    assert(out.nonEmpty)
    val byFrom = out.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (f, rows) =>
      val s = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$f: probabilities sum to $s")
      assert(rows.forall(_.getAs[Long]("n") > 0))
    }
  }

  test("session funnel: stage counts monotone non-increasing, deterministic") {
    val out = EventAnalytics.q49SessionFunnel(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(out.length == EventAnalytics.FunnelStages.length)
    val ns = out.map(_.getAs[Long]("n_sessions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
      s"stages grew: ${ns.toSeq}")
    assert(ns.head > 0, "no sessions completed stage 1")
    val again = EventAnalytics.q49SessionFunnel(spark, sf).collect()
      .sortBy(_.getAs[String]("stage")).map(_.getAs[Long]("n_sessions"))
    assert(ns.sameElements(again))
  }
}
