package graft

import graft.operators.Similarity

/** sim_kcenter: the Gonzalez invariant (pick distances are monotone
  * non-increasing) and determinism. */
class KCenterSpec extends SparkSpec {

  test("pick distances are monotone non-increasing; rounds complete") {
    val out = Similarity.simKCenter(spark, sf).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(out.length == Similarity.KCenterK)
    assert(out.head.getAs[Double]("dist_at_pick") == 0.0)
    val ds = out.tail.map(_.getAs[Double]("dist_at_pick"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"pick distances grew: ${ds.toSeq}")
    // all picks distinct
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length)
  }

  test("selection is deterministic") {
    val a = Similarity.simKCenter(spark, sf).collect().map(_.toString)
    val b = Similarity.simKCenter(spark, sf).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
