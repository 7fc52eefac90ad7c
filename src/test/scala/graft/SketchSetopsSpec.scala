package graft

import graft.operators.Relational

/** q46_sketch_setops: theta-style KMV set-operation estimates.
  *  - Below k distinct values (sf0.001) the sketches are complete and
  *    every estimate must equal its exact count.
  *  - Saturated (sf0.01) the estimates must sit inside classic KMV
  *    error bands around the exact counts.
  */
class SketchSetopsSpec extends SparkSpec {

  test("unsaturated sketches collapse to exact counts (sf0.001)") {
    val r = Relational.q46SketchSetops(spark, sf).collect()(0)
    assert(r.getAs[Double]("est_a") == r.getAs[Long]("exact_a").toDouble)
    assert(r.getAs[Double]("est_b") == r.getAs[Long]("exact_b").toDouble)
    assert(r.getAs[Double]("est_union") == r.getAs[Long]("exact_union").toDouble)
    assert(r.getAs[Double]("est_inter") == r.getAs[Long]("exact_inter").toDouble)
    // the split is non-degenerate: both sides and the overlap non-empty
    assert(r.getAs[Long]("exact_a") > 0 && r.getAs[Long]("exact_b") > 0)
    assert(r.getAs[Long]("exact_inter") > 0)
  }

  test("saturated sketches estimate within KMV error bands (sf0.01)") {
    val r = Relational.q46SketchSetops(spark, "/root/testdata/sf0.01").collect()(0)
    val k = Relational.KmvK
    def rel(est: Double, exact: Long): Double =
      math.abs(est - exact) / exact.toDouble
    // base/union sketches: σ ≈ 1/√(k−2); allow 4σ
    val band = 4.0 / math.sqrt((k - 2).toDouble)
    assert(rel(r.getAs[Double]("est_a"), r.getAs[Long]("exact_a")) < band)
    assert(rel(r.getAs[Double]("est_b"), r.getAs[Long]("exact_b")) < band)
    assert(rel(r.getAs[Double]("est_union"), r.getAs[Long]("exact_union")) < band)
    // intersection adds the ρ-estimate's binomial variance — wider band
    assert(rel(r.getAs[Double]("est_inter"), r.getAs[Long]("exact_inter")) < 2 * band)
  }

  test("union estimate is at least each side's estimate") {
    val r = Relational.q46SketchSetops(spark, "/root/testdata/sf0.01").collect()(0)
    assert(r.getAs[Double]("est_union") >= r.getAs[Double]("est_a") - 1e-9)
    assert(r.getAs[Double]("est_union") >= r.getAs[Double]("est_b") - 1e-9)
  }
}
