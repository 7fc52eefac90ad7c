package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixing

/** cur_mix_temperature + cur_dsir behavior:
  *  - temperature rates: smallest language kept whole, rates monotone
  *    non-increasing in language size, realized counts within the
  *    hash ladder's tolerance of rate·n.
  *  - dsir: weights are deterministic across runs, target-language
  *    docs score higher on average than non-target (the importance
  *    signal points the right way), and every doc gets a weight.
  */
class MixingSpec extends SparkSpec {

  test("mix_temperature keeps the smallest language whole; rates decrease with size") {
    val out = Mixing.mixTemperature(spark, sf).collect()
    assert(out.nonEmpty)
    val bySize = out.sortBy(r => r.getAs[Long]("n_docs"))
    // smallest language: sqrt(nmin/nmin)=1 → rate_bp = 10000 → all kept
    val smallest = bySize.head
    assert(smallest.getAs[Long]("rate_bp") == Mixing.RateGrid)
    assert(smallest.getAs[Long]("n_kept") == smallest.getAs[Long]("n_docs"))
    // rates monotone non-increasing as n_docs grows
    val rates = bySize.map(_.getAs[Long]("rate_bp"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a >= b })
    // kept counts never exceed the stratum
    assert(out.forall(r => r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs")))
  }

  test("mix_temperature realized counts track rate·n (hash ladder is unbiased)") {
    val out = Mixing.mixTemperature(spark, sf).collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs").toDouble
      val exp = n * r.getAs[Long]("rate_bp").toDouble / Mixing.RateGrid
      val got = r.getAs[Long]("n_kept").toDouble
      // 4σ binomial band (loose at sf0.001 strata sizes)
      val sigma = math.sqrt(exp * math.max(0.01, 1 - exp / n))
      assert(math.abs(got - exp) <= 4 * sigma + 2,
        s"${r.getAs[String]("lang")}: kept $got, expected ~$exp")
    }
  }

  test("dsir weights: every doc scored, deterministic, signal points at the target") {
    val df = Mixing.dsir(spark, sf)
    val rows = df.collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    // deterministic across re-computation
    val again = Mixing.dsir(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    // the importance signal separates target from raw on average
    val (tgt, raw) = rows.partition(_.getAs[String]("lang") == Mixing.TargetLang)
    val meanT = tgt.map(_.getAs[Long]("w_micro").toDouble).sum / tgt.length
    val meanR = raw.map(_.getAs[Long]("w_micro").toDouble).sum / raw.length
    assert(meanT > meanR,
      s"target mean $meanT should exceed raw mean $meanR")
  }

  test("dsir keep flag matches the weight threshold") {
    val rows = Mixing.dsir(spark, sf).collect()
    assert(rows.forall(r =>
      r.getAs[Boolean]("keep") == (r.getAs[Long]("w_micro") > 0)))
  }
}
