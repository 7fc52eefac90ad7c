package graft

import graft.operators.{CurationQuality, Mixing}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** v4 pipeline (seven stages, + DSIR gate and √-temperature language
  * mix): both new stages must be LIVE on this corpus — a gate that
  * never fires is vacuous — and the chain must shrink the corpus
  * strictly below the quality-filter count (value parity vs the
  * seven-stage DuckDB replay is the Verify gate). */
class PipelineV4Spec extends SparkSpec {

  test("cur_pipeline_v4: both mixture stages live, chain strictly shrinks, deterministic") {
    val out = CurationQuality.pipelineV4(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("train", "val", "test")(r.getString(0))))
    val total = out.map(_.getLong(1)).sum
    val qualityKept = CurationQuality.qualityFilter(spark, sf)
      .filter(col("keep")).count()
    assert(total < qualityKept,
      s"seven-stage chain kept $total of $qualityKept quality survivors — nothing downstream fired")
    // DSIR gate live: the corpus has docs on both sides of w = 0
    val w = Mixing.dsirWeights(Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("w_micro")).collect().map(_.getLong(0))
    assert(w.exists(_ > 0) && w.exists(_ <= 0), "DSIR gate vacuous on this corpus")
    // temperature mix live: at least one language is actually downsampled
    val rates = Mixing.mixTemperature(spark, sf).collect()
      .map(_.getAs[Long]("rate_bp"))
    assert(rates.exists(_ < Mixing.RateGrid), "temperature mix vacuous")
    // deterministic
    val again = CurationQuality.pipelineV4(spark, sf).collect()
    assert(out.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("cur_dataset_card: all metrics present, rates bounded, counts consistent") {
    val card = CurationQuality.datasetCard(spark, sf).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(card.size == 8)
    assert(card("01_n_docs") == Tables.documents(spark, sf).count().toDouble)
    assert(card("06_quality_keep_rate") >= 0 && card("06_quality_keep_rate") <= 1)
    assert(card("07_contamination_rate") >= 0 && card("07_contamination_rate") <= 1)
    assert(card("03_mean_doc_tokens") > 0)
    assert(card("08_near_dup_pairs") >= 0)
  }
}
