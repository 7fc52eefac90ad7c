package graft

import graft.operators.{CurationQuality, Repetition}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** v3 pipeline: the repetition gate composes monotonically — it can
  * only shrink the corpus v2 builds (value parity vs the six-stage
  * DuckDB replay is the Verify gate). */
class PipelineV3Spec extends SparkSpec {

  test("cur_pipeline_v3 ⊆ cur_pipeline_v2 per split; gate fires on the corpus") {
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v2 = counts(CurationQuality.pipelineV2(spark, sf))
    val v3 = counts(CurationQuality.pipelineV3(spark, sf))
    for ((split, (n3, t3)) <- v3) {
      val (n2, t2) = v2.getOrElse(split, (0L, 0L))
      assert(n3 <= n2 && t3 <= t2, s"$split grew: v3=($n3,$t3) v2=($n2,$t2)")
    }
    // the gate itself must be live on this corpus (fires on some docs)
    val flagged = Repetition.signals(Tables.documents(spark, sf))
      .filter(col("repetitive")).count()
    assert(flagged > 0, "no repetitive docs at this SF — gate is vacuous")
  }
}
