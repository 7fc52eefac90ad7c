package graft

import graft.operators.ScaleOps
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order clustering must EARN its layout: the 2-D box scan over the
  * z-ordered copy has to decode materially fewer parquet rows than the
  * same scan over an unclustered copy of the identical data — that
  * row-group skip (footer min/max stats vs the pushed range filters)
  * is the entire point of the layout. Measured through executor input
  * metrics, the ground truth the reader can't fake. */
class ZOrderSpec extends SparkSpec {

  private def recordsRead(df: DataFrame): Long = {
    var total = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          total += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.collect()
      // listener events are async: poll until the counter stabilizes
      var prev = -1L
      var spins = 0
      while (total != prev && spins < 40) {
        prev = total; Thread.sleep(50); spins += 1
      }
      total
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("2-D box over the z-ordered layout decodes a fraction of the control scan") {
    val (zPath, pkSpan, skSpan) = ScaleOps.zorderedLineitem(spark, sf)
    // unclustered control: the SAME rows and file count, natural order
    val ctrlPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_lineitem_zctrl").toString
    sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"))
      .repartition(16)
      .write.mode("overwrite").parquet(ctrlPath)
    val (pkLo, pkHi) = (1 + pkSpan / 2, 1 + pkSpan / 2 + (pkSpan / 8).max(1))
    val (skLo, skHi) = (1 + skSpan / 2, 1 + skSpan / 2 + (skSpan / 8).max(1))
    def box(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(pkLo, pkHi) &&
        col("l_suppkey").between(skLo, skHi))
    // same answer from both layouts first — the layout is semantics-free
    val zCount = box(zPath).count()
    assert(zCount == box(ctrlPath).count())
    val zRead = recordsRead(box(zPath))
    val ctrlRead = recordsRead(box(ctrlPath))
    // natural order spreads the box over every file (each file's
    // min/max spans the table → zero skips); z-clustering confines it
    // to the few z-range files intersecting the box
    assert(zRead * 2 <= ctrlRead,
      s"z-order skipped too little: read $zRead vs control $ctrlRead")
  }
}
