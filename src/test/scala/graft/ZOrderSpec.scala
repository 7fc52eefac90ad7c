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

  test("3-D mixed-type box skip survives AQE partition coalescing") {
    val (zPath, pkSpan, skSpan, d0s, daySpan) = ScaleOps.z3orderedLineitem(spark, sf)
    val ctrlPath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_lineitem_z3ctrl").toString
    sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .repartition(16)
      .write.mode("overwrite").parquet(ctrlPath)
    val (pkLo, pkHi) = (1 + pkSpan / 2, 1 + pkSpan / 2 + (pkSpan / 8).max(1))
    val (skLo, skHi) = (1 + skSpan / 2, 1 + skSpan / 2 + (skSpan / 8).max(1))
    val (dLo, dHi) = (daySpan / 2, daySpan / 2 + (daySpan / 8).max(1))
    val d0 = java.time.LocalDate.parse(d0s)
    val tsLo = lit(d0.plusDays(dLo).toString + " 00:00:00").cast("timestamp")
    val tsHiX = lit(d0.plusDays(dHi + 1).toString + " 00:00:00").cast("timestamp")
    // a groupBy AFTER the box scan gives AQE a shuffle whose partitions
    // it will coalesce (the box output is tiny) — the row-group skip
    // must hold through exactly that runtime re-plan, since scan-level
    // pruning is decided per file split, before AQE touches the shuffle
    def boxAgg(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(pkLo, pkHi) &&
        col("l_suppkey").between(skLo, skHi) &&
        col("l_shipdate") >= tsLo && col("l_shipdate") < tsHiX)
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // layout is semantics-free under the re-plan
      val zRows = boxAgg(zPath).collect().toSet
      assert(zRows == boxAgg(ctrlPath).collect().toSet)
      assert(zRows.nonEmpty)
      val zRead = recordsRead(boxAgg(zPath))
      val ctrlRead = recordsRead(boxAgg(ctrlPath))
      assert(zRead * 2 <= ctrlRead,
        s"z3 skip lost under AQE coalescing: read $zRead vs control $ctrlRead")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
