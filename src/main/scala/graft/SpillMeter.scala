package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-run spill/shuffle-volume meter (r15 verdict item 5): the sf10
  * soak's two failures were DISK exhaustion — the box ran out of /tmp
  * for shuffle + sort spill late in the 29-entry sweep — and the soak
  * table measured heap but not disk, so the resource that actually
  * failed was invisible. This listener accumulates the three
  * task-metric volumes that consume scratch disk (disk bytes spilled,
  * memory bytes spilled, shuffle bytes written); Bench snapshots the
  * counters around each timed query and reports per-query deltas in
  * bench_out.json, giving the soak a measured disk budget per entry.
  *
  * Attribution caveat: task-end events post to the listener bus
  * asynchronously, so a query boundary can credit the tail of query
  * A's events to B. Fine for the soak's budget-sizing purpose (the
  * dominant spillers are seconds long); not a profiler.
  */
object SpillMeter {
  private val disk = new AtomicLong(0L)
  private val mem = new AtomicLong(0L)
  private val shufWrite = new AtomicLong(0L)
  @volatile private var installed = false

  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!installed) {
      installed = true
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            disk.addAndGet(m.diskBytesSpilled)
            mem.addAndGet(m.memoryBytesSpilled)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    }
  }

  /** (diskBytesSpilled, memoryBytesSpilled, shuffleBytesWritten) so far. */
  def snapshot(): (Long, Long, Long) = (disk.get, mem.get, shufWrite.get)
}
