package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}

/** Registry of memoized executor state CREATED BY THIS LIBRARY, so that
  * [[graft.SparkEntry.releaseMemos]] can free graft's blocks without
  * touching anything the host application persisted on the same
  * SparkContext.
  *
  * Earlier rounds released memory by unpersisting EVERY persistent RDD
  * and clearing the whole CacheManager — correct in the dedicated
  * bench/verify harness, but destructive in a shared session: a host
  * app's own localCheckpoint-backed frames become unrecomputable
  * (lineage already truncated ⇒ missing-block errors on the next
  * action) and its cache()d tables silently lose their
  * materialization. This registry records, at creation time, the RDD
  * ids of every frame graft memoizes via `.memoized()` /
  * `GraftOps.truncate` and a handle to every Dataset graft `.cache()`s
  * via `.memoCached()`; release walks ONLY that set.
  *
  * Id capture reads the `rdd` of the `LogicalRDD` leaf that
  * `localCheckpoint()`/`checkpoint()` returns (via reflection — the
  * accessor is a public case-class field but the class itself is
  * sql-package-scoped). Reliable `checkpoint()` frames register too;
  * unpersisting an RDD that was never block-persisted is a no-op, so
  * the release path is uniform across both truncation modes.
  */
object Memo {
  private val rddIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  private val cachedFrames =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Dataset[_]]()

  /** RDD ids of the LogicalRDD leaves of a (local)checkpointed frame. */
  private def leafRddIds(ds: Dataset[_]): Seq[Int] =
    ds.queryExecution.analyzed.collectLeaves().flatMap { leaf =>
      try leaf.getClass.getMethod("rdd").invoke(leaf) match {
        case r: org.apache.spark.rdd.RDD[_] => Some(r.id)
        case _ => None
      } catch { case _: ReflectiveOperationException => None }
    }

  /** Record a frame already truncated by (local)checkpoint. */
  def register[T](checkpointed: Dataset[T]): Dataset[T] = {
    leafRddIds(checkpointed).foreach(id => rddIds.add(id))
    checkpointed
  }

  /** Record a frame graft has `.cache()`d (CacheManager entry). */
  def registerCached[T](cached: Dataset[T]): Dataset[T] = {
    cachedFrames.add(cached)
    cached
  }

  /** Free graft-created memo state ONLY: unpersist the tracked
    * checkpoint block RDDs still persistent, drop the tracked
    * CacheManager entries. Host-app persisted RDDs and cached tables
    * are untouched. */
  def releaseAll(spark: SparkSession): Unit = {
    val persistent = spark.sparkContext.getPersistentRDDs
    rddIds.forEach { id =>
      persistent.get(id).foreach(_.unpersist(blocking = false))
    }
    rddIds.clear()
    cachedFrames.forEach(_.unpersist(blocking = false))
    cachedFrames.clear()
  }

  /** Count of tracked (not-yet-released) memo entries — spec hook. */
  def trackedCount: Int = rddIds.size() + cachedFrames.size()

  /** `.memoized()` / `.memoCached()` — tracked siblings of
    * `localCheckpoint()` / `cache()`. Every memoization inside graft
    * goes through one of these (HygieneSpec polices raw calls). */
  implicit class MemoOps[T](private val ds: Dataset[T]) extends AnyVal {
    def memoized(): Dataset[T] = register(ds.localCheckpoint())
    def memoCached(): Dataset[T] = registerCached(ds.cache())
  }
}
