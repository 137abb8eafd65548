package graft.operators

import org.apache.spark.sql.Dataset

/** Registry for graft's CALLER-lifecycle caches — the intra-operator
  * persists whose returned frame is lazy, so the operator itself can
  * never unpersist them (the fill happens when the CALLER materializes
  * the result): winnow's fingerprint/eligible frames, the bloom-probe
  * accepted slivers, the line-dedup frequent set.
  *
  * Spark's ContextCleaner does NOT reclaim Dataset caches when the
  * frame is GC'd — they sit in the session's CacheManager until an
  * explicit unpersist or `spark.catalog.clearCache()`. A one-shot
  * query never notices; a long-lived driver running many increments
  * accumulates cached RDDs without this hook. The contract, now code
  * instead of scattered Scaladoc prose: every such persist registers
  * here, and incremental/streaming callers invoke [[release]] between
  * batches (after materializing the batch's outputs — release drops
  * the caches the CURRENT batch's lazy results still read, exactly
  * like clearCache would). `spark.catalog.clearCache()` remains a
  * superset escape hatch; release() is the targeted form that leaves
  * caller-owned caches alone.
  */
object GraftCaches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register an operator-created, caller-lifecycle cache. Returns the
    * dataset for inline use. The registry holds a strong reference to
    * the (small) Dataset handle — the cached BLOCKS are the leak being
    * managed, and they outlive any weak reference anyway. */
  private[graft] def register[T](ds: Dataset[T]): Dataset[T] =
    synchronized { live += ds; ds }

  /** Unpersist every registered cache and empty the registry. Safe to
    * call repeatedly and concurrently with registration; unpersisting
    * an already-unpersisted frame is a no-op. Drops caches across ALL
    * sessions — the single-driver shape; a JVM hosting several
    * independent pipelines on separate sessions uses the
    * session-scoped overload so one pipeline's between-batch release
    * cannot drop another's live caches mid-computation. */
  def release(): Unit = synchronized {
    live.foreach { ds =>
      try { ds.unpersist(blocking = false); () }
      catch { case _: Throwable => () }
    }
    live.clear()
  }

  /** [[release]] scoped to one session's caches (identity compare —
    * a Dataset knows the session that created it). */
  def release(spark: org.apache.spark.sql.SparkSession): Unit =
    synchronized {
      val (mine, others) = live.partition(_.sparkSession eq spark)
      mine.foreach { ds =>
        try { ds.unpersist(blocking = false); () }
        catch { case _: Throwable => () }
      }
      live.clear()
      live ++= others
      ()
    }

  /** Registered-but-unreleased cache count (spec instrument). */
  def liveCount: Int = synchronized { live.size }
}
