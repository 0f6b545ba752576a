package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for intra-query persists so they cannot outlive their query
  * in a long-lived session.
  *
  * Several operators persist a mid-pipeline frame that is consumed by
  * more than one downstream pass (the cleaned corpus before the mixture
  * fan-out, the mixture candidate slice, the bigram vocabulary, the
  * cluster edge list). `Dataset.persist` registers the plan in Spark's
  * CacheManager, which holds a strong reference — so unlike a raw
  * cached RDD, the block is NOT reclaimed by ContextCleaner when the
  * frame goes out of scope. In per-query sessions that's harmless (the
  * session dies with the query); in a shared session replaying the full
  * suite it is a storage-memory leak that evicts later queries' shuffle
  * blocks.
  *
  * Contract: operators persist through [[track]]; harness layers
  * (Verify, Bench, long-lived callers) call [[release]] after consuming
  * each query's result. Releasing is lazy-safe: `unpersist(blocking =
  * false)` only drops the cache entry, never the data's correctness —
  * an unconsumed plan recomputes.
  */
object Caches {
  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at `level` and remember it for [[release]]. */
  def track[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    live.add(ds)
    ds
  }

  /** Unpersist every tracked frame (non-blocking). Call after the
    * query's result has been fully consumed (collected / written). */
  def release(): Unit = {
    var ds = live.poll()
    while (ds != null) {
      try ds.unpersist(false) catch { case _: Throwable => () }
      ds = live.poll()
    }
  }
}
