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
  * Contract: operators persist through [[track]]; harness layers wrap
  * each query in [[scoped]] and release the returned [[Scope]] after
  * consuming that query's result. Scoping is PER QUERY, not global:
  * with concurrent queries in one session, releasing one query's scope
  * can never unpersist another query's in-flight cache (for
  * `Corpus.mixtureSample` the persist is load-bearing for the two-pass
  * bit-exactness argument). Tracks outside any scope land in a global
  * fallback queue drained by [[release]], so un-scoped callers keep the
  * old semantics. Releasing is lazy-safe: `unpersist(blocking = false)`
  * only drops the cache entry, never the data's correctness — an
  * unconsumed plan recomputes.
  */
object Caches {

  /** The persists of one query. [[release]] drops exactly these. */
  final class Scope private[Caches] () {
    private[Caches] val live = new ConcurrentLinkedQueue[Dataset[_]]()
    def release(): Unit = drain(live)
    private[Caches] def size: Int = live.size
  }

  private val global = new ConcurrentLinkedQueue[Dataset[_]]()
  // construction-time binding: track() runs while the query function
  // builds (and iterates) its plan on the calling thread, so a dynamic
  // variable scopes it correctly even with concurrent queries
  private val currentScope = new scala.util.DynamicVariable[Option[Scope]](None)

  /** Persist `ds` at `level` and remember it in the innermost [[scoped]]
    * block (or the global queue when none is active). */
  def track[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    currentScope.value match {
      case Some(s) => s.live.add(ds)
      case None => global.add(ds)
    }
    ds
  }

  /** Run `f` (a query's construction, including any iterative jobs it
    * drives) with its own scope; the caller releases the returned handle
    * after the result is fully consumed — the result is typically a lazy
    * DataFrame, so release cannot happen at block exit. */
  def scoped[T](f: => T): (T, Scope) = {
    val s = new Scope
    (currentScope.withValue(Some(s))(f), s)
  }

  /** Unpersist every GLOBALLY tracked frame (non-blocking) — the
    * fallback for callers that never scope. Scoped persists are released
    * through their own [[Scope]] handles, never from here. */
  def release(): Unit = drain(global)

  private def drain(q: ConcurrentLinkedQueue[Dataset[_]]): Unit = {
    var ds = q.poll()
    while (ds != null) {
      try ds.unpersist(false) catch { case _: Throwable => () }
      ds = q.poll()
    }
  }
}
