package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Ownership registry for operator-internal `persist`s.
  *
  * Why this exists: a `Dataset.persist` entry lives in the session's
  * `CacheManager` until someone calls `unpersist` or the session stops.
  * The `ContextCleaner` does NOT reclaim it — the cleaner only collects
  * RDDs whose driver-side references have been garbage-collected, and
  * the CacheManager's `InMemoryRelation` holds a strong reference to the
  * cached RDD precisely so later plans can be rewritten onto it. So an
  * operator that persists an intermediate and returns a lazy DataFrame
  * leaks one MEMORY_AND_DISK entry per CALL for the JVM lifetime
  * (measured twice now: round 5's globalRank persist degraded the q84
  * trio by ~3×, and round 6's driver bench showed the same +44–54%
  * signature from the dedup-family persists — corpus-sized shingle
  * postings pinned three times per benched query: warm pass + two timed
  * passes).
  *
  * The persists themselves are load-bearing: `minhashLsh` feeds one
  * shingle index into the signature agg and BOTH verify-side posting
  * scans, and without the persist the shingling lineage re-runs per
  * consumer (ReuseExchange cannot bridge a partial-agg boundary). What
  * was missing is an OWNER for the entry's lifetime. The contract:
  *
  *  - Operators wrap internal persists in [[Caches.own]] instead of
  *    calling `.persist` directly. The entry's useful life is exactly
  *    one materialization of the returned plan — after the consuming
  *    action, recomputation-on-reuse is the correct trade (the consumer
  *    can always persist the RESULT it got back, which is small).
  *  - Harness code (Bench, Verify, TimeQ, ScaleSmoke — anything that
  *    materializes a query and moves on) calls [[Caches.sweep]] after
  *    each materialization. Library users running one query per job
  *    never need to: the session teardown releases everything.
  *
  * `sweep` uses `unpersist(blocking = false)`: the registry/CacheManager
  * bookkeeping is synchronous (the entry is gone immediately, so specs
  * can assert on `getPersistentRDDs`), only the executor block deletes
  * are async — by the time the next query materializes anything the
  * memory is back.
  */
object Caches {

  private val owned = new ConcurrentLinkedQueue[(Long, Dataset[_])]()

  /** Persist `ds` at `level` and register it for the next sweep. The
    * entry is tagged with the REGISTERING THREAD so concurrent
    * streaming queries (each trigger runs on its own stream-execution
    * thread) can release their own persists without unpersisting a
    * sibling stream's in-flight frame mid-materialization
    * ([[sweepOwn]]); single-threaded harnesses keep the drain-all
    * [[sweep]].
    */
  def own[T](ds: Dataset[T],
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    owned.add((Thread.currentThread().getId, ds))
    ds
  }

  /** Unpersist every registered dataset; returns how many were released.
    * Idempotent and safe at any time — unpersisting a plan that a later
    * action still needs only costs recomputation, never correctness.
    * Harness use only (Bench/Verify/TimeQ/ScaleSmoke own the whole
    * session); concurrent-stream code must use [[sweepOwn]].
    */
  def sweep(): Int = {
    var n = 0
    var e = owned.poll()
    while (e != null) {
      e._2.unpersist(blocking = false)
      n += 1
      e = owned.poll()
    }
    n
  }

  /** Unpersist only the entries THIS thread registered — the
    * per-trigger release for streaming loops, safe beside concurrent
    * queries in the same session.
    */
  def sweepOwn(): Int = {
    val me = Thread.currentThread().getId
    var n = 0
    val it = owned.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e._1 == me) {
        it.remove()
        e._2.unpersist(blocking = false)
        n += 1
      }
    }
    n
  }

  /** Entries currently awaiting a sweep (diagnostics / specs). */
  def pending: Int = owned.size()
}
