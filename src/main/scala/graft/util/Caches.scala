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
  *  - Concurrent streams (each trigger on its own stream-execution
  *    thread) wrap each trigger body in [[Caches.scoped]], which
  *    releases exactly that trigger's persists at scope exit — even on
  *    a throwing trigger — without unpersisting a sibling stream's
  *    in-flight frames. Ownership is an explicit SCOPE TOKEN carried in
  *    a ThreadLocal, not the raw thread id: JVM thread ids are reused,
  *    so id-keyed ownership could hand a dead stream's entries to an
  *    unrelated new thread (which would then unpersist frames it never
  *    owned), and a thread that died mid-trigger would leave entries
  *    that LOOK owned by its id's next tenant. A token is unique for
  *    the scope's lifetime; entries whose scope died unreleased are
  *    inert until a harness-wide [[sweep]] (documented leak-until-sweep,
  *    never misattribution).
  *
  * `sweep`/scope release use `unpersist(blocking = false)`: the
  * registry/CacheManager bookkeeping is synchronous (the entry is gone
  * immediately, so specs can assert on `getPersistentRDDs`), only the
  * executor block deletes are async — by the time the next query
  * materializes anything the memory is back.
  */
object Caches {

  /** Opaque ownership token — one per [[scoped]] invocation. */
  private final class Scope

  private val current = new ThreadLocal[Scope]()

  private val owned = new ConcurrentLinkedQueue[(Scope, Dataset[_])]()

  /** Persist `ds` at `level` and register it for release: to the
    * enclosing [[scoped]] block's exit if one is active on this
    * thread, else to the next harness-wide [[sweep]].
    */
  def own[T](ds: Dataset[T],
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    owned.add((current.get(), ds))
    ds
  }

  /** Run `body` under a fresh ownership scope and release exactly the
    * persists it [[own]]ed on the way out — throwing included (a failed
    * trigger must not pin its caches for the session's remaining
    * lifetime). Scopes nest: an inner scope releases only its own
    * entries and restores the outer one. This is the per-trigger
    * contract for every streaming attach* loop; safe beside concurrent
    * scopes in the same session by construction (tokens never collide,
    * unlike thread ids).
    */
  def scoped[T](body: => T): T = {
    val prev = current.get()
    val s = new Scope
    current.set(s)
    try body
    finally {
      current.set(prev)
      release(s)
    }
  }

  private def release(s: Scope): Int = {
    var n = 0
    val it = owned.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e._1 eq s) {
        it.remove()
        e._2.unpersist(blocking = false)
        n += 1
      }
    }
    n
  }

  /** Unpersist every registered dataset — scoped or not; returns how
    * many were released. Idempotent and safe at any time: unpersisting
    * a plan that a later action still needs only costs recomputation,
    * never correctness. Harness use only (Bench/Verify/TimeQ/ScaleSmoke
    * own the whole session); concurrent-stream code uses [[scoped]].
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

  /** Entries currently awaiting a sweep (diagnostics / specs). */
  def pending: Int = owned.size()

  /** The caller's scope token, for [[Par]] to carry into worker
    * threads — a parallel sub-plan's owned persists must release with
    * the SCOPE that spawned them (a streaming trigger's scoped block),
    * not linger until the next harness-wide sweep.
    */
  private[util] def currentScope: AnyRef = current.get()

  /** Run `body` under the given scope token on THIS thread (token may
    * be null = unscoped). Restores the thread's previous scope.
    */
  private[util] def withScope[T](s: AnyRef)(body: => T): T = {
    val prev = current.get()
    current.set(s.asInstanceOf[Scope])
    try body finally current.set(prev)
  }
}
