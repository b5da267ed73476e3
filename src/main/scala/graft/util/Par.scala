package graft.util

import java.util.concurrent.{Callable, ExecutionException, Executors}

import org.apache.spark.sql.SparkSession

/** Overlap independent driver-side plan constructions (guide §2.6
  * "overlap independent jobs"): Spark's scheduler happily runs several
  * jobs at once inside one application — actions are only sequential
  * because driver code calls them sequentially. The export recipes and
  * replay pin-validations are exactly that shape: per-batch / per-pin
  * sub-plans whose EAGER driver actions (touched-bucket collects,
  * params-sidecar reads, content fingerprints) have no dependency on
  * each other, yet ran back to back, each leaving the 32-core box idle
  * during its job's scheduling latency.
  *
  * `all` runs the thunks on a small private pool and rethrows the FIRST
  * failure's cause (unwrapped from ExecutionException, so `require`
  * messages surface verbatim — the pin-validation error contract is
  * message-based). Each worker inherits the caller's [[Caches]] scope
  * token (a trigger's scoped block must release what its sub-plans
  * owned) and the caller's active SparkSession (some Dataset surfaces
  * resolve `SparkSession.active`).
  *
  * Pool size is capped small (≤4): the point is overlapping per-job
  * scheduling latency, not fanning out — concurrent jobs share the
  * executor pool anyway (FIFO back-fill, guide §2.6).
  */
object Par {

  def all[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val scope = Caches.currentScope
    val sess = SparkSession.getActiveSession
    val pool = Executors.newFixedThreadPool(math.min(thunks.size, 4))
    try {
      val futs = thunks.map { t =>
        pool.submit(new Callable[A] {
          override def call(): A = {
            sess.foreach(SparkSession.setActiveSession)
            Caches.withScope(scope)(t())
          }
        })
      }
      // collect ALL before throwing: cancelling siblings mid-collect
      // would leave half-built fixtures; first failure wins the throw
      val results = futs.map(f =>
        try Right(f.get())
        catch { case e: ExecutionException => Left(Option(e.getCause).getOrElse(e)) })
      results.collectFirst { case Left(t) => t }.foreach(t => throw t)
      results.collect { case Right(a) => a }
    } finally pool.shutdown()
  }
}
