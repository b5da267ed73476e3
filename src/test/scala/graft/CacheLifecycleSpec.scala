package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.util.{Caches, Tables}

/** The dedup-family persist lifecycle (round-7 driver finding): every
  * internal `.persist` is registered with [[graft.util.Caches]] and the
  * harness sweeps after each materialization. Without the sweep,
  * CacheManager pins the corpus-sized entries for the JVM lifetime —
  * ContextCleaner never reclaims Dataset persists (the InMemoryRelation
  * holds a strong RDD reference) — which was the measured r5/r6
  * q84-trio bench regression.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  private def docs = Tables(spark, sfDir, "documents")
  private def emb = Tables(spark, sfDir, "embeddings")

  test("dedup-family runs persist during materialization and sweep releases everything") {
    Caches.sweep() // clean slate in case an earlier suite left entries
    // Baseline caveat: the suites share one SparkContext, and OTHER
    // suites' dropped raw-RDD persists (localCheckpoints) can be
    // collected by ContextCleaner at any moment — that is precisely the
    // class the cleaner DOES reclaim, unlike Dataset persists. So the
    // assertions below are monotonicity bounds against a shrink-only
    // baseline, not equality against a snapshot (the first rendering
    // used equality and flaked when the cleaner fired mid-test).
    val base = spark.sparkContext.getPersistentRDDs.size

    // every owned-persist call site in Dedup, materialized like a query
    def runAll(): Unit = {
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
        maxDf = 50).count() // df-capped → shingles() owns sh0
      Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 16, bands = 4,
        threshold = 0.5).count()
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3).count()
      // maxDf engages the df-cap inside shingles(), the op's only
      // remaining owned persist (the un-capped path is persist-free
      // since the round-7 single-pass window rewrite)
      Dedup.ngramOverlap(docs, "doc_id", "text", n = 5,
        benchPred = _ % 10 === 0, maxDf = 50).count()
      // n = 4 (not 3): with identical params this op's owned
      // invertedIndex plan is byte-identical to minhashLsh's above, and
      // CacheManager plan-matching folds the two persists into ONE
      // entry — the registry would count 5, not 6
      Dedup.jaccardAgainstCorpus(docs, "doc_id", "text", n = 4,
        threshold = 0.5, newPred = _ % 10 === 0).count()
      Dedup.embeddingPairsLsh(emb, "vec_id", "embedding", dim = 64,
        threshold = 0.9).count()
    }

    runAll()
    // the persists really happened (they are load-bearing single
    // materializations, not decoration) ...
    assert(Caches.pending >= 6,
      s"expected >=6 owned entries pending, got ${Caches.pending}")
    val during = spark.sparkContext.getPersistentRDDs.size
    assert(during >= Caches.pending,
      s"owned persists never registered RDDs ($during in registry)")
    // ... and one sweep releases every one of them, synchronously as far
    // as bookkeeping is concerned (the registry can only have SHRUNK
    // further if the cleaner collected unrelated dropped RDDs)
    Caches.sweep()
    assert(Caches.pending == 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= base,
      s"sweep left entries above the $base baseline")

    // stability across repeated query invocations — the exact harness
    // loop shape (Bench warm + timed passes): no monotone growth
    runAll(); Caches.sweep()
    assert(spark.sparkContext.getPersistentRDDs.size <= base,
      "second run leaked entries past the sweep")
  }

  test("scoped releases only its own entries at exit — concurrent streams keep theirs; throwing bodies release too") {
    Caches.sweep() // clean slate
    import spark.implicits._
    // a sibling stream's trigger fires (and exits its scope) while an
    // UNSCOPED frame — a concurrent harness query, another stream's
    // in-flight trigger — is still live: the scope exit must release
    // only its own entry
    val mine = Caches.own(Seq(1, 2, 3).toDF("a"))
    mine.count()
    @volatile var pendingInside = -1
    @volatile var pendingAfterSibling = -1
    val other = new Thread(() => {
      Caches.scoped {
        val theirs = Caches.own(Seq(4, 5).toDF("b"))
        theirs.count()
        pendingInside = Caches.pending
      }
      pendingAfterSibling = Caches.pending
    })
    other.start(); other.join()
    assert(pendingInside == 2)
    assert(pendingAfterSibling == 1,
      s"sibling scope exit touched the unscoped entry: pending=$pendingAfterSibling")
    // a THROWING trigger body still releases its persists (the scope's
    // finally), and nested scopes restore the outer token
    intercept[RuntimeException](Caches.scoped {
      Caches.own(Seq(6).toDF("c")).count()
      Caches.scoped { Caches.own(Seq(7).toDF("d")).count() }
      assert(Caches.pending == 2) // inner released, own + unscoped remain...
      sys.error("trigger failure")
    })
    assert(Caches.pending == 1,
      s"throwing scope leaked entries: pending=${Caches.pending}")
    assert(Caches.sweep() == 1)
  }

  test("sweep mid-lineage only costs recomputation, never correctness") {
    // sweeping between building a plan and materializing it must yield
    // the same rows (the entry is an optimization, not state)
    val before = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, maxDf = 50)
      .collect().map(_.toSeq).toSet
    val plan = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, maxDf = 50)
    Caches.sweep() // unpersists the plan's internal index before any action
    val after = plan.collect().map(_.toSeq).toSet
    Caches.sweep()
    assert(after == before)
  }
}
