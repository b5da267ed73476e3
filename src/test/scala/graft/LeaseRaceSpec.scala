package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TrainExport}
import graft.sources.{Compaction, IndexLifecycle, ManifestCommit}

/** The r15 lease-vs-prune race CLOSURE (r14 verdict #3 + all four r14
  * ADVICE lease findings), pinned by deterministic interleavings of
  * the announce → re-list → delete protocol
  * ([[Compaction.deleteUnlessLeased]] / the IndexLifecycle twin):
  *
  *  - the exact r14 residual window (pruner lists leases → lease CAS →
  *    acquirer re-verify → pruner deletes) now FAILS THE ACQUIRE
  *    LOUDLY (the live delete-intent is visible at re-verify) instead
  *    of leaving a lease silently pinning a pruned generation — on r14
  *    code the acquire in that window succeeded and the dir vanished;
  *  - the opposite order (lease CAS before the pruner's post-intent
  *    re-list) aborts the delete;
  *  - a no-expiry same-(id, gen) re-acquire is a PURE NO-OP — the r14
  *    delete+create refresh opened a momentary no-lease window on
  *    every keep-alive even with expiry disabled (ADVICE, medium);
  *  - under an expiry policy the re-acquire still refreshes;
  *  - releaseLeases also clears a LEGACY shared-id index lease
  *    (pre-r14 scheme) and leaseReport counts it as held (ADVICE).
  */
class LeaseRaceSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def docs(ids: Seq[Long]) =
    ids.toDF("doc_id").withColumn("text",
      concat_ws(" ",
        concat(lit("a"), pmod(col("doc_id"), lit(5))),
        concat(lit("b"), pmod(col("doc_id"), lit(3))),
        concat(lit("c"), col("doc_id")),
        concat(lit("d"), col("doc_id") + 1)))

  private def fsOf(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A generational table whose g1 dir AND marker still exist but sit
    * below the grace floor unleased — exactly the state a prune cycle
    * is about to collect (a transient lease keeps them through the
    * g3 publish, then releases).
    */
  private def agedG1Table(root: String): String = {
    val t = s"$root/tbl"
    Compaction.writeGen(docs(0L to 4L), t) // g1
    Compaction.writeGen(docs(0L to 5L), t) // g2
    Compaction.acquireLease(spark, t, 1L, "scaffold")
    Compaction.writeGen(docs(0L to 6L), t) // g3: g1 survives leased
    Compaction.releaseLease(spark, t, "scaffold")
    assert(Compaction.generations(spark, t) == Seq(1L, 2L, 3L))
    t
  }

  test("interleaving CLOSED: pruner re-lists before the lease CAS -> the acquire fails loudly on the live intent, never a silent pinned-pruned lease") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace1").toString
    val t = agedG1Table(root)
    val main = new Path(t)
    val fs = fsOf(t)
    var acquireFailed = false
    // drive the pruner's protocol by hand; the hook runs BETWEEN its
    // lease re-list (which saw nothing) and its delete — the r14
    // residual window, where the old code's acquire succeeded and the
    // delete then landed anyway
    val deleted = Compaction.deleteUnlessLeased(fs, main, 1L,
      Seq(new Path(main, "g000000001"), new Path(main, "_graft_gen.g000000001")),
      leaseMaxAge = 0L,
      afterRelist = () => {
        // the in-flight announce is operator-visible
        val con = Compaction.describe(spark, t)
          .filter(col("kind") === "intent").collect()
        assert(con.length == 1 && con(0).getAs[String]("status") == "announced"
          && con(0).getAs[Long]("gen") == 1L,
          s"describe must surface the live intent: ${con.toSeq}")
        val e = intercept[RuntimeException](
          Compaction.acquireLease(spark, t, 1L, "racer"))
        assert(e.getMessage.contains("being pruned") ||
          e.getMessage.contains("pruned"), e.getMessage)
        acquireFailed = true
        // the failed acquire released its marker — nothing pins
        assert(Compaction.listLeases(spark, t).isEmpty,
          "a failed acquire must not leave a lease marker behind")
      })
    assert(acquireFailed)
    assert(deleted, "unleased aged generation must delete")
    assert(Compaction.generations(spark, t) == Seq(2L, 3L))
    // the intent was removed with the delete
    assert(!fs.listStatus(main).exists(
      _.getPath.getName.startsWith("_graft_intent.")))
    // post-protocol: a fresh acquire on a LIVE generation works
    Compaction.acquireLease(spark, t, 2L, "racer")
    Compaction.releaseLease(spark, t, "racer")
  }

  test("interleaving CLOSED: lease CAS before the pruner's post-intent re-list -> the delete aborts and the pinned read survives") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace2").toString
    val t = agedG1Table(root)
    val main = new Path(t)
    val fs = fsOf(t)
    Compaction.acquireLease(spark, t, 1L, "holder")
    val deleted = Compaction.deleteUnlessLeased(fs, main, 1L,
      Seq(new Path(main, "g000000001"), new Path(main, "_graft_gen.g000000001")),
      leaseMaxAge = 0L)
    assert(!deleted, "a leased generation must survive the protocol")
    assert(Compaction.readTableAt(spark, t, 1L).count() == 5L)
    // and a full prune cycle (writeGen) keeps honoring the lease
    Compaction.writeGen(docs(0L to 7L), t) // g4
    assert(Compaction.generations(spark, t).contains(1L))
    Compaction.releaseLease(spark, t, "holder")
  }

  test("no-expiry re-acquire is a PURE no-op (marker untouched); expiry keep-alive still refreshes") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace3").toString
    val t = s"$root/tbl"
    Compaction.writeGen(docs(0L to 4L), t)
    Compaction.acquireLease(spark, t, 1L, "keeper")
    val fs = fsOf(t)
    val marker = new Path(t, "_graft_lease.keeper")
    // age the marker artificially so any recreate is detectable
    val old = System.currentTimeMillis() - 600000L
    fs.setTimes(marker, old, old)
    // expiry DISABLED (the default): re-acquire must not delete+create
    // — the r14 behavior opened a no-lease window on every keep-alive
    Compaction.acquireLease(spark, t, 1L, "keeper")
    assert(fs.getFileStatus(marker).getModificationTime == old,
      "no-expiry re-acquire must leave the marker bytes untouched")
    // expiry ENABLED: the same call refreshes the age (keep-alive)
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setLong(Compaction.LeaseMaxAgeKey, 3600000L)
    try {
      Compaction.acquireLease(spark, t, 1L, "keeper")
      assert(fs.getFileStatus(marker).getModificationTime > old,
        "expiry keep-alive must refresh the marker age")
    } finally conf.unset(Compaction.LeaseMaxAgeKey)
    Compaction.releaseLease(spark, t, "keeper")
  }

  test("index plane: the intent protocol guards version markers and data dirs; acquire racing an announced delete fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace4").toString
    val idx = s"$root/ix"
    Dedup.writeShingleIndex(docs(0L to 19L), "doc_id", "text", n = 3, idx,
      nBuckets = 4)
    Dedup.rebuildShingleIndex(spark, idx) // convert: v1
    val v = IndexLifecycle.versions(spark, idx).max
    val m = IndexLifecycle.manifestAt(spark, idx, v)
    val mc = ManifestCommit.forIndex(fsOf(idx), new Path(idx))
    // pruner announces the dir delete, re-lists (no lease), and the
    // racing acquire lands in the window — must fail loudly, leave no
    // marker; the pruner's delete is a no-op stand-in (the dir is
    // current here; real prunes only target retired dirs)
    var acquireFailed = false
    IndexLifecycle.deleteUnlessPinned(mc, s"dir.${m.dir}",
      pinned = () => false,
      doDelete = () => (),
      afterRelist = () => {
        val e = intercept[RuntimeException](
          IndexLifecycle.acquireLease(spark, idx, v, "racer"))
        assert(e.getMessage.contains("being pruned"), e.getMessage)
        acquireFailed = true
        assert(IndexLifecycle.listLeases(spark, idx).isEmpty)
      })
    assert(acquireFailed)
    // same for the version-marker namespace
    IndexLifecycle.deleteUnlessPinned(mc,
      f"marker.g$v%09d",
      pinned = () => false,
      doDelete = () => (),
      afterRelist = () => {
        val e = intercept[RuntimeException](
          IndexLifecycle.acquireLease(spark, idx, v, "racer2"))
        assert(e.getMessage.contains("being pruned"), e.getMessage)
        assert(IndexLifecycle.listLeases(spark, idx).isEmpty)
      })
    // intents removed; a clean acquire now succeeds, and a lease held
    // FIRST makes the protocol abort the delete
    IndexLifecycle.acquireLease(spark, idx, v, "holder")
    val deleted = IndexLifecycle.deleteUnlessPinned(mc, s"dir.${m.dir}",
      pinned = () => true, // the re-list sees the lease
      doDelete = () => fail("delete must not run against a pinned dir"))
    assert(!deleted)
    IndexLifecycle.releaseLease(spark, idx, "holder")
  }

  test("a STALE intent (crashed pruner, aged past the orphan grace) is ignored by acquirers, shown by describe, and cleaned by the next prune") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace6").toString
    val t = s"$root/tbl"
    Compaction.writeGen(docs(0L to 4L), t) // g1
    val fs = fsOf(t)
    // a pruner that crashed between announce and delete
    val stale = new Path(t, "_graft_intent.g000000001.deadbeef")
    val out = fs.create(stale, true)
    try out.write("g000000001".getBytes("UTF-8")) finally out.close()
    val old = System.currentTimeMillis() - Compaction.DefaultOrphanGraceMs - 60000L
    fs.setTimes(stale, old, old)
    val con = Compaction.describe(spark, t)
      .filter(col("kind") === "intent").collect()
    assert(con.length == 1 && con(0).getAs[String]("status") == "stale",
      s"describe must flag the crashed pruner's intent: ${con.toSeq}")
    // the liveness assumption: a stale intent pins NOTHING — the
    // acquire succeeds right through it
    Compaction.acquireLease(spark, t, 1L, "survivor")
    Compaction.releaseLease(spark, t, "survivor")
    // and the next prune cycle sweeps it
    Compaction.writeGen(docs(0L to 5L), t) // g2 (writeGen runs pruneDataDirs)
    assert(!fs.exists(stale), "stale intents must be cleaned by pruning")
  }

  test("index soak: under append+rebuild churn, a successfully leased version stays pinnable for the whole held window") {
    import graft.ops.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_lsoak2").toString
    val idx = s"$root/ix"
    Dedup.writeShingleIndex(docs(0L to 19L), "doc_id", "text", n = 3, idx,
      nBuckets = 4)
    Dedup.rebuildShingleIndex(spark, idx) // convert: v1
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val pins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val writer = new Thread(() => {
      try {
        // 12 appends with a rebuild every 3rd — each rebuild's prune
        // races the acquirers for the retired dir and old markers
        (0 until 12).foreach { i =>
          Dedup.appendToShingleIndex(spark, idx,
            docs((100L + i * 10) to (100L + i * 10 + 9)), "doc_id",
            "text", n = 3, ingestTag = s"soak$i", nBuckets = 4)
          if (i % 3 == 2) Dedup.rebuildShingleIndex(spark, idx)
        }
      } catch { case e: Throwable => violations.add(s"writer: $e") }
      finally stop.set(true)
    })
    val acquirers = (1 to 2).map { k =>
      new Thread(() => {
        while (!stop.get) {
          IndexLifecycle.versions(spark, idx).minOption.foreach { v =>
            val id = s"ixsoak$k"
            val acquired =
              try { IndexLifecycle.acquireLease(spark, idx, v, id); true }
              catch {
                case e: RuntimeException
                    if e.getMessage.contains("not readable") ||
                       e.getMessage.contains("pruned") ||
                       e.getMessage.contains("already pins") =>
                  losses.incrementAndGet(); false
              }
            if (acquired) {
              try {
                // HELD window: the pinned version must resolve and its
                // dir must read — the forbidden outcome is a silent
                // pinned-but-pruned lease
                val m = IndexLifecycle.manifestAt(spark, idx, v)
                if (spark.read.parquet(
                    new Path(new Path(idx), m.dir).toString).count() <= 0)
                  violations.add(s"empty pinned read of v$v")
                pins.incrementAndGet()
              } catch {
                case e: Throwable =>
                  violations.add(s"pinned v$v broken while held: $e")
              } finally IndexLifecycle.releaseLease(spark, idx, id)
            }
          }
        }
      })
    }
    (writer +: acquirers).foreach(_.start())
    (writer +: acquirers).foreach(_.join(300000))
    assert(violations.isEmpty, s"protocol violations: $violations")
    assert(pins.get > 0, "no successful pin ever happened — soak too weak")
  }

  test("soak: under writeGen churn, a successful acquire ALWAYS yields a readable pinned generation — losses are loud, never silent") {
    // the nondeterministic companion of the deterministic interleaving
    // specs above: three acquirer threads race the prune cycles of a
    // churning writer for the OLDEST readable generation (exactly the
    // one each publish is about to collect). The closed protocol's
    // contract: acquireLease either succeeds AND the generation stays
    // readable until release, or fails loudly — a silent
    // pinned-but-pruned lease (the r14 residual) is the one forbidden
    // outcome, and the held-window read asserts it never happens.
    val root = java.nio.file.Files.createTempDirectory("graft_lsoak").toString
    val t = s"$root/tbl"
    (4 to 6).foreach(i => Compaction.writeGen(docs(0L to i.toLong), t))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val loudLosses = new java.util.concurrent.atomic.AtomicInteger(0)
    val pins = new java.util.concurrent.atomic.AtomicInteger(0)
    val writer = new Thread(() => {
      var i = 7L
      while (!stop.get) {
        try Compaction.writeGen(docs(0L to i), t)
        catch { case e: Throwable => violations.add(s"writer: $e") }
        i += 1
      }
    })
    val acquirers = (1 to 3).map { k =>
      new Thread(() => {
        while (!stop.get) {
          Compaction.generations(spark, t).minOption.foreach { g =>
            val id = s"soak$k"
            val acquired =
              try { Compaction.acquireLease(spark, t, g, id); true }
              catch {
                case e: RuntimeException
                    if e.getMessage.contains("cannot lease") ||
                       e.getMessage.contains("pruned") =>
                  loudLosses.incrementAndGet(); false
              }
            if (acquired) {
              try {
                // HELD window: this read failing would BE the r14
                // silent pinned-pruned race — the forbidden outcome
                if (Compaction.readTableAt(spark, t, g).count() <= 0)
                  violations.add(s"empty pinned read of g$g")
                pins.incrementAndGet()
              } catch {
                case e: Throwable =>
                  violations.add(s"pinned g$g unreadable while held: $e")
              } finally Compaction.releaseLease(spark, t, id)
            }
          }
        }
      })
    }
    (writer +: acquirers).foreach(_.start())
    Thread.sleep(8000)
    stop.set(true)
    (writer +: acquirers).foreach(_.join(120000))
    assert(violations.isEmpty, s"protocol violations: $violations")
    // the soak must have really exercised both outcomes
    assert(pins.get > 0, "no successful pin ever happened — soak too weak")
    // loud losses are expected but not required (timing-dependent);
    // log-free assertion keeps the soak deterministic-pass
  }

  test("releaseLeases clears a LEGACY shared-id index lease and leaseReport counts it as held (r14 ADVICE back-compat)") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace5").toString
    Compaction.writeGen(docs(20L to 29L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L to 14L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = 4)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    TrainExport.registerRecipe("spec_legacy_lease_v1") { (s, in, _) =>
      val t = in.index("text")
      val b = in.table("docs")
      Dedup.jaccardAgainstIndexAt(s, t.path, t.version, b,
          "doc_id", "text", n = 3, threshold = 0.8, nBuckets = 4)
        .select(col("i"), col("j"))
    }
    val ex = s"$root/export"
    TrainExport.commit(spark, ex, "spec_legacy_lease_v1",
      params = Map.empty, tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text" -> s"$root/text"))
    val pin = TrainExport.manifest(spark, ex).indexes("text")
    // simulate a pre-r14 deployment: the index pin leased under the
    // SHARED export id (what TrainExport.lease used to do)
    IndexLifecycle.acquireLease(spark, pin.path, pin.version,
      TrainExport.leaseId(ex))
    val rep = TrainExport.leaseReport(spark, ex)
      .filter(col("kind") === "index").head()
    assert(rep.getAs[Boolean]("this_export_leased"),
      "a legacy shared-id hold IS this export's lease")
    // release must clear the legacy marker too — on r14 code it stayed
    // behind, pinning the version forever with no error
    TrainExport.releaseLeases(spark, ex)
    assert(IndexLifecycle.listLeases(spark, pin.path).isEmpty,
      "legacy shared-id lease must be released")
  }

  test("intent grace is conf-plumbed (r15 ADVICE): slow prune cycles are rejected unless the acquirer-visible grace covers them; acquirers honor the configured grace") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrace7").toString
    val t = s"$root/tbl"
    Compaction.writeGen(docs(0L to 4L), t) // g1
    val conf = spark.sparkContext.hadoopConfiguration
    // 1. the invariant is LOUD: a prune cycle whose orphanGraceMs
    // exceeds the acquirer-visible grace (default 15 min) re-opens the
    // lease-vs-prune race — every prune entry point rejects it
    val e = intercept[IllegalArgumentException](
      Compaction.writeGen(docs(0L to 5L), t,
        orphanGraceMs = Compaction.DefaultOrphanGraceMs + 1))
    assert(e.getMessage.contains(Compaction.OrphanGraceKey), e.getMessage)
    intercept[IllegalArgumentException](Compaction.compactGen(spark, t,
      orphanGraceMs = Compaction.DefaultOrphanGraceMs + 1))
    intercept[IllegalArgumentException](IndexLifecycle.prune(spark, t,
      orphanGraceMs = Compaction.DefaultOrphanGraceMs + 1))
    // 2. raising the conf key admits the slower cycle
    conf.setLong(Compaction.OrphanGraceKey,
      4L * Compaction.DefaultOrphanGraceMs)
    try {
      Compaction.writeGen(docs(0L to 5L), t, // g2
        orphanGraceMs = Compaction.DefaultOrphanGraceMs + 1)
      // 3. and the ACQUIRE side honors the same configured grace: an
      // intent older than the default but inside the configured grace
      // still pins the acquire (on r15 code the acquirer hardcoded the
      // default and would have treated this live pruner as stale)
      val fs = fsOf(t)
      val intent = new Path(t, "_graft_intent.g000000002.spec0000")
      val out = fs.create(intent, false)
      out.write("g000000002".getBytes("UTF-8")); out.close()
      val midAge = System.currentTimeMillis() -
        (2L * Compaction.DefaultOrphanGraceMs)
      fs.setTimes(intent, midAge, midAge)
      val e2 = intercept[RuntimeException](
        Compaction.acquireLease(spark, t, 2L, "late"))
      assert(e2.getMessage.contains("being"), e2.getMessage)
      assert(!fs.exists(new Path(t, "_graft_lease.late")),
        "the failed acquire must leave no marker")
      fs.delete(intent, false)
    } finally conf.unset(Compaction.OrphanGraceKey)
    // 4. with the conf back at the default, the same mid-age intent is
    // a crashed pruner's leftover — the acquire proceeds
    val fs = fsOf(t)
    val intent = new Path(t, "_graft_intent.g000000002.spec0001")
    val out = fs.create(intent, false)
    out.write("g000000002".getBytes("UTF-8")); out.close()
    val midAge = System.currentTimeMillis() -
      (2L * Compaction.DefaultOrphanGraceMs)
    fs.setTimes(intent, midAge, midAge)
    Compaction.acquireLease(spark, t, 2L, "late")
    Compaction.releaseLease(spark, t, "late")
    fs.delete(intent, false)
  }
}
