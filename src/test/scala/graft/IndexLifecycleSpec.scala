package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.sources.{IndexLifecycle, ManifestCommit, MemoryManifestCommit}

/** The CAS-versioned index lifecycle's concurrency contract, proven on
  * the shingle family (the mechanics are shared by all families) and
  * parameterized over BOTH commit backends — the filesystem
  * exclusive-create ([[graft.sources.FsManifestCommit]]) and the
  * conditional-PUT shape ([[MemoryManifestCommit]], the S3
  * `If-None-Match: *` semantics in memory) — so the protocol is proven
  * to need nothing beyond "atomically create name+payload iff absent":
  *
  *  1. deterministic interleavings of the two races the CAS exists to
  *     close — a rebuild missing a concurrent append (lost segment)
  *     and an append replayed after a rebuild absorbed it (duplicated
  *     postings);
  *  2. a threaded two-writer soak (appender loop vs rebuild loop vs a
  *     concurrent prober), the index mirror of OperatorsSpec's
  *     writeGen soak;
  *  3. version-pinned reads (manifestAt) with their retention-window
  *     error contract, the reader-isolated forgetViaRebuild path under
  *     a concurrent prober, and the maybeRebuild segment policy.
  */
abstract class IndexLifecycleContract(memoryCommit: Boolean) extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  /** Deterministic tiny corpus: doc id → 8 tokens, ids disjoint across
    * batches by construction.
    */
  private def docs(ids: Seq[Long]) =
    ids.toDF("doc_id").withColumn("text",
      concat_ws(" ",
        concat(lit("a"), pmod(col("doc_id"), lit(5))),
        concat(lit("b"), pmod(col("doc_id"), lit(3))),
        concat(lit("c"), col("doc_id")),
        concat(lit("d"), col("doc_id") + 1),
        concat(lit("e"), pmod(col("doc_id"), lit(7))),
        concat(lit("f"), col("doc_id") * 2),
        concat(lit("g"), pmod(col("doc_id") + 3, lit(4))),
        concat(lit("h"), col("doc_id"))))

  private val NB = 4 // buckets: tiny corpus, tiny layout

  private def newIndex(prefix: String, base: Seq[Long]): String = {
    val root = java.nio.file.Files.createTempDirectory(prefix).toString
    if (memoryCommit) ManifestCommit.register(root, new MemoryManifestCommit)
    val idx = root + "/index"
    Dedup.writeShingleIndex(docs(base), "doc_id", "text", n = 3, idx,
      nBuckets = NB)
    // convert up front: the one-time flat→generational moves are a
    // quiet-window operation, and these tests race writers afterwards
    Dedup.rebuildShingleIndex(spark, idx)
    idx
  }

  private def append(idx: String, ids: Seq[Long], tag: String): Unit =
    Dedup.appendToShingleIndex(spark, idx, docs(ids),
      "doc_id", "text", n = 3, ingestTag = tag, nBuckets = NB)

  /** The family rebuild body the deterministic tests inject raw (so
    * they can interleave mid-build) — same output as
    * Dedup.rebuildShingleIndex's closure, uncapped.
    */
  private def shingleBuild(src: org.apache.spark.sql.DataFrame,
                           dst: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    src.select(col("doc"), col("s")).distinct()
      .withColumn("n_sh",
        count(lit(1)).over(Window.partitionBy("doc")).cast("int"))
      .withColumn("bucket", pmod(xxhash64(col("s")), lit(NB)).cast("int"))
      .withColumn("ingest", lit("base"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("ingest", "bucket").parquet(dst)
    spark.emptyDataset[Long].toDF("h")
      .coalesce(1).write.mode("overwrite").parquet(dst + "/_graft_hot")
    // the family's real closure re-persists the params sidecar into
    // every new version; the injected body must do the same or later
    // appends/probes fail their params validation
    Dedup.writeShingleParams(spark, dst, 3, NB, Int.MaxValue)
  }

  /** (doc, shingle) set of the index's CURRENT version. */
  private def postings(idx: String): Set[(Long, String)] =
    spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet

  /** (doc, shingle) set AS OF pinned version `v` — the manifest's
    * recorded segment set read under the version's data dir.
    */
  private def pinnedPostings(idx: String, v: Long): Set[(Long, String)] = {
    val m = IndexLifecycle.manifestAt(spark, idx, v)
    val dir = new Path(new Path(idx), m.dir).toString
    spark.read.option("basePath", dir)
      .parquet(m.segments.map(t => s"$dir/ingest=$t"): _*)
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet
  }

  /** Duplicate (doc, shingle) rows — must ALWAYS be empty: duplicated
    * postings inflate jaccard `common` counts silently.
    */
  private def dupPostings(idx: String): Seq[(Long, String)] =
    spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .groupBy("doc", "s").count().filter(col("count") > 1)
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSeq

  private def expected(ids: Seq[Long]): Set[(Long, String)] = {
    val ref = java.nio.file.Files
      .createTempDirectory("graft_ixref").toString + "/index"
    Dedup.writeShingleIndex(docs(ids), "doc_id", "text", n = 3, ref,
      nBuckets = NB)
    spark.read.parquet(ref)
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet
  }

  private def fsOf(idx: String) = new Path(idx)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("rebuild fenced by a mid-build append: retries and re-absorbs — no lost segment") {
    val base = 0L until 30L
    val batch = 100L until 115L
    val idx = newIndex("graft_ixfence1", base)
    var buildRuns = 0
    IndexLifecycle.rebuild(spark, idx) { (src, _, dst) =>
      buildRuns += 1
      if (buildRuns == 1) {
        // an append lands AFTER this rebuild pinned its input listing
        // and BEFORE its publish — exactly the lost-segment window a
        // max-wins fence cannot see
        append(idx, batch, "b1")
      }
      shingleBuild(src, dst)
    }
    assert(buildRuns == 2,
      s"the appended segment must FENCE the first build ($buildRuns runs)")
    assert(postings(idx) == expected(base ++ batch),
      "retried rebuild must absorb the mid-build append")
    assert(dupPostings(idx).isEmpty)
  }

  test("append whose segment a rebuild absorbed is not re-sealed — no duplicate postings") {
    val base = 0L until 30L
    val batch = 200L until 212L
    val idx = newIndex("graft_ixfence2", base)
    append(idx, batch, "b1") // sealed + published normally
    // replay of the SAME tag (the at-least-once window), interleaved
    // with a rebuild that reads the previously-sealed segment and
    // publishes DURING the replay's seal: the replay's CAS loses, sees
    // tag b1 in the winner's absorbed list, and must stop — blindly
    // re-sealing would duplicate every posting of the batch
    // a plain same-tag replay first: idempotent, content unchanged
    append(idx, batch, "b1")
    assert(postings(idx) == expected(base ++ batch))
    // now the RACED replay: the rebuild is injected between the
    // replay's manifest read and its commit via the writeSeg callback
    var first = true
    IndexLifecycle.appendSegment(spark, idx, "b1") { (dir, tmp) =>
      if (first) {
        first = false
        // rebuild absorbs the CURRENT index (which contains b1 from
        // the original append) and publishes — the replay is now the
        // stale loser
        Dedup.rebuildShingleIndex(spark, idx)
      }
      import org.apache.spark.sql.expressions.Window
      val hot = spark.read.parquet(dir + "/_graft_hot")
      Dedup.shingles(docs(batch), "doc_id", "text", 3, Int.MaxValue)
        .withColumn("h", xxhash64(col("s")))
        .join(hot, Seq("h"), "left_anti")
        .withColumn("n_sh",
          count(lit(1)).over(Window.partitionBy("doc")).cast("int"))
        .withColumn("bucket", pmod(col("h"), lit(NB)).cast("int"))
        .drop("h")
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    }
    assert(postings(idx) == expected(base ++ batch),
      "absorbed replay must keep exactly one copy of the batch")
    assert(dupPostings(idx).isEmpty,
      "absorbed replay re-sealed its segment — postings duplicated")
    // and the winning rebuild collapsed everything to base
    assert(IndexLifecycle.segmentsOf(fsOf(idx),
      new Path(IndexLifecycle.resolveDir(spark, idx))) == Seq("base"))
  }

  test("crash-restart replay of a tag a rebuild already absorbed: append is a no-op, not a duplicating re-seal") {
    val base = 0L until 30L
    val batch = 300L until 312L
    val idx = newIndex("graft_ixfence3", base)
    append(idx, batch, "b1")
    // the crash window: the index commit (append + the rebuild that
    // absorbed it) landed, the stream's checkpoint commit did NOT —
    // in-loop compaction makes this ordering routine. The rebuild
    // finishes BEFORE the restart, so the replayed append starts with
    // no CAS contention at all: the happy path would seal b1's rows a
    // second time next to the copy living in base.
    Dedup.rebuildShingleIndex(spark, idx)
    var sealRan = false
    IndexLifecycle.appendSegment(spark, idx, "b1") { (_, _) =>
      sealRan = true // reaching the seal at all IS the bug
    }
    assert(!sealRan,
      "replayed append of an absorbed tag must detect absorption " +
        "BEFORE sealing — its rows already live in base")
    assert(postings(idx) == expected(base ++ batch))
    assert(dupPostings(idx).isEmpty,
      "crash-restart replay duplicated the batch's postings")
    assert(IndexLifecycle.segmentsOf(fsOf(idx),
      new Path(IndexLifecycle.resolveDir(spark, idx))) == Seq("base"),
      "no ingest segment may reappear for an absorbed tag")
  }

  test("forget fenced by a concurrent rebuild: re-runs on the winner's output, deletion converges") {
    import graft.ops.Forget
    val base = 0L until 30L
    val idx = newIndex("graft_ixmf", base)
    val victims = Seq(3L, 7L, 11L)
    // raced RTBF: a rebuild publishes BETWEEN the forget's in-place
    // rewrite and its version commit — the rebuild read pre-forget
    // state, so its output revives the victims' postings; the fenced
    // mutate must re-run the (idempotent) rewrite against the winning
    // dir until its commit sticks
    var first = true
    val removed = IndexLifecycle.mutate(spark, idx) { dir =>
      if (first) {
        first = false
        // the rebuild reads the PRE-forget state and publishes a new
        // dir that still carries the victims — the revival this test
        // exists to prove the mutate loop repairs
        Dedup.rebuildShingleIndex(spark, idx)
      }
      Forget.rewriteWithout(spark, dir,
        Seq("ingest", "bucket"), "doc", victims)
    }
    assert(removed > 0L)
    val survivors = postings(idx)
    assert(survivors == expected(base.filterNot(victims.contains)),
      "raced forget left revived or extra postings")
    assert(!survivors.exists(p => victims.contains(p._1)))
    assert(dupPostings(idx).isEmpty)
    // idempotent: converged state has nothing left to remove
    assert(Forget.fromShingleIndex(spark, idx, victims) == 0L)
  }

  test("two concurrent rebuilders: CAS picks one winner per version, loser retries, content converges") {
    val base = 0L until 30L
    val idx = newIndex("graft_ixrr", base)
    append(idx, 300L until 310L, "b1")
    @volatile var bad: Throwable = null
    def rebuilder() = new Thread(() => {
      try {
        var done = 0
        while (done < 3) {
          // rebuild retries internally on a lost CAS; a surviving
          // FencedWriteException after its internal retries would
          // bubble up here and fail the test
          Dedup.rebuildShingleIndex(spark, idx,
            readerGraceMs = 120000L)
          done += 1
        }
      } catch { case t: Throwable => bad = t }
    })
    val (r1, r2) = (rebuilder(), rebuilder())
    r1.start(); r2.start(); r1.join(); r2.join()
    assert(bad == null, s"rebuild race failure: $bad")
    assert(postings(idx) == expected(base ++ (300L until 310L)),
      "racing rebuilders corrupted the index")
    assert(dupPostings(idx).isEmpty)
    // exactly one current version; segments collapsed to base
    assert(IndexLifecycle.segmentsOf(fsOf(idx),
      new Path(IndexLifecycle.resolveDir(spark, idx))) == Seq("base"))
  }

  test("two-writer index soak: appender loop vs rebuild loop vs prober — nothing lost, nothing duplicated, probes never torn") {
    val base = 0L until 40L
    val idx = newIndex("graft_ixsoak", base)
    val batches = (0 until 6).map(k => (k + 1) * 1000L until (k + 1) * 1000L + 12L)
    @volatile var bad: Throwable = null
    @volatile var churning = true
    val appender = new Thread(() => {
      try batches.zipWithIndex.foreach { case (ids, k) =>
        append(idx, ids, s"b$k")
      } catch { case t: Throwable => bad = t }
      finally churning = false
    })
    val rebuilder = new Thread(() => {
      try {
        while (churning) {
          // concurrent-writer deployment: wall-time retention so the
          // prober's resolved dir outlives back-to-back publishes
          Dedup.rebuildShingleIndex(spark, idx,
            readerGraceMs = 120000L)
        }
      } catch { case t: Throwable => bad = t }
    })
    var probes = 0
    val prober = new Thread(() => {
      try {
        while (churning) {
          // probe docs overlap base content → deterministic matches
          Dedup.jaccardAgainstIndex(spark, idx, docs(0L until 5L),
            "doc_id", "text", n = 3, threshold = 0.99,
            nBuckets = NB).count()
          probes += 1
        }
      } catch { case t: Throwable => bad = t }
    })
    appender.start(); rebuilder.start(); prober.start()
    appender.join(); rebuilder.join(); prober.join()
    assert(bad == null, s"non-fence failure under index churn: $bad")
    assert(probes >= 1, "prober never completed a read during churn")
    // final convergence: one more rebuild collapses any still-open
    // segments; content must equal a fresh build over base ∪ batches
    Dedup.rebuildShingleIndex(spark, idx)
    assert(postings(idx) == expected(base ++ batches.flatten),
      "soak lost or invented postings")
    assert(dupPostings(idx).isEmpty, "soak duplicated postings")
  }

  test("version pinning: manifestAt replays each append prefix exactly; appends share a dir but never leak forward") {
    val base = 0L until 20L
    val b0 = 400L until 410L
    val b1 = 500L until 508L
    val idx = newIndex("graft_ixpin", base)
    // newIndex: convert publishes v1 (flat content), rebuild publishes
    // v2 (fresh base dir) — both record segments=[base]
    append(idx, b0, "p0") // v3: [base, p0]
    append(idx, b1, "p1") // v4: [base, p0, p1]
    val vs = IndexLifecycle.versions(spark, idx)
    assert(vs == Seq(1L, 2L, 3L, 4L), s"readable versions: $vs")
    assert(IndexLifecycle.manifestAt(spark, idx, 4L)
      .segments.sorted == Seq("base", "p0", "p1"))
    assert(IndexLifecycle.manifestAt(spark, idx, 3L)
      .segments.sorted == Seq("base", "p0"))
    // the pinned reads: v2 = base only, v3 = base+b0, v4 = everything —
    // even though v2/v3/v4 all resolve to the SAME mutated data dir
    assert(IndexLifecycle.resolveDirAt(spark, idx, 3L) ==
      IndexLifecycle.resolveDir(spark, idx))
    assert(pinnedPostings(idx, 2L) == expected(base))
    assert(pinnedPostings(idx, 3L) == expected(base ++ b0))
    assert(pinnedPostings(idx, 4L) == expected(base ++ b0 ++ b1))
    // unknown version fails loudly, naming what IS readable
    val e = intercept[RuntimeException](
      IndexLifecycle.manifestAt(spark, idx, 99L))
    assert(e.getMessage.contains("not readable") &&
      e.getMessage.contains("1,2,3,4"))
  }

  test("version pinning retention contract: marker-pruned and dir-pruned versions fail loudly, never fall back") {
    val base = 0L until 15L
    val idx = newIndex("graft_ixret", base)
    // v2 after newIndex; 10 appends → v12; markers retained: 5..12
    (0 until 10).foreach(k => append(idx, (600L + k * 10) until (600L + k * 10 + 3), s"r$k"))
    val vs = IndexLifecycle.versions(spark, idx)
    assert(vs.size == IndexLifecycle.MarkerKeep && vs.head == 5L,
      s"marker retention window: $vs")
    val e1 = intercept[RuntimeException](
      IndexLifecycle.manifestAt(spark, idx, 3L))
    assert(e1.getMessage.contains("retention window"))
    // two rebuilds: v13 publishes dir #3 (pruning keeps dirs 3 and 2),
    // v14 publishes dir #4 (keeps 4 and 3) — v12's dir is now GONE
    // while its marker is still retained: the dir-pruned error path.
    // orphanGraceMs=0: claim tombstones minutes old would otherwise
    // read as live writers and defer the dir deletion this test needs
    Dedup.rebuildShingleIndex(spark, idx)
    Dedup.rebuildShingleIndex(spark, idx, orphanGraceMs = 0L)
    val e2 = intercept[RuntimeException](
      IndexLifecycle.manifestAt(spark, idx, 12L))
    assert(e2.getMessage.contains("already pruned"))
    // the two versions the dir retention still serves resolve fine
    assert(pinnedPostings(idx, 14L) ==
      expected(base ++ (0 until 10).flatMap(k =>
        (600L + k * 10) until (600L + k * 10 + 3))))
  }

  test("forgetViaRebuild: reader-isolated RTBF — concurrent probes observe only full pre/post states; count exact; idempotent") {
    val base = 0L until 30L
    val idx = newIndex("graft_ixfvr", base)
    val victims = Set(3L, 7L, 11L)
    val pre = expected(base)
    val post = expected(base.filterNot(victims))
    @volatile var done = false
    @volatile var torn: Option[Set[(Long, String)]] = None
    @volatile var probes = 0
    val prober = new Thread(() => {
      while (!done && torn.isEmpty) {
        val got = postings(idx)
        probes += 1
        // the whole contract: a reader racing the RTBF sees the full
        // old state or the full new state, never a partial rewrite
        // (the in-place mutate path documents exactly this hazard)
        if (got != pre && got != post) torn = Some(got)
      }
    })
    prober.start()
    val removed = try {
      IndexLifecycle.forgetViaRebuild(spark, idx,
          col("doc").isin(victims.toSeq: _*),
          readerGraceMs = 120000L) {
        (kept, _, dst) => shingleBuild(kept, dst)
      }
    } finally { done = true; prober.join() }
    assert(torn.isEmpty, s"prober observed a torn state: " +
      s"${torn.map(_.size)} postings (pre=${pre.size}, post=${post.size})")
    assert(probes >= 1)
    assert(removed == (pre.size - post.size).toLong,
      s"removed=$removed, expected ${pre.size - post.size}")
    assert(postings(idx) == post)
    // idempotent: nothing left of the victims
    val again = IndexLifecycle.forgetViaRebuild(spark, idx,
        col("doc").isin(victims.toSeq: _*)) {
      (kept, _, dst) => shingleBuild(kept, dst)
    }
    assert(again == 0L)
  }

  test("maybeRebuild: no-op at or under the segment cap, collapses above it") {
    val base = 0L until 20L
    val idx = newIndex("graft_ixpol", base)
    append(idx, 700L until 705L, "m0")
    append(idx, 710L until 715L, "m1")
    append(idx, 720L until 725L, "m2") // 4 segments incl. base
    assert(IndexLifecycle.segmentCount(spark, idx) == 4)
    assert(!IndexLifecycle.maybeRebuild(spark, idx, maxSegments = 4) {
      (src, _, dst) => shingleBuild(src, dst)
    })
    assert(IndexLifecycle.segmentCount(spark, idx) == 4, "no-op must not rebuild")
    assert(IndexLifecycle.maybeRebuild(spark, idx, maxSegments = 2) {
      (src, _, dst) => shingleBuild(src, dst)
    })
    assert(IndexLifecycle.segmentCount(spark, idx) == 1,
      "policy rebuild must collapse to base")
    assert(postings(idx) ==
      expected(base ++ (700L until 705L) ++ (710L until 715L) ++ (720L until 725L)))
    assert(!IndexLifecycle.maybeRebuild(spark, idx, maxSegments = 2) {
      (src, _, dst) => shingleBuild(src, dst)
    })
  }

  test("empty micro-batch: seals nothing, publishes nothing; a later real append of the same tag still commits") {
    val base = 0L until 20L
    val idx = newIndex("graft_ixempty", base)
    val v0 = IndexLifecycle.versions(spark, idx).max
    val pre = postings(idx)
    // an empty trigger (all rows hot-filtered, or a source with no new
    // data): writeSeg produces no data files at all
    IndexLifecycle.appendSegment(spark, idx, "eb0") { (_, _) => () }
    assert(IndexLifecycle.versions(spark, idx).max == v0,
      "an empty micro-batch must not bump the manifest version")
    assert(!IndexLifecycle.manifestAt(spark, idx, v0).segments.contains("eb0") &&
      IndexLifecycle.segmentsOf(fsOf(idx),
        new Path(IndexLifecycle.resolveDir(spark, idx))).forall(_ != "eb0"),
      "an empty micro-batch must not pin a phantom tag in the chain")
    assert(postings(idx) == pre)
    // the SAME tag later carrying real data must still commit — the
    // empty trigger reserved nothing
    val batch = 850L until 858L
    append(idx, batch, "eb0")
    val v1 = IndexLifecycle.versions(spark, idx).max
    assert(v1 == v0 + 1)
    assert(postings(idx) == expected(base ++ batch))
    // and the pinned read of the new version resolves every chained
    // segment — the crash mode the empty-batch guard exists to prevent
    assert(pinnedPostings(idx, v1) == expected(base ++ batch))
    assert(dupPostings(idx).isEmpty)
  }

  test("empty replay of a non-empty tag: the committed copy survives — no phantom segment in the published chain") {
    val base = 0L until 20L
    val batch = 900L until 908L
    val idx = newIndex("graft_ixereplay", base)
    append(idx, batch, "er1")
    val v = IndexLifecycle.versions(spark, idx).max
    val want = expected(base ++ batch)
    assert(postings(idx) == want)
    // non-deterministic replay: the original batch committed rows, the
    // replay writes NOTHING — the previously sealed copy (still
    // referenced by every published version's chain) must stay intact
    IndexLifecycle.appendSegment(spark, idx, "er1") { (_, _) => () }
    assert(IndexLifecycle.versions(spark, idx).max == v,
      "an empty replay must not publish")
    assert(fsOf(idx).exists(new Path(IndexLifecycle.resolveDir(spark, idx),
      "ingest=er1")), "the empty replay deleted the committed segment dir")
    assert(postings(idx) == want,
      "the empty replay orphaned the chain (phantom segment)")
    assert(pinnedPostings(idx, v) == want)
    assert(dupPostings(idx).isEmpty)
  }

  if (memoryCommit)
    test("memory commit really owns the chain: no marker files ever touch the filesystem") {
      val idx = newIndex("graft_ixmem", 0L until 10L)
      append(idx, 800L until 805L, "m0")
      val fs = fsOf(idx)
      val names = fs.listStatus(new Path(idx)).map(_.getPath.getName)
      assert(!names.exists(_.startsWith("_graft_ixgen.")),
        s"marker files leaked to the filesystem: ${names.mkString(",")}")
      assert(IndexLifecycle.manifest(spark, idx).exists(_.v >= 3L))
    }
}

/** Filesystem commit backend (hard-link CAS on `file:`). */
class IndexLifecycleSpec extends IndexLifecycleContract(memoryCommit = false) {

  test("cross-process CAS: two JVMs racing exclusive marker creates get exactly one winner per version") {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft_casx").toString
    val ready = dir + "/.go"
    val n = 300
    val cp = System.getProperty("java.class.path")
    assert(cp.contains("classes"), s"test classpath not propagated: $cp")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val childOut = new StringBuilder
    val child = Process(Seq(javaBin, "-Xmx256m", "-cp", cp,
      "graft.tools.CasContend", dir, n.toString, "child", ready))
      .run(ProcessLogger(l => childOut.synchronized { childOut.append(l).append('\n') }))
    val fs = new Path(dir).getFileSystem(
      GraftSpark.spark.sparkContext.hadoopConfiguration)
    val mc = new graft.sources.FsManifestCommit(fs, new Path(dir))
    // start both contenders together
    java.nio.file.Files.write(java.nio.file.Paths.get(ready), Array[Byte]())
    val mine = (1 to n).filter { v =>
      mc.createExclusive(f"_graft_ixgen.g$v%09d", "parent".getBytes("UTF-8"))
    }.toSet
    assert(child.exitValue() == 0, s"child JVM failed:\n$childOut")
    val theirs = childOut.toString.linesIterator
      .find(_.startsWith("WON:")).map(_.stripPrefix("WON:"))
      .map(_.split(",").toSeq.filter(_.nonEmpty).map(_.toInt).toSet)
      .getOrElse(fail(s"no WON line from child:\n$childOut"))
    // THE atomicity property: no version both processes think they won.
    // (Hadoop's check-then-create local fs fails this under contention;
    // the kernel-atomic hard link cannot.)
    assert((mine & theirs).isEmpty,
      s"both processes committed versions ${(mine & theirs).toSeq.sorted.take(10)}")
    assert((mine | theirs) == (1 to n).toSet,
      "every version must have exactly one winner")
    // and each marker's payload is its winner's, written atomically
    val sample = (1 to n by 37)
    sample.foreach { v =>
      val owner = new String(mc.read(f"_graft_ixgen.g$v%09d").get, "UTF-8")
      assert(owner == (if (mine(v)) "parent" else "child"),
        s"version $v payload '$owner' does not match its winner")
    }
  }
}

/** Conditional-PUT commit backend (the S3 If-None-Match shape). */
class IndexLifecycleMemoryCommitSpec
  extends IndexLifecycleContract(memoryCommit = true)
