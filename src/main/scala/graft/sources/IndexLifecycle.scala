package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic-concurrency lifecycle for the persisted index families
  * (shingle postings, semantic cell, IVF inverted lists, phash bands,
  * ER deletion variants, span fingerprints, BM25 postings) — the fenced
  * counterpart of the table-side generational layout ([[Compaction]]),
  * built for the deployment shape the staged/retired swap could only
  * document away: several jobs appending to and rebuilding the SAME
  * index concurrently.
  *
  * == Layout ==
  * {{{
  * index/
  *   _graft_ixgen.g000000007   <- version marker V=7 (payload below)
  *   _graft_claim.g000000002   <- data-dir claims (Compaction.claimNext)
  *   g000000002/               <- data dir: ingest=<tag>/<part>=<v>/ parquet
  *                                + underscore sidecars (_graft_hot, ...)
  * }}}
  * A marker's payload names the data dir it publishes, the exact
  * `ingest=` segment set visible AS OF that version (chain-derived —
  * see below), and, for a rebuild, the segment set the rebuild
  * absorbed. Markers are CONSECUTIVE: version V+1 can only be
  * committed by atomically exclusive-creating `_graft_ixgen.g{V+1}` —
  * that create IS the compare-and-swap every mutation commits through,
  * so two concurrent publishes against the same observed version have
  * exactly one winner (the Iceberg commit protocol, reduced to one
  * pointer file).
  *
  * == Why CAS instead of the table fence ==
  * Tables only ever REPLACE state, so "highest generation wins, losers
  * fenced" is enough. An index interleaves two mutation kinds:
  * additive appends (cheap, touch one segment) and absorbing rebuilds
  * (expensive, read-everything-write-base). Max-wins fencing loses an
  * append sealed between a rebuild's read and its publish — silently.
  * Under CAS the rebuild's commit FAILS unless the manifest is exactly
  * the version it read, so any interleaved append fences it; and a
  * fenced appender learns from the winning rebuild's `absorbed` list
  * whether its segment was read (→ done) or missed (→ re-seal into the
  * new dir), closing the duplicate-on-blind-retry hole too.
  *
  * == Atomic segment visibility ==
  * Appends never write into the live tree directly: the segment is
  * fully written to a dot-temp inside the data dir, then RENAMED to
  * `ingest=<tag>` — a reader or rebuild listing the dir sees the whole
  * segment or none of it, which is what makes the `absorbed` list (and
  * the replayed-batch overwrite) exact rather than racy.
  *
  * == Version-pinned reads ==
  * Appends mutate the CURRENT data dir (that is what makes them cheap),
  * so the dir name alone cannot replay "the index as of version V".
  * The marker payload can: each publish records the segment set
  * committed as of that version, derived from the CHAIN (an append is
  * its predecessor's set plus its own tag; a rebuild is its fresh
  * dir's listing; a forget is its predecessor's set minus segments it
  * emptied) — never from a racy concurrent listing, so version V's set
  * contains exactly the segments whose commits are ≤ V.
  * [[manifestAt]]/[[resolveDirAt]] resolve a retained version for
  * replayable reads (training-export pinning); [[versions]] lists what
  * is still readable. Retention note: the window is [[MarkerKeep]]
  * markers and the last two DISTINCT data dirs, so versions older than
  * the previous rebuild age out — pin exports promptly. RTBF note:
  * forgets rewrite files in place, so pinned reads do NOT resurrect
  * forgotten rows — deliberately: a right-to-be-forgotten erasure must
  * reach historical reads too.
  *
  * == Commit adapter (object stores) ==
  * The marker create commits through the [[ManifestCommit]] SPI: HDFS
  * uses the namenode-atomic create, `file:` uses kernel-atomic hard
  * links — a REAL cross-process CAS on a shared posix mount — and
  * stores without an atomic filesystem create (s3/gs/abfs) take a
  * registered conditional-PUT adapter ([[ManifestCommit.register]];
  * [[MemoryManifestCommit]] is the reference implementation the race
  * and soak specs run against). The DATA plane still needs atomic
  * directory rename for sealed-segment visibility; on a store without
  * it, readers must resolve segment membership from the manifest
  * ([[manifestAt]]) rather than a directory listing — the sealed dir
  * may appear file-by-file, but it is not referenced until its publish
  * commits.
  *
  * == Compatibility ==
  * A FLAT index (built by any `write*Index` at a plain path, no
  * markers) stays fully supported: [[resolveDir]] is the identity,
  * appends seal segments without a version bump (single-maintainer
  * discipline, as before), and the first [[rebuild]] converts the index
  * in place (one-time file moves — run it inside a quiet window, same
  * caveat as [[Compaction.toGenerational]]).
  */
object IndexLifecycle {

  private val Marker = "_graft_ixgen."
  private val SegPrefix = "ingest="
  private val TmpPrefix = ".graft_seg_tmp_"
  /** Versions retained for late CAS losers to reconstruct what they
    * missed; a mutator more than this many publishes behind fails
    * loudly instead of guessing.
    */
  private[graft] val MarkerKeep = 8

  val DefaultOrphanGraceMs: Long = Compaction.DefaultOrphanGraceMs

  /** In-JVM fast path serializing marker creates: local[*] runs (and
    * the soak specs) race many threads against one chain, and taking a
    * lock is cheaper than losing the store-level CAS and re-listing.
    * Correctness does NOT depend on it — the store-level exclusive
    * create ([[ManifestCommit]]) is atomic across processes on every
    * supported backend, hard links included on `file:`.
    */
  private val publishLock = new Object

  /** `segmentsRecorded` distinguishes a marker whose publisher RECORDED
    * an (possibly empty) segment set from a pre-segment-format marker
    * with no `segments=` key at all: an all-forgotten version's set is
    * legitimately empty and must stay pinned/replayable as such, never
    * silently re-derived from a (racy) directory listing.
    */
  final case class Manifest(v: Long, dir: String, absorbed: Seq[String],
                            segments: Seq[String],
                            segmentsRecorded: Boolean = true)

  private val CapableSchemes =
    Set("file", "local", "hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")

  /** Capability gate: the manifest chain needs an atomic exclusive
    * create (native on [[CapableSchemes]]; via a registered
    * [[ManifestCommit]] adapter elsewhere) and sealed segments need
    * atomic directory rename. With an adapter on a store WITHOUT
    * atomic rename, manifest commits are sound but listing-based reads
    * lose the all-or-nothing segment guarantee — see the class doc's
    * commit-adapter section for the manifest-pinned read contract.
    */
  private def requireCapableFs(fs: FileSystem, main: Path, ctx: String): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
    require(CapableSchemes(scheme) || ManifestCommit.hasOverride(main),
      s"$ctx needs an atomic manifest commit and atomic directory " +
        s"rename; filesystem scheme '$scheme' guarantees neither " +
        "natively — register a conditional-PUT ManifestCommit adapter " +
        "for this index root (ManifestCommit.register, the S3 " +
        "If-None-Match shape; graft.sources.MemoryManifestCommit is " +
        "the reference implementation), and read via manifest-pinned " +
        "segment sets where the store lacks atomic rename")
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitOf(spark: SparkSession, main: Path): ManifestCommit =
    ManifestCommit.forIndex(fsOf(spark, main), main)

  /** Invalidate any cached plans reading under `path`. A DataFrame
    * WRITE triggers Spark's own recacheByPath, but the lifecycle's
    * mutations commit through RAW FileSystem renames (sealed segments,
    * version publishes) that Spark never sees — without this, a
    * persisted frame built over the index (a probe's owned hit cache,
    * a user's .cache()) keeps serving the pre-mutation file set
    * forever. Measured: a standing-query probe re-run after a sealed
    * append returned the old corpus with fresh stats — stale rows,
    * current constants, silently wrong.
    *
    * refreshByPath RE-MATERIALIZES the affected entries, which throws
    * if a stale plan no longer parses against the mutated layout (a
    * cached flat-root read after the first rebuild converts the index
    * to generational hits CONFLICTING_DIRECTORY_STRUCTURES). The
    * intent here is INVALIDATION, not refresh. CacheManager's
    * recacheByCondition removes a matching entry from the registry and
    * clears its buffers BEFORE attempting the rebuild that throws, so
    * every failed refreshByPath call has already invalidated at least
    * the entry that threw — retrying the call processes the remaining
    * matches and converges with all stale entries under `path`
    * dropped. The previous fallback cleared the WHOLE session cache,
    * which both recomputed unrelated entries and raced concurrent
    * jobs reading their own persisted frames (a prober's in-flight
    * task died with "Block rdd_N does not exist" when a rebuilder's
    * fallback dropped its blocks mid-job — the two-writer soak).
    *
    * Known bounded leak (r17 ADVICE, accepted trade-off): when a
    * refreshByPath attempt throws AFTER recacheByCondition deregistered
    * several matching entries, the entries deregistered in that same
    * batch but never re-materialized keep their cached RDD blocks
    * orphaned — unreachable by any retry (they are no longer
    * registered) and unpersisted only at session stop. Only the rare
    * layout-changing-mutation error path hits this, the orphaned
    * storage is bounded by what was cached under the mutated path, and
    * the alternative (clearCache() on first failure) re-introduces the
    * two-writer race above — storage pressure there is preferred over
    * correctness here.
    */
  private def refresh(spark: SparkSession, path: String): Unit = {
    var attempts = 0
    var done = false
    while (!done && attempts < 64) {
      attempts += 1
      try { spark.catalog.refreshByPath(path); done = true }
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[IndexLifecycle] refreshByPath($path) " +
            s"attempt $attempts dropped a stale entry " +
            s"(${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString +
            ") — retrying for the remaining entries")
      }
    }
    // 64 distinct failing entries under one index path means something
    // structural; the session-wide clear is the last-resort guarantee
    if (!done) spark.catalog.clearCache()
  }

  private def markerName(v: Long): String = Marker + Compaction.genName(v)

  private val LeaseMarker = "_graft_ixlease."

  /** Retention leases on index manifest versions — the index twin of
    * [[Compaction.acquireLease]]: a `_graft_ixlease.<leaseId>` object
    * in the SAME commit store as the version markers pins version `v`
    * past the [[MarkerKeep]]-marker / two-dir retention window.
    * [[pruneMarkers]] and [[prune]] keep a leased version's marker and
    * its data dir until every lease naming it is released.
    *
    * PRECEDENCE: leases hold RETENTION only. [[forgetViaRebuild]] /
    * [[scrubRetired]] — the RTBF erasure path — stay lease-blind: the
    * leased version's dir is physically scrubbed and later pinned
    * reads ([[manifestAt]] / the `*AgainstIndexAt` probes) fail with
    * the established retention messages. Leases defer garbage
    * collection; they never veto erasure.
    */
  def acquireLease(spark: SparkSession, path: String, v: Long,
                   leaseId: String): Unit = {
    Compaction.requireLeaseId(leaseId)
    val main = new Path(path)
    val mc = commitOf(spark, main)
    manifestAt(spark, path, v) // throws when v is not pinnable
    val name = LeaseMarker + leaseId
    // `placed` gating + refresh-only-under-expiry: the same contract as
    // [[Compaction.acquireLease]] (which owns the full scaladoc) — a
    // no-expiry re-acquire is a pure no-op, an expiry keep-alive goes
    // through the cleanup-race-safe refresh loop, and only an acquire
    // that PLACED the marker re-verifies against delete intents.
    var placed = mc.createExclusive(name,
      Compaction.genName(v).getBytes("UTF-8"))
    if (!placed) {
      val held = mc.read(name).map(new String(_, "UTF-8"))
      require(held.contains(Compaction.genName(v)),
        s"index lease '$leaseId' at $path already pins version " +
          s"${held.getOrElse("?")}, not v$v — release it first or use " +
          "a distinct leaseId per export")
      if (Compaction.leaseMaxAgeMs(
          spark.sparkContext.hadoopConfiguration) > 0L) {
        Compaction.refreshLeaseMarker(mc, name, Compaction.genName(v),
          s"index lease '$leaseId' at $path")
        placed = true
      }
    }
    // re-verify after the lease lands: still pinnable, and no pruner
    // mid-delete on the version's marker or its data dir (the announce
    // → re-list → delete protocol; proof on
    // [[Compaction.deleteUnlessLeased]])
    try {
      val m = manifestAt(spark, path, v)
      val grace = Compaction.intentGraceMs(
        spark.sparkContext.hadoopConfiguration)
      if (placed && (
          Compaction.liveIntent(mc, s"marker.${Compaction.genName(v)}",
            grace) ||
          Compaction.liveIntent(mc, s"dir.${m.dir}", grace)))
        sys.error(s"index version $v at $path is being pruned while " +
          "acquiring the lease — re-derive the pin from current state")
    } catch { case e: Throwable => mc.delete(name); throw e }
  }

  /** Enumerate every retention lease on the index at `path` —
    * the index twin of [[Compaction.listLeases]] (version in place of
    * generation; same expiry verdict from [[Compaction.LeaseMaxAgeKey]]).
    */
  def listLeases(spark: SparkSession, path: String): Seq[Compaction.Lease] = {
    val main = new Path(path)
    val mc = commitOf(spark, main)
    val maxAge = Compaction.leaseMaxAgeMs(
      spark.sparkContext.hadoopConfiguration)
    val now = System.currentTimeMillis()
    mc.list(LeaseMarker).sorted.map { name =>
      val payload = mc.read(name).map(new String(_, "UTF-8")).getOrElse("")
      val age = mc.createdAt(name).map(t => math.max(0L, now - t))
      Compaction.Lease(name.stripPrefix(LeaseMarker),
        Compaction.genNumber(payload), payload, age,
        maxAge > 0 && age.exists(_ >= maxAge))
    }
  }

  /** Release an index retention lease; the version re-enters normal
    * retention on the next rebuild's prune.
    */
  def releaseLease(spark: SparkSession, path: String, leaseId: String): Unit = {
    Compaction.requireLeaseId(leaseId)
    commitOf(spark, new Path(path)).delete(LeaseMarker + leaseId)
  }

  /** Versions currently held by at least one LIVE lease — bounded
    * metadata (expired leases pin nothing when `maxAgeMs` > 0; the
    * [[Compaction.LeaseMaxAgeKey]] policy, threaded by callers).
    */
  private def leasedVersions(mc: ManifestCommit,
                             maxAgeMs: Long = 0L): Set[Long] = {
    val now = System.currentTimeMillis()
    mc.list(LeaseMarker)
      .filter(n => maxAgeMs <= 0 ||
        mc.createdAt(n).forall(t => now - t < maxAgeMs))
      .flatMap(n => mc.read(n))
      .map(new String(_, "UTF-8"))
      .flatMap(Compaction.genNumber)
      .toSet
  }

  /** Expired-lease marker hygiene (maxAge enabled only): the dead
    * marker would otherwise block its leaseId forever. Run at the
    * prune sites — the same place [[Compaction.pruneDataDirs]] cleans
    * its plane's expired markers.
    */
  private def cleanExpiredLeases(mc: ManifestCommit, maxAgeMs: Long): Unit =
    if (maxAgeMs > 0) {
      val now = System.currentTimeMillis()
      mc.list(LeaseMarker).foreach { n =>
        if (mc.createdAt(n).exists(t => now - t >= maxAgeMs)) mc.delete(n)
      }
    }

  /** The index-plane twin of [[Compaction.deleteUnlessLeased]]:
    * announce a unique `_graft_intent.<target>.<token>` in the SAME
    * commit store as the leases, re-evaluate `pinned` AFTER the intent
    * is visible, delete only when unpinned, remove the intent. Targets
    * are namespaced (`marker.g<v>` / `dir.<name>`) because version
    * markers and claim-numbered data dirs occupy different number
    * spaces; [[acquireLease]] re-verifies both namespaces. Proof and
    * the orphan-grace liveness assumption live on the Compaction twin.
    * `afterRelist` is the deterministic-interleaving test seam.
    */
  private[graft] def deleteUnlessPinned(mc: ManifestCommit, target: String,
                                        pinned: () => Boolean,
                                        doDelete: () => Unit,
                                        afterRelist: () => Unit = () => ()): Boolean = {
    val name = Compaction.IntentPrefix + target + "." +
      java.util.UUID.randomUUID().toString.take(8)
    if (!mc.createExclusive(name, target.getBytes("UTF-8")))
      return false // token collision — skip; the next cycle retries
    try {
      val p = pinned()
      afterRelist()
      if (p) false else { doDelete(); true }
    } finally mc.delete(name)
  }

  private def markerNums(mc: ManifestCommit): Seq[Long] =
    mc.list(Marker).flatMap(n => Compaction.genNumber(n.stripPrefix(Marker)))

  /** Operator console for an index chain — the
    * [[Compaction.describe]] twin: one row per manifest version,
    * claim, and lease:
    * `(kind, name, version, status, dir, segments, absorbed, age_ms)`
    * — a version is `current` / `retained` (its dir still present) /
    * `dir_pruned` (marker retained past the two-dir window — readable
    * metadata, unpinnable data); leases are `held`/`expired` under
    * [[Compaction.LeaseMaxAgeKey]]. Bounded metadata only.
    */
  def describe(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val mc = commitOf(spark, main)
    val now = System.currentTimeMillis()
    val nums = markerNums(mc).sorted
    val cur = nums.lastOption
    val verRows = nums.map { v =>
      val m = readMarker(mc, v)
      val dir = m.map(_.dir)
      val hasDir = dir.exists(d => fs.exists(new Path(main, d)))
      val status =
        if (cur.contains(v) && hasDir) "current"
        else if (hasDir) "retained"
        else "dir_pruned"
      ("version", f"v$v", Some(v), status, dir,
        m.map(_.segments.length.toLong), m.map(_.absorbed.length.toLong),
        mc.createdAt(markerName(v)).map(t => math.max(0L, now - t)))
    }
    val claimRows = (
      if (!fs.exists(main)) Seq.empty
      else fs.listStatus(main).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(Compaction.ClaimPrefix))
        .flatMap(n => Compaction.genNumber(n.stripPrefix(Compaction.ClaimPrefix)))
      ).sorted.map { g =>
      ("claim", Compaction.genName(g), Some(g), "claimed",
        None: Option[String], None: Option[Long], None: Option[Long],
        try Some(math.max(0L, now - fs.getFileStatus(new Path(main,
          Compaction.ClaimPrefix + Compaction.genName(g)))
          .getModificationTime))
        catch { case _: java.io.FileNotFoundException => None })
    }
    val leaseRows = listLeases(spark, path).map { l =>
      ("lease", l.leaseId, l.gen, if (l.expired) "expired" else "held",
        None: Option[String], None: Option[Long], None: Option[Long],
        l.ageMs)
    }
    // delete intents (the [[deleteUnlessPinned]] announce phase) —
    // `marker.g<v>.<token>` / `dir.<name>.<token>`; a "stale" one is a
    // crashed pruner's leftover, ignored by acquirers, cleaned by the
    // next prune cycle (the Compaction.describe twin row)
    val intentGrace = Compaction.intentGraceMs(
      spark.sparkContext.hadoopConfiguration)
    val intentRows = mc.list(Compaction.IntentPrefix).sorted.map { n =>
      val body = n.stripPrefix(Compaction.IntentPrefix)
      val a = mc.createdAt(n).map(t => math.max(0L, now - t))
      ("intent", body, None: Option[Long],
        if (a.forall(_ < intentGrace)) "announced" else "stale",
        None: Option[String], None: Option[Long], None: Option[Long], a)
    }
    import spark.implicits._
    (verRows ++ claimRows ++ leaseRows ++ intentRows).toDF("kind", "name",
      "version", "status", "dir", "segments", "absorbed", "age_ms")
  }

  /** Read marker V's payload. On the HDFS commit branch the
    * create→write→close of a publish is not one atomic step, so a
    * listing can surface a marker whose payload is still empty for a
    * moment — back off EXPONENTIALLY (seconds in total, not
    * milliseconds: a live cross-process publisher stalled by GC or
    * scheduling holds the window open far longer than a context
    * switch), then fail loudly. Never fall back to an older version:
    * that would be a silent stale read. The local hard-link and
    * conditional-PUT branches land payload-atomically and never take
    * a single retry.
    */
  private def readMarker(mc: ManifestCommit, v: Long): Option[Manifest] = {
    val name = markerName(v)
    var tries = 0
    while (tries < 14) { // 2+4+...+8192 ms ≈ 16 s total before giving up
      mc.read(name) match {
        case None => return None
        case Some(bytes) =>
          val lines = new String(bytes, "UTF-8").linesIterator.toSeq
          val dir = lines.collectFirst {
            case l if l.startsWith("dir=") => l.stripPrefix("dir=") }
          dir match {
            case Some(d) if d.nonEmpty =>
              def field(key: String): Option[Seq[String]] = lines.collectFirst {
                case l if l.startsWith(key + "=") =>
                  l.stripPrefix(key + "=").split(",").toSeq.filter(_.nonEmpty)
              }
              val segs = field("segments")
              return Some(Manifest(v, d,
                field("absorbed").getOrElse(Seq.empty),
                segs.getOrElse(Seq.empty),
                segmentsRecorded = segs.isDefined))
            case _ =>
              tries += 1
              Thread.sleep(math.min(2L << tries, 8192L)) // publisher mid-write
          }
      }
    }
    sys.error(s"index manifest ${mc.describe}/$name stayed unreadable for " +
      "~16s. Either the publisher crashed between create and write (then " +
      "deleting the empty marker recovers — its version was never " +
      "visible), or it is alive but badly stalled: verify the publishing " +
      "job is dead before deleting, or a live publish gets a hole " +
      "punched into a healthy chain")
  }

  /** Current manifest of the index at `path`, None if flat. None is
    * returned ONLY when no markers are listed at all: a max-listed
    * marker whose read comes back absent (pruned because MarkerKeep
    * newer publishes landed between the listing and the read — the
    * churn-soak shape) forces a RE-LIST, never a silent flat fallback.
    * Degrading to None here is the worst failure mode in the file: the
    * caller treats a generational index as flat, resolveDir returns
    * the ROOT, and an appendSegment would seal a batch next to the g*
    * dirs where no generational reader ever looks — a silently lost
    * batch under an already-committed stream checkpoint.
    */
  def manifest(spark: SparkSession, path: String): Option[Manifest] = {
    val mc = commitOf(spark, new Path(path))
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      markerNums(mc).maxOption match {
        case None => return None // genuinely flat: nothing listed
        case Some(v) =>
          readMarker(mc, v) match {
            case some @ Some(_) => return some
            case None => () // max marker pruned mid-read — re-list
          }
      }
    }
    sys.error(s"manifest: the newest marker at ${mc.describe} kept " +
      "vanishing mid-read across 8 re-listings — a publisher is pruning " +
      "faster than this reader can list; retry the operation")
  }

  /** Union of the `absorbed` lists across every RETAINED marker up to
    * and including version `upTo` — what [[appendSegment]]'s replay
    * pre-check consults before sealing anything. A marker that
    * vanishes between the listing and its read (a concurrent
    * publisher's prune) forces a full re-list rather than a skip: the
    * dropped manifest could be exactly the absorbing rebuild, and
    * treating it as absent would green-light a duplicating re-seal.
    */
  private def absorbedWithin(mc: ManifestCommit, upTo: Long): Set[String] = {
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      val reads = markerNums(mc).filter(_ <= upTo).map(v => readMarker(mc, v))
      if (!reads.exists(_.isEmpty)) return reads.flatMap(_.get.absorbed).toSet
    }
    sys.error(s"absorbedWithin: markers at ${mc.describe} kept vanishing " +
      "mid-read across 8 re-listings — a publisher is pruning faster " +
      "than this reader can list; re-run the append")
  }

  /** The directory every read, probe, sidecar access, in-place rewrite
    * and segment seal must target: the current version's data dir for
    * a generational index, `path` itself for a flat one. Reading the
    * ROOT of a generational index is always wrong (it holds every
    * retained version).
    */
  def resolveDir(spark: SparkSession, path: String): String =
    manifest(spark, path) match {
      case Some(m) => new Path(new Path(path), m.dir).toString
      case None => path
    }

  /** Manifest versions still READABLE at `path` (marker retained and
    * its data dir present), ascending — the index-side counterpart of
    * [[Compaction.generations]]. This is the time-travel window for
    * [[manifestAt]]: at most [[MarkerKeep]] versions, fewer once a
    * rebuild's pruning drops the pre-previous data dir.
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val mc = commitOf(spark, main)
    markerNums(mc).sorted.flatMap(v => readMarker(mc, v))
      .filter(m => fs.exists(new Path(main, m.dir)))
      .map(_.v)
  }

  /** Pinned read of the manifest AS OF version `v` — the reproducible
    * training-export hook: a probe against `manifestAt(v)`'s dir
    * restricted to its `segments` replays the corpus exactly as the
    * export that recorded `v` saw it (minus any rows a later forget
    * erased — see the class doc's RTBF note). Fails loudly when `v`
    * was pruned out of the retention window or predates the
    * segment-pinned payload format — a silent fallback to current
    * would be a wrong answer, not a degraded one.
    */
  def manifestAt(spark: SparkSession, path: String, v: Long): Manifest = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val mc = commitOf(spark, main)
    val m = readMarker(mc, v).getOrElse(sys.error(
      s"index version $v at $path is not readable — never published or " +
        s"outside the $MarkerKeep-marker retention window (readable: " +
        s"${versions(spark, path).mkString(",")})"))
    require(fs.exists(new Path(main, m.dir)),
      s"index version $v at $path names data dir ${m.dir}, which a later " +
        "rebuild's retention already pruned (readable: " +
        s"${versions(spark, path).mkString(",")})")
    require(m.segmentsRecorded,
      s"index version $v at $path predates segment-pinned manifests — " +
        "no replayable segment set was recorded; re-publish (any append " +
        "or rebuild) to start the pinnable chain")
    m
  }

  /** Data dir of version `v` (see [[manifestAt]] for the contract). */
  def resolveDirAt(spark: SparkSession, path: String, v: Long): String =
    new Path(new Path(path), manifestAt(spark, path, v).dir).toString

  private def payloadOf(dir: String, absorbed: Seq[String],
                        segments: Seq[String]): String =
    s"dir=$dir\nabsorbed=${absorbed.mkString(",")}\n" +
      s"segments=${segments.mkString(",")}\n"

  /** The commit primitive: atomically create marker `expectV + 1`
    * through the index's [[ManifestCommit]]. Returns false when
    * another publisher committed that version first — the caller
    * re-reads the manifest and reconciles.
    *
    * The PRE-create max check (not a post-create withdrawal) is what
    * keeps the chain consecutive: if the manifest already moved past
    * `expectV`, the publish is stale and fails WITHOUT creating
    * anything. Once the exclusive create succeeds the marker is in the
    * chain for good — a later publisher may legitimately chain the
    * next version onto it before this call even returns, so deleting
    * it on a post-create "not the max anymore" observation would
    * punch a hole other mutators' absorbed-list reconstruction (and a
    * newer payload's dir reference) depend on. The one interleaving
    * the old withdrawal guarded — this number was pruned away and
    * recreated below a newer chain — requires the chain to advance
    * past the whole [[MarkerKeep]] retention window between the
    * pre-check and the create; every caller re-reads the manifest
    * within one CAS round, so that window is a handful of
    * instructions, not eight publishes.
    */
  private def casPublish(mc: ManifestCommit, expectV: Long, dir: String,
                         absorbed: Seq[String],
                         segments: Seq[String]): Boolean =
    publishLock.synchronized {
      if (markerNums(mc).maxOption.getOrElse(0L) != expectV)
        return false
      mc.createExclusive(markerName(expectV + 1),
        payloadOf(dir, absorbed, segments).getBytes("UTF-8"))
    }

  /** Segment tags (`ingest=` values) present in a data dir. */
  private[graft] def segmentsOf(fs: FileSystem, dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(SegPrefix))
      .map(_.stripPrefix(SegPrefix)).sorted

  /** The CHAIN-DERIVED segment set a publish against manifest `m`
    * starts from: the predecessor's recorded set, falling back to a
    * dir listing only for pre-segment-format markers (one transitional
    * listing; every publish after it records the set). Chain
    * derivation — not listing at publish time — is what keeps version
    * V's set closed under "commits ≤ V": a concurrently SEALED but
    * not-yet-published segment is visible in a listing but must not
    * leak into another publisher's pinned set.
    */
  private def chainSegments(fs: FileSystem, main: Path, m: Manifest): Seq[String] =
    if (m.segmentsRecorded) m.segments
    else segmentsOf(fs, new Path(main, m.dir))

  /** Write-then-rename a segment into `dir/ingest=<tag>`. `writeSeg`
    * gets (data dir, temp output dir): it reads any sidecars from the
    * former and writes the segment's parquet (partitioned by the
    * family's second-level column only — `ingest` comes from the
    * directory name) into the latter. Replays of the same tag replace
    * the whole segment subtree — strictly stronger idempotency than
    * the dynamic-partition overwrite this replaces. Returns false for
    * an empty segment: nothing is written AND any previously sealed
    * copy of the tag is left INTACT — that copy may be referenced by
    * the published manifest chain (a replay whose original batch was
    * non-empty), and deleting it here would leave every live version
    * pointing at a vanished dir (a phantom segment readers crash on).
    * An empty replay of a non-empty batch is a non-deterministic
    * source; keeping the originally committed rows is the consistent
    * resolution.
    *
    * Atomicity, honestly: a FIRST seal is all-or-nothing (one rename —
    * what the rebuild's absorbed-list exactness relies on). A REPLAY
    * of an existing tag cannot be (no atomic non-empty-dir replace on
    * HDFS): the old copy swings out and the new one in as two renames,
    * so a listing in that instruction-wide window misses the segment.
    * The window only exists on the at-least-once crash-recovery path,
    * the swung-out copy is parked (not deleted) until the new one is
    * in place — a crash between the renames leaves the replay to
    * re-run, never a half-segment — and the replaying trigger's OWN
    * probe already excludes its tag; only an unrelated concurrent
    * reader in that window sees the corpus briefly without one batch.
    */
  private def sealSegment(fs: FileSystem, dir: Path, tag: String)
                         (writeSeg: (String, String) => Unit): Boolean = {
    val segDir = new Path(dir, SegPrefix + tag)
    val tmp = new Path(dir, TmpPrefix + tag)
    val old = new Path(dir, TmpPrefix + tag + ".replaced")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // a prior replay crashed BETWEEN its two renames (segDir parked at
    // `old`, replacement never swung in): the parked copy is the ONLY
    // committed copy of a segment every retained manifest still
    // references — RESTORE it before anything can fail again. Deleting
    // it here (the pre-round-12 behavior) was the one way a committed
    // segment could be permanently lost: if this replay's writeSeg then
    // crashed or produced an empty batch, all copies were gone while
    // the chain still pinned the tag. When BOTH exist, the crash was
    // after the swap-in — the parked copy is the superseded duplicate
    // and deleting it is the normal cleanup.
    if (fs.exists(old)) {
      if (!fs.exists(segDir)) {
        if (!fs.rename(old, segDir))
          sys.error(s"sealSegment: restore of parked $old -> $segDir failed")
      } else fs.delete(old, true)
    }
    writeSeg(dir.toString, tmp.toString)
    val hasData = fs.exists(tmp) && fs.listStatus(tmp).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasData) {
      fs.delete(tmp, true)
      return false
    }
    if (fs.exists(segDir) && !fs.rename(segDir, old))
      sys.error(s"sealSegment: rename $segDir -> $old failed")
    if (!fs.rename(tmp, segDir))
      sys.error(s"sealSegment: rename $tmp -> $segDir failed")
    fs.delete(old, true)
    true
  }

  /** Append one ingest segment to the index — the probe-then-append
    * loops' write half for every family. Seals atomically into the
    * current data dir, then (generational only) commits a version bump
    * so any in-flight rebuild is fenced. On losing the CAS:
    *  - another APPEND won (dir unchanged): our segment is already in
    *    place, only the version retry is needed;
    *  - a REBUILD won that absorbed our sealed segment (tag in its
    *    `absorbed` list): done — the rows live on in the new base, and
    *    re-sealing would duplicate them;
    *  - a REBUILD won that missed us: re-seal into its output dir and
    *    commit again.
    * A marker that VANISHES between the version listing and its read
    * (a concurrent publisher's pruning) is never skipped — the dropped
    * manifest could be exactly the rebuild that absorbed this tag, and
    * skipping it would re-seal and duplicate; the loop re-lists and
    * retries, failing loudly once the retention window has truly moved
    * past this appender.
    * Tag uniqueness across distinct batches is the caller's contract
    * (a streaming batchId); replays of the SAME tag are idempotent.
    */
  def appendSegment(spark: SparkSession, path: String, tag: String)
                   (writeSeg: (String, String) => Unit): Unit = {
    require(tag.nonEmpty && tag != "base" && !tag.contains(",") &&
        !tag.contains("/") && !tag.contains("\n"),
      s"ingest tag must be a plain non-'base' batch identifier: '$tag'")
    val main = new Path(path)
    val fs = fsOf(spark, main)
    requireCapableFs(fs, main, "IndexLifecycle.appendSegment")
    val mc = commitOf(spark, main)
    manifest(spark, path) match {
      case None =>
        sealSegment(fs, main, tag)(writeSeg)
        refresh(spark, path)
      case Some(m0) =>
        // Replay pre-check, BEFORE any seal: a crash between the index
        // commit and the stream's checkpoint commit replays the batch,
        // and if a rebuild absorbed this tag into base in that window
        // (in-loop compaction makes this routine), the tag is gone from
        // the segment listing — a blind re-seal would duplicate every
        // row of the batch in base + ingest=<tag>, silently inflating
        // all later probes. Absorption is decidable within the marker
        // retention window ([[MarkerKeep]] publishes); a replay older
        // than that re-seals — the same horizon as the CAS-loss guard
        // below, and far beyond the at-least-once crash window this
        // protects (a stream restarts on its LAST uncommitted batch).
        // Steady-state cost of the pre-check: one marker listing plus
        // ≤ MarkerKeep(8) bounded marker reads per append — metadata
        // only, paid once per streaming trigger; the segment listing
        // is reused by the loop's first iteration below.
        val segs0 = chainSegments(fs, main, m0)
        if (!segs0.contains(tag) && absorbedWithin(mc, m0.v).contains(tag)) {
          refresh(spark, path)
          return
        }
        var m = m0
        var sealedInto: String = null
        var attempts = 0
        while (attempts < 16) {
          attempts += 1
          if (sealedInto != m.dir) {
            if (!sealSegment(fs, new Path(main, m.dir), tag)(writeSeg)) {
              // empty micro-batch (all rows hot-filtered or an empty
              // trigger): nothing was sealed, so publishing would pin a
              // phantom tag whose ingest dir doesn't exist — every later
              // version's chain would carry it and pinned probes would
              // crash on the missing seg-stats path. No data, no commit.
              // If the tag is ALREADY in the published chain (an empty
              // replay of an originally non-empty batch), sealSegment
              // left that committed copy intact, so the chain stays
              // consistent without a publish either way.
              refresh(spark, path)
              return
            }
            sealedInto = m.dir
          }
          val segs = ((if (m eq m0) segs0
            else chainSegments(fs, main, m)) :+ tag).distinct
          if (casPublish(mc, m.v, m.dir, Seq.empty, segs)) {
            pruneMarkers(spark, path); refresh(spark, path); return
          }
          val nums = markerNums(mc)
          if (nums.nonEmpty && nums.max == m.v) {
            // CAS failed without the chain moving — a transient
            // filesystem error, not a lost race; same manifest, retry
          } else {
            require(nums.nonEmpty && nums.min <= m.v + 1,
              s"appendSegment($tag) at $path fell more than $MarkerKeep " +
                "publishes behind — the interval markers are pruned, so " +
                "absorption can no longer be decided; re-run the append")
            val between = ((m.v + 1) to nums.max).map(v => readMarker(mc, v))
            if (between.exists(_.isEmpty)) {
              // a marker in the listed range vanished before we read it
              // (a concurrent publisher pruned mid-reconstruction) —
              // NOT skippable: the missing manifest may be the rebuild
              // that absorbed this tag. Keep m, re-list, retry; if the
              // window has truly moved on, the guard above fails the
              // append loudly on the next iteration's FRESH listing.
            } else {
              val ms = between.map(_.get)
              if (ms.flatMap(_.absorbed).contains(tag)) {
                // success via absorption: OUR seal mutated the old dir
                // and the winning rebuild's refresh ran in ITS session —
                // this session's cached plans still need invalidating
                refresh(spark, path)
                return
              }
              m = ms.last
            }
          }
        }
        sys.error(s"appendSegment($tag): still losing the version race " +
          s"after 16 attempts at $path")
    }
  }

  /** Fenced segment-merge rebuild. Reads the current version's
    * segments through a PINNED listing (the `absorbed` list and the
    * data the build sees are the same set by construction — a segment
    * sealed after the listing is invisible to both), builds a fresh
    * data dir reserved via [[Compaction.claimNext]], and commits with
    * the CAS. Any append or forget that lands mid-build fences the
    * commit; the rebuild then re-reads and rebuilds (bounded retries —
    * rebuilds are the rare heavy mutation, appends the frequent cheap
    * one, so the appends win ties by design).
    *
    * `build(src, srcDir, dstDir)`: `src` is the pinned read of the
    * current contents (partition columns included), `srcDir` the
    * current data dir (for sidecar reads), `dstDir` the claimed output
    * dir the fresh build must land in (sidecars included).
    *
    * First call on a flat index converts it in place (one-time moves;
    * quiet window — see class doc).
    */
  def rebuild(spark: SparkSession, path: String,
              orphanGraceMs: Long = DefaultOrphanGraceMs,
              readerGraceMs: Long = 0L)
             (build: (DataFrame, String, String) => Unit): Unit = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    requireCapableFs(fs, main, "IndexLifecycle.rebuild")
    if (manifest(spark, path).isEmpty) convert(spark, path)
    val mc = commitOf(spark, main)
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      val m = manifest(spark, path).get
      val srcDir = new Path(main, m.dir)
      val segs = segmentsOf(fs, srcDir)
      require(segs.nonEmpty, s"rebuild: no ingest segments under $srcDir")
      val segPaths = segs.map(t => new Path(srcDir, SegPrefix + t).toString)
      val src = spark.read.option("basePath", srcDir.toString)
        .parquet(segPaths: _*)
      val n = Compaction.claimNext(fs, main,
        s"ixrebuild@${spark.sparkContext.applicationId}")
      val dirName = Compaction.genName(n)
      build(src, srcDir.toString, new Path(main, dirName).toString)
      val newSegs = segmentsOf(fs, new Path(main, dirName))
      if (casPublish(mc, m.v, dirName, segs, newSegs)) {
        prune(spark, path, orphanGraceMs, readerGraceMs)
        refresh(spark, path)
        return
      }
      // fenced: drop the stale build, KEEP the claim (number-reuse
      // tombstone, same rationale as Compaction.pruneDataDirs), retry
      fs.delete(new Path(main, dirName), true)
    }
    throw new Compaction.FencedWriteException(
      s"index rebuild at $path lost the publish race 8 times — " +
        "mutation churn outpaces the rebuild; retry in a quieter window")
  }

  /** Optimistic in-place mutation of the current data dir (the forget/
    * RTBF path): run `op` against the resolved dir, then commit a
    * version bump. If a rebuild published mid-op, its output may have
    * re-absorbed pre-op state — `op` MUST be idempotent (a forget
    * re-run finds only leftovers), because it is re-run against the
    * new dir until a commit sticks. Returns the max of the attempts'
    * results (for a forget: the full removal count is the first,
    * converged re-runs remove the stragglers a racing rebuild revived).
    *
    * Reader contract, honestly: unlike appends (sealed rename) and
    * rebuilds (fresh dir + CAS), this mutation kind rewrites files
    * INSIDE the dir readers resolve — a probe racing the rewrite can
    * fail transiently or observe partial state for the TOUCHED
    * partitions (untouched partitions stay byte-stable, so the blast
    * radius is the victims' partitions, not the index). RTBF is a
    * rare maintenance operation: run it in a quiet window, or use the
    * fully reader-isolated API form, [[forgetViaRebuild]] (forget ≡
    * rebuild-without-ids), and pay the full rewrite.
    */
  def mutate(spark: SparkSession, path: String)(op: String => Long): Long = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    manifest(spark, path) match {
      case None =>
        val r = op(path)
        // the op's dynamic overwrite re-caches through Spark's write
        // path, but rewriteWithout also raw-deletes fully-emptied
        // partition dirs — a cached plan listing them needs the same
        // invalidation the generational branch gets
        refresh(spark, path)
        r
      case Some(m0) =>
        requireCapableFs(fs, main, "IndexLifecycle.mutate")
        val mc = commitOf(spark, main)
        var m = m0
        var ranOn: String = null
        var result = 0L
        var attempts = 0
        while (attempts < 16) {
          attempts += 1
          if (ranOn != m.dir) {
            result = math.max(result,
              op(new Path(main, m.dir).toString))
            ranOn = m.dir
          }
          // a forget can empty whole segments (rewriteWithout deletes
          // fully-emptied partition dirs), so the published set is the
          // predecessor's chain minus what no longer exists on disk
          val live = segmentsOf(fs, new Path(main, m.dir)).toSet
          val segs = chainSegments(fs, main, m).filter(live)
          if (casPublish(mc, m.v, m.dir, Seq.empty, segs)) {
            pruneMarkers(spark, path)
            refresh(spark, path)
            return result
          }
          m = manifest(spark, path).get
        }
        sys.error(s"mutate: still losing the version race after 16 " +
          s"attempts at $path")
    }
  }

  /** Reader-isolated RTBF: express the forget as a fenced [[rebuild]]
    * whose build input is the current contents MINUS the rows `victim`
    * matches — concurrent probers only ever resolve a fully-built dir
    * (old or new), never partial state, at the price of rewriting the
    * index once. The in-place [[mutate]] path stays the cheap
    * quiet-window option; this is the API form of its documented
    * workaround. Returns the number of rows removed.
    *
    * `build(filtered, srcDir, dstDir)` is the family's normal rebuild
    * closure — it receives the ALREADY-FILTERED pinned read and must
    * regenerate derived sidecars/stats from it (which is exactly what
    * a rebuild does anyway, and why stats drift cannot survive this
    * path, unlike in-place forgets).
    *
    * PHYSICAL erasure: the rebuild's normal retention keeps the
    * previous data dir on disk (two-dir window) — for a forget that
    * dir still holds the victims' bytes, so this path finishes with
    * [[scrubRetired]]: every non-current generation dir is deleted in
    * the same call when `readerGraceMs` permits (the default 0 scrubs
    * immediately). With a nonzero grace the scrub defers — the logical
    * erasure is complete (no read through the manifest can reach the
    * victims' rows) and the caller completes physical erasure by
    * calling [[scrubRetired]] after the grace, or simply via the next
    * forget. Pinned reads of pre-forget versions fail loudly after the
    * scrub — that is the point of a right-to-be-forgotten erasure.
    *
    * CONCURRENT READERS: the reader-isolation claim above covers the
    * RESOLVE (a prober never sees a partially-built dir) — it does not
    * survive the immediate scrub: with the default `readerGraceMs = 0`
    * the pre-forget dir is deleted right after publish, so a reader
    * that resolved it loses its files mid-scan. Deployments with
    * concurrent probers must pass a `readerGraceMs` covering their
    * longest scan (the same rule the in-loop compaction docs state);
    * the default 0 is for quiet-window / single-process use.
    */
  def forgetViaRebuild(spark: SparkSession, path: String,
                       victim: org.apache.spark.sql.Column,
                       orphanGraceMs: Long = DefaultOrphanGraceMs,
                       readerGraceMs: Long = 0L)
                      (build: (DataFrame, String, String) => Unit): Long = {
    var removed = 0L
    val hit = org.apache.spark.sql.functions.coalesce(
      victim, org.apache.spark.sql.functions.lit(false))
    rebuild(spark, path, orphanGraceMs, readerGraceMs) { (src, srcDir, dstDir) =>
      // counted per attempt (one predicate-pushed scan); a fenced retry
      // recounts against the new src, so the surviving attempt's count
      // is the one returned
      removed = src.filter(hit).count()
      build(src.filter(!hit), srcDir, dstDir)
    }
    scrubRetired(spark, path, orphanGraceMs, readerGraceMs)
    removed
  }

  /** Delete every RETIRED generation dir (anything but the current
    * manifest's), completing the physical half of an RTBF erasure —
    * [[prune]] deliberately keeps a two-dir window for replays and
    * in-flight readers, which is exactly wrong for forgotten data.
    * Honors the same two guards as [[prune]]: a live claim (another
    * writer's in-flight build dir, which the fence machinery will
    * re-run against post-forget content anyway) and `readerGraceMs`
    * measured from the CURRENT version's marker — if the grace has not
    * elapsed the scrub is skipped (returns false) so a reader that
    * resolved the pre-forget dir can finish its scan; call again after
    * the grace to finish erasure. Returns true when no retired dir
    * remains. Deliberately lease-BLIND ([[acquireLease]]'s precedence
    * contract): RTBF erasure overrides retention leases — a leased
    * version's dir is scrubbed and its pinned reads fail loudly from
    * then on.
    */
  def scrubRetired(spark: SparkSession, path: String,
                   orphanGraceMs: Long = DefaultOrphanGraceMs,
                   readerGraceMs: Long = 0L): Boolean = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val mc = commitOf(spark, main)
    if (manifest(spark, path).isEmpty) return true // flat: nothing retired
    // ONE consistent marker scan decides both "which dirs were ever
    // published" and "which dir is current": deriving the current dir
    // from an EARLIER manifest read while the published set comes from
    // a fresh listing would let a rebuild that publishes in between
    // put its brand-new CURRENT dir into `published` (stripping the
    // claim guard) while the stale current pointer marks it retired —
    // and the scrub would delete the index's live data. A marker that
    // vanishes mid-scan (concurrent prune) forces a re-list, same as
    // absorbedWithin.
    var reads = Seq.empty[Manifest]
    var attempts = 0
    while ({
      attempts += 1
      val r = markerNums(mc).sorted.map(v => readMarker(mc, v))
      if (r.exists(_.isEmpty)) {
        if (attempts >= 8) sys.error(
          s"scrubRetired: markers at ${mc.describe} kept vanishing " +
            "mid-read across 8 re-listings; re-run the scrub")
        true
      } else { reads = r.map(_.get); false }
    }) ()
    if (reads.isEmpty) return true
    val m = reads.last // newest within the SAME scan as `published`
    if (readerGraceMs > 0L &&
        mc.createdAt(markerName(m.v))
          .exists(t => System.currentTimeMillis() - t < readerGraceMs))
      return false
    // a dir any RETAINED marker references was PUBLISHED — its claim
    // file is a tombstone, not an in-flight guard, so it never blocks
    // the scrub; the claim-liveness check only protects dirs no marker
    // knows about (a concurrent writer's build in progress, whose
    // claim is by construction younger than orphanGraceMs). A publish
    // landing AFTER this scan creates a FRESH dir (current dirs are
    // never resurrected from retired ones), so it is either absent
    // from the listing below or protected by its young claim.
    val published = reads.map(_.dir).toSet
    var clean = true
    fs.listStatus(main).toSeq.filter(_.isDirectory).foreach { s =>
      val nm = s.getPath.getName
      if (Compaction.genNumber(nm).isDefined && nm != m.dir) {
        val claim = new Path(main, Compaction.ClaimPrefix + nm)
        val live = !published.contains(nm) &&
          Compaction.liveClaim(fs, claim, orphanGraceMs)
        if (live) clean = false
        else fs.delete(s.getPath, true)
      }
    }
    refresh(spark, path)
    clean
  }

  /** One-time flat → generational conversion: move the flat index's
    * content (segment dirs AND underscore sidecars) into a claimed
    * data dir and publish version 1. The moves have the same in-flight
    * reader hazard as [[Compaction.toGenerational]] — run before
    * concurrent readers start.
    */
  def convert(spark: SparkSession, path: String): Unit = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    if (manifest(spark, path).isDefined) return
    require(fs.exists(main), s"convert: no index at $path")
    requireCapableFs(fs, main, "IndexLifecycle.convert")
    val mc = commitOf(spark, main)
    val n = Compaction.claimNext(fs, main, "ixconvert")
    val dirName = Compaction.genName(n)
    val dst = new Path(main, dirName)
    fs.mkdirs(dst)
    fs.listStatus(main).foreach { s =>
      val nm = s.getPath.getName
      val keep = nm == dirName || nm.startsWith(Compaction.ClaimPrefix) ||
        nm.startsWith(Marker) || nm.startsWith(".")
      if (!keep) {
        if (s.isDirectory && Compaction.genNumber(nm).isDefined) {
          // a PRIOR convert attempt crashed mid-move (claimed dir, some
          // segments already inside, no marker — or convert() would
          // have returned early). Renaming the dir itself would NEST
          // those segments one level down where segmentsOf and the
          // published manifest never see them — flatten its children
          // into the new dir instead.
          fs.listStatus(s.getPath).foreach { c =>
            if (!fs.rename(c.getPath, new Path(dst, c.getPath.getName)))
              sys.error(s"convert: recover of crashed-attempt segment " +
                s"${c.getPath} into $dst failed")
          }
          fs.delete(s.getPath, true)
        } else if (!fs.rename(s.getPath, new Path(dst, nm)))
          sys.error(s"convert: rename ${s.getPath} into $dst failed")
      }
    }
    if (!casPublish(mc, 0L, dirName, Seq.empty, segmentsOf(fs, dst)))
      sys.error(s"convert: concurrent conversion detected at $path — " +
        "conversion is a one-time quiet-window operation")
    refresh(spark, path)
  }

  /** Number of ingest segments in the CURRENT version's data dir —
    * the input to append-accumulation policies ([[maybeRebuild]]).
    */
  def segmentCount(spark: SparkSession, path: String): Int = {
    val main = new Path(path)
    segmentsOf(fsOf(spark, main),
      new Path(resolveDir(spark, path))).size
  }

  /** Append-accumulation policy: rebuild iff the current version holds
    * MORE than `maxSegments` ingest segments, else no-op. Steady-state
    * streaming appends accumulate one segment per batch without bound;
    * probes pay a per-segment listing, stats-sidecar read and parquet
    * footer set, so probe latency climbs linearly in segment count
    * (measured curve in PLANS.md round-10) while a rebuild's cost is
    * one bounded merge job. Calling this after every append (or every
    * K batches) caps probe cost at the `maxSegments` plateau —
    * amortized O(rebuild/maxSegments) per batch. Returns true when a
    * rebuild ran. Safe under concurrency: the threshold check races
    * benignly (two callers both rebuilding just means one is fenced
    * and retries against an already-collapsed index whose segment
    * count is 1 — sub-threshold work, not corruption) — but passing
    * the SAME readerGraceMs discipline as your rebuilds is still on
    * the caller.
    */
  def maybeRebuild(spark: SparkSession, path: String, maxSegments: Int,
                   orphanGraceMs: Long = DefaultOrphanGraceMs,
                   readerGraceMs: Long = 0L)
                  (build: (DataFrame, String, String) => Unit): Boolean = {
    require(maxSegments >= 1, s"maxSegments must be >= 1: $maxSegments")
    if (segmentCount(spark, path) <= maxSegments) false
    else {
      rebuild(spark, path, orphanGraceMs, readerGraceMs)(build)
      true
    }
  }

  /** Marker-and-leftover housekeeping WITHOUT data-dir deletion — what
    * the frequent cheap mutations (append, forget) run after their
    * version bump. Data-dir retention policy belongs to [[prune]],
    * which only rebuilds invoke: appends never change the data dir,
    * so letting them delete retired dirs would apply a DEFAULT
    * readerGraceMs to a deployment that configured a real one on its
    * rebuilds — the third-newest dir would vanish under an in-flight
    * reader the rebuild-side grace had deliberately kept alive.
    */
  private def pruneMarkers(spark: SparkSession, path: String,
                           orphanGraceMs: Long = DefaultOrphanGraceMs): Unit = {
    Compaction.requirePruneGrace(
      spark.sparkContext.hadoopConfiguration, orphanGraceMs)
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val mc = commitOf(spark, main)
    val nums = markerNums(mc).sorted.reverse
    if (nums.isEmpty) return
    val maxAge = Compaction.leaseMaxAgeMs(
      spark.sparkContext.hadoopConfiguration)
    cleanExpiredLeases(mc, maxAge)
    Compaction.cleanStaleIntents(mc, orphanGraceMs)
    val leased = leasedVersions(mc, maxAge)
    nums.drop(MarkerKeep).filterNot(leased).foreach { v =>
      deleteUnlessPinned(mc, s"marker.${Compaction.genName(v)}",
        () => leasedVersions(mc, maxAge)(v), () => mc.delete(markerName(v)))
    }
    val manifests = nums.take(MarkerKeep).flatMap(v => readMarker(mc, v))
    manifests.map(_.dir).distinct.take(2).foreach { d =>
      val dp = new Path(main, d)
      if (fs.exists(dp)) fs.listStatus(dp).toSeq
        .filter { s =>
          s.getPath.getName.startsWith(TmpPrefix) &&
            System.currentTimeMillis() - s.getModificationTime >= orphanGraceMs
        }
        .foreach(s => fs.delete(s.getPath, true))
    }
  }

  /** Retention: keep the newest [[MarkerKeep]] markers (late mutators
    * reconstruct missed history from them — and [[manifestAt]] pins
    * exports inside the same window), the data dirs of the last TWO
    * DISTINCT published dirs (append bumps re-reference the same
    * dir, so dir retention is counted in dirs, not versions — a
    * rebuild immediately followed by appends must not strand the
    * just-retired dir's in-flight readers), live-claimed in-flight
    * build dirs, and claim tombstones. `readerGraceMs` adds the same
    * wall-time floor as [[Compaction.pruneDataDirs]] for deployments
    * where publishes land closer together than the longest scan.
    * Only rebuilds call this (see [[pruneMarkers]] for why).
    */
  def prune(spark: SparkSession, path: String,
            orphanGraceMs: Long = DefaultOrphanGraceMs,
            readerGraceMs: Long = 0L): Unit = {
    Compaction.requirePruneGrace(
      spark.sparkContext.hadoopConfiguration, orphanGraceMs)
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val mc = commitOf(spark, main)
    val nums = markerNums(mc).sorted.reverse
    if (nums.isEmpty) return
    val maxAge = Compaction.leaseMaxAgeMs(
      spark.sparkContext.hadoopConfiguration)
    cleanExpiredLeases(mc, maxAge)
    Compaction.cleanStaleIntents(mc, orphanGraceMs)
    val leased = leasedVersions(mc, maxAge)
    nums.drop(MarkerKeep).filterNot(leased).foreach { v =>
      deleteUnlessPinned(mc, s"marker.${Compaction.genName(v)}",
        () => leasedVersions(mc, maxAge)(v), () => mc.delete(markerName(v)))
    }
    val kept = nums.take(MarkerKeep)
    val manifests = kept.flatMap(v => readMarker(mc, v))
    val keepDirs = manifests.map(_.dir).distinct.take(2)
    // a leased version's data dir survives with its marker — wherever
    // it sits in the chain (leases hold retention; scrubRetired, the
    // RTBF path, stays lease-blind)
    val leasedDirs = nums.filter(leased)
      .flatMap(v => readMarker(mc, v)).map(_.dir).toSet
    val retiredLongAgo = readerGraceMs <= 0L || keepDirs.drop(1).headOption
      .flatMap { second =>
        manifests.filter(_.dir == second).map(_.v).minOption
      }
      .forall { v =>
        mc.createdAt(markerName(v))
          .forall(t => System.currentTimeMillis() - t >= readerGraceMs)
      }
    val keepSet = keepDirs.toSet ++ leasedDirs
    // a dir up for deletion runs the announce → re-list → delete
    // protocol ([[deleteUnlessPinned]]): the lease set is re-derived
    // per delete AFTER the intent is visible, so a lease CAS landing
    // at any point either pins (seen by the re-list) or fails its own
    // re-verify on the intent — this replaces the r14 lazy "second
    // look", whose once-per-pass snapshot the r14 ADVICE flagged
    def leasedDirsNow(): Set[String] = {
      val live = leasedVersions(mc, maxAge)
      markerNums(mc).filter(live).flatMap(v => readMarker(mc, v))
        .map(_.dir).toSet
    }
    fs.listStatus(main).toSeq.filter(_.isDirectory).foreach { s =>
      val nm = s.getPath.getName
      if (Compaction.genNumber(nm).isDefined && !keepSet.contains(nm)) {
        val claim = new Path(main, Compaction.ClaimPrefix + nm)
        val live = Compaction.liveClaim(fs, claim, orphanGraceMs)
        if (!live && retiredLongAgo)
          deleteUnlessPinned(mc, s"dir.$nm",
            () => leasedDirsNow().contains(nm),
            () => fs.delete(s.getPath, true))
      }
    }
    // crashed appenders' temp dirs inside retained data dirs
    keepSet.foreach { d =>
      val dp = new Path(main, d)
      if (fs.exists(dp)) fs.listStatus(dp).toSeq
        .filter { s =>
          s.getPath.getName.startsWith(TmpPrefix) &&
            System.currentTimeMillis() - s.getModificationTime >= orphanGraceMs
        }
        .foreach(s => fs.delete(s.getPath, true))
    }
  }
}
