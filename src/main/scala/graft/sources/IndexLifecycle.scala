package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic-concurrency lifecycle for the persisted index families
  * (shingle postings, semantic cell, IVF inverted lists, phash bands,
  * ER deletion variants) — the fenced counterpart of the table-side
  * generational layout ([[Compaction]]), built for the deployment shape
  * the staged/retired swap could only document away: several jobs
  * appending to and rebuilding the SAME index concurrently.
  *
  * == Layout ==
  * {{{
  * index/
  *   _graft_ixgen.g000000007   <- version marker V=7 (payload below)
  *   _graft_claim.g000000002   <- data-dir claims (Compaction.claimNext)
  *   g000000002/               <- data dir: ingest=<tag>/<part>=<v>/ parquet
  *                                + underscore sidecars (_graft_hot, ...)
  * }}}
  * A marker's payload names the data dir it publishes and, for a
  * rebuild, the exact segment set the rebuild absorbed. Markers are
  * CONSECUTIVE: version V+1 can only be committed by atomically
  * exclusive-creating `_graft_ixgen.g{V+1}` — that create IS the
  * compare-and-swap every mutation commits through, so two concurrent
  * publishes against the same observed version have exactly one winner
  * (the Iceberg commit protocol, reduced to one pointer file).
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
  * == Filesystem capability contract ==
  * The protocol needs (a) atomic exclusive-create (HDFS namenode
  * guarantees it; the local fs is check-then-create, atomic within one
  * JVM via [[publishLock]], best-effort across processes) and
  * (b) atomic directory rename (HDFS/posix). Object stores without
  * atomic create/rename (S3 and friends) need a conditional-PUT
  * manifest adapter instead — [[requireCapableFs]] fails loudly on
  * their schemes rather than corrupting quietly.
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
  private val MarkerKeep = 8

  val DefaultOrphanGraceMs: Long = Compaction.DefaultOrphanGraceMs

  /** Serializes marker creates within this JVM: the local filesystem's
    * exclusive create is check-then-act, so in-process concurrency
    * (local[*], the soak specs) needs a real lock; on HDFS the
    * namenode create is atomic across processes anyway.
    */
  private val publishLock = new Object

  final case class Manifest(v: Long, dir: String, absorbed: Seq[String])

  private val CapableSchemes =
    Set("file", "local", "hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs", "o3fs")

  private def requireCapableFs(fs: FileSystem, ctx: String): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file").toLowerCase
    require(CapableSchemes(scheme),
      s"$ctx needs atomic exclusive-create and atomic directory rename; " +
        s"filesystem scheme '$scheme' guarantees neither — use an " +
        "HDFS-semantics store, or adapt the manifest commit to the " +
        "store's conditional-PUT primitive")
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

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
    * intent here is INVALIDATION, not refresh — so a failed recache
    * falls back to dropping the whole session cache: a recompute cost
    * for unrelated entries, never a correctness cost, and only on the
    * rare layout-changing mutation.
    */
  private def refresh(spark: SparkSession, path: String): Unit =
    try spark.catalog.refreshByPath(path)
    catch {
      case scala.util.control.NonFatal(e) =>
        // the fallback is session-wide — leave a trace so a recompute
        // storm after a layout-changing mutation is diagnosable
        System.err.println(s"[IndexLifecycle] refreshByPath($path) " +
          s"failed (${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(1).mkString +
          ") — clearing the session cache to guarantee invalidation")
        spark.catalog.clearCache()
    }

  private def markerNums(fs: FileSystem, main: Path): Seq[Long] =
    Compaction.listNums(fs, main, Marker)

  /** Read marker V's payload. The create→write→close of a publish is
    * not one atomic step, so a listing can surface a marker whose
    * payload is still empty for a moment — retry briefly, then fail
    * loudly (never fall back to an older version: that would be a
    * silent stale read).
    */
  private def readMarker(fs: FileSystem, main: Path, v: Long): Option[Manifest] = {
    val p = new Path(main, Marker + Compaction.genName(v))
    var tries = 0
    while (tries < 100) {
      val text =
        try {
          val in = fs.open(p)
          try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
            buf.toString("UTF-8")
          } finally in.close()
        } catch { case _: java.io.FileNotFoundException => return None }
      val lines = text.linesIterator.toSeq
      val dir = lines.collectFirst {
        case l if l.startsWith("dir=") => l.stripPrefix("dir=") }
      dir match {
        case Some(d) if d.nonEmpty =>
          val abs = lines.collectFirst {
            case l if l.startsWith("absorbed=") =>
              l.stripPrefix("absorbed=").split(",").toSeq.filter(_.nonEmpty)
          }.getOrElse(Seq.empty)
          return Some(Manifest(v, d, abs))
        case _ => tries += 1; Thread.sleep(2) // publisher mid-write
      }
    }
    sys.error(s"index manifest $p stayed unreadable — crashed publisher? " +
      "delete the empty marker to recover (its version was never visible)")
  }

  /** Current manifest of the index at `path`, None if flat. */
  def manifest(spark: SparkSession, path: String): Option[Manifest] = {
    val main = new Path(path)
    val fs = fsOf(spark, main)
    markerNums(fs, main).maxOption.flatMap(v => readMarker(fs, main, v))
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

  private def payloadOf(dir: String, absorbed: Seq[String]): String =
    s"dir=$dir\nabsorbed=${absorbed.mkString(",")}\n"

  /** The commit primitive: atomically create marker `expectV + 1`.
    * Returns false when another publisher committed that version first
    * — the caller re-reads the manifest and reconciles.
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
  private def casPublish(fs: FileSystem, main: Path, expectV: Long,
                         dir: String, absorbed: Seq[String]): Boolean =
    publishLock.synchronized {
      if (markerNums(fs, main).maxOption.getOrElse(0L) != expectV)
        return false
      val p = new Path(main, Marker + Compaction.genName(expectV + 1))
      var created = false
      try {
        val out = fs.create(p, false)
        created = true
        try out.write(payloadOf(dir, absorbed).getBytes("UTF-8"))
        finally out.close()
        true
      } catch {
        case _: java.io.IOException =>
          // created-but-unwritten is OUR half marker (the exclusive
          // create succeeded) — withdraw it so the chain's readers
          // don't stall on an empty payload; created=false means the
          // create itself lost the race and there is nothing to undo
          if (created) try fs.delete(p, false) catch {
            case _: java.io.IOException => ()
          }
          false
      }
    }

  /** Segment tags (`ingest=` values) present in a data dir. */
  private[graft] def segmentsOf(fs: FileSystem, dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(SegPrefix))
      .map(_.stripPrefix(SegPrefix)).sorted

  /** Write-then-rename a segment into `dir/ingest=<tag>`. `writeSeg`
    * gets (data dir, temp output dir): it reads any sidecars from the
    * former and writes the segment's parquet (partitioned by the
    * family's second-level column only — `ingest` comes from the
    * directory name) into the latter. Replays of the same tag replace
    * the whole segment subtree — strictly stronger idempotency than
    * the dynamic-partition overwrite this replaces. Returns false for
    * an empty segment (nothing written, any previous copy removed).
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
    if (fs.exists(old)) fs.delete(old, true)
    writeSeg(dir.toString, tmp.toString)
    val hasData = fs.exists(tmp) && fs.listStatus(tmp).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (!hasData) {
      fs.delete(tmp, true)
      if (fs.exists(segDir)) fs.delete(segDir, true)
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
    requireCapableFs(fs, "IndexLifecycle.appendSegment")
    manifest(spark, path) match {
      case None =>
        sealSegment(fs, main, tag)(writeSeg)
        refresh(spark, path)
      case Some(m0) =>
        var m = m0
        var sealedInto: String = null
        var attempts = 0
        while (attempts < 16) {
          attempts += 1
          if (sealedInto != m.dir) {
            sealSegment(fs, new Path(main, m.dir), tag)(writeSeg)
            sealedInto = m.dir
          }
          if (casPublish(fs, main, m.v, m.dir, Seq.empty)) {
            pruneMarkers(spark, path); refresh(spark, path); return
          }
          val nums = markerNums(fs, main)
          if (nums.max == m.v) {
            // CAS failed without the chain moving — a transient
            // filesystem error, not a lost race; same manifest, retry
          } else {
            require(nums.min <= m.v + 1,
              s"appendSegment($tag) at $path fell more than $MarkerKeep " +
                "publishes behind — the interval markers are pruned, so " +
                "absorption can no longer be decided; re-run the append")
            val between = ((m.v + 1) to nums.max)
              .flatMap(v => readMarker(fs, main, v))
            if (between.flatMap(_.absorbed).contains(tag)) {
              // success via absorption: OUR seal mutated the old dir
              // and the winning rebuild's refresh ran in ITS session —
              // this session's cached plans still need invalidating
              refresh(spark, path)
              return
            }
            m = between.last
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
    requireCapableFs(fs, "IndexLifecycle.rebuild")
    if (manifest(spark, path).isEmpty) convert(spark, path)
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
      if (casPublish(fs, main, m.v, dirName, segs)) {
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
    * rare maintenance operation: run it in a quiet window, or where
    * that is impossible, express it as a filtered [[rebuild]] (forget
    * ≡ rebuild-without-ids) and pay the full rewrite for full reader
    * isolation.
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
        requireCapableFs(fs, "IndexLifecycle.mutate")
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
          if (casPublish(fs, main, m.v, m.dir, Seq.empty)) {
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
    requireCapableFs(fs, "IndexLifecycle.convert")
    val n = Compaction.claimNext(fs, main, "ixconvert")
    val dirName = Compaction.genName(n)
    val dst = new Path(main, dirName)
    fs.mkdirs(dst)
    fs.listStatus(main).foreach { s =>
      val nm = s.getPath.getName
      val keep = nm == dirName || nm.startsWith(Compaction.ClaimPrefix) ||
        nm.startsWith(Marker) || nm.startsWith(".")
      if (!keep && !fs.rename(s.getPath, new Path(dst, nm)))
        sys.error(s"convert: rename ${s.getPath} into $dst failed")
    }
    if (!casPublish(fs, main, 0L, dirName, Seq.empty))
      sys.error(s"convert: concurrent conversion detected at $path — " +
        "conversion is a one-time quiet-window operation")
    refresh(spark, path)
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
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val nums = markerNums(fs, main).sorted.reverse
    if (nums.isEmpty) return
    nums.drop(MarkerKeep).foreach { v =>
      fs.delete(new Path(main, Marker + Compaction.genName(v)), false)
    }
    val manifests = nums.take(MarkerKeep).flatMap(v => readMarker(fs, main, v))
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
    * reconstruct missed history from them), the data dirs of the last
    * TWO DISTINCT published dirs (append bumps re-reference the same
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
    val main = new Path(path)
    val fs = fsOf(spark, main)
    val nums = markerNums(fs, main).sorted.reverse
    if (nums.isEmpty) return
    nums.drop(MarkerKeep).foreach { v =>
      fs.delete(new Path(main, Marker + Compaction.genName(v)), false)
    }
    val kept = nums.take(MarkerKeep)
    val manifests = kept.flatMap(v => readMarker(fs, main, v))
    val keepDirs = manifests.map(_.dir).distinct.take(2)
    val retiredLongAgo = readerGraceMs <= 0L || keepDirs.drop(1).headOption
      .flatMap { second =>
        manifests.filter(_.dir == second).map(_.v).minOption
      }
      .forall { v =>
        try System.currentTimeMillis() - fs.getFileStatus(
          new Path(main, Marker + Compaction.genName(v)))
          .getModificationTime >= readerGraceMs
        catch { case _: java.io.FileNotFoundException => true }
      }
    val keepSet = keepDirs.toSet
    fs.listStatus(main).toSeq.filter(_.isDirectory).foreach { s =>
      val nm = s.getPath.getName
      if (Compaction.genNumber(nm).isDefined && !keepSet.contains(nm)) {
        val claim = new Path(main, Compaction.ClaimPrefix + nm)
        val live =
          try fs.exists(claim) && (System.currentTimeMillis() -
            fs.getFileStatus(claim).getModificationTime) < orphanGraceMs
          catch { case _: java.io.FileNotFoundException => false }
        if (!live && retiredLongAgo) fs.delete(s.getPath, true)
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
