package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit primitive behind [[IndexLifecycle]]'s CAS manifest chain,
  * extracted as an SPI so the seven index families deploy on stores
  * whose atomicity primitive is not a filesystem create.
  *
  * The whole protocol needs exactly one thing from the store: an
  * ATOMIC EXCLUSIVE CREATE of a small named object with its payload —
  * "create `_graft_ixgen.g<V+1>` iff absent" IS the compare-and-swap
  * every mutation commits through. Everything else (read, list,
  * delete) is plain metadata access with no atomicity requirement.
  * Concretely that primitive is:
  *
  *  - HDFS: namenode-atomic `create(path, overwrite=false)`
  *    ([[FsManifestCommit]], non-local branch);
  *  - local/posix: `link(2)` of a fully-written temp — atomic create
  *    WITH payload, EEXIST on loss, across processes
  *    ([[FsManifestCommit]] local branch; Hadoop's LocalFileSystem
  *    `create(overwrite=false)` is check-then-create and therefore
  *    NOT usable as a cross-process CAS);
  *  - object stores: conditional PUT — S3 `If-None-Match: *`, GCS
  *    `ifGenerationMatch=0`, ABFS ETag preconditions. The store call
  *    itself is one HTTP request; [[MemoryManifestCommit]] implements
  *    that exact shape (single atomic compare-and-put of name+payload)
  *    in memory so the lifecycle's race and soak specs prove the
  *    protocol against conditional-PUT semantics without a cloud SDK
  *    on the classpath. A real S3 adapter is this trait + one
  *    `putObject` call with the precondition header.
  *
  * Data-plane caveat, honestly: the manifest commit is the only
  * CORRECTNESS-critical atomic step, but segment seals
  * ([[IndexLifecycle.appendSegment]]) still rename a directory into
  * the live tree, and readers discover segments by LISTING that tree.
  * On a store without atomic rename the seal loses its all-or-nothing
  * visibility even with an adapted manifest commit — which is why
  * [[IndexLifecycle]] keeps its data-plane scheme check separate from
  * the commit adapter, and why marker payloads carry the authoritative
  * `segments=` list (the Iceberg move: make the manifest, not the
  * listing, the source of truth — [[IndexLifecycle.manifestAt]]).
  */
trait ManifestCommit {

  /** Atomically create `name` with `payload` iff absent. Returns true
    * when THIS call created it (the CAS won); false when the name
    * already existed (lost the race) — never partially creates.
    */
  def createExclusive(name: String, payload: Array[Byte]): Boolean

  /** Payload of `name`, None if absent. A concurrent non-payload-atomic
    * creator (the HDFS branch's create→write→close) may surface an
    * EMPTY payload transiently — callers retry (see
    * [[IndexLifecycle.readMarker]]); payload-atomic impls (local link,
    * conditional PUT) never do.
    */
  def read(name: String): Option[Array[Byte]]

  /** Names present with the given prefix (markers are tiny and capped
    * at [[IndexLifecycle.MarkerKeep]] + transients, so a full listing
    * per call is bounded metadata, not a scan).
    */
  def list(prefix: String): Seq[String]

  /** Remove `name` (idempotent; absent is fine). */
  def delete(name: String): Unit

  /** Commit wall-clock time of `name` (epoch ms), None if absent —
    * feeds retention grace windows ([[IndexLifecycle.prune]]'s
    * readerGraceMs), never correctness decisions.
    */
  def createdAt(name: String): Option[Long]

  /** One-line description for error messages. */
  def describe: String
}

/** Marker commits on a Hadoop [[FileSystem]], rooted at the index
  * directory. On the `file:` scheme the exclusive create goes through
  * `java.nio` hard links (write payload to a dot-temp, `link` it to
  * the marker name, unlink the temp): `link(2)` fails with EEXIST
  * atomically AT THE KERNEL, so two separate JVMs — the ingest job and
  * a maintenance rebuild sharing a posix mount, exactly the deployment
  * the CAS targets — get one winner, where Hadoop's
  * `RawLocalFileSystem.create(overwrite=false)` would check-then-create
  * and let both "commit". The link also lands the marker with its FULL
  * payload in one step, so the empty-marker read window does not exist
  * on this branch. Filesystems without hard links fall back to
  * `Files.createFile` (O_EXCL — still an atomic create, payload
  * written after, covered by the reader's retry).
  */
final class FsManifestCommit(fs: FileSystem, root: Path) extends ManifestCommit {

  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private val isLocal =
    Option(fs.getUri.getScheme).forall(s => s == "file" || s == "local")

  private def localDir: java.nio.file.Path =
    java.nio.file.Paths.get(fs.makeQualified(root).toUri.getPath)

  override def createExclusive(name: String, payload: Array[Byte]): Boolean =
    if (isLocal) {
      val dir = localDir
      java.nio.file.Files.createDirectories(dir)
      val target = dir.resolve(name)
      // tmp must be unique ACROSS PROCESSES, not just threads: two JVMs
      // sharing the mount (the deployment this CAS exists for) routinely
      // reuse the same thread ids, and a shared tmp path lets the CAS
      // winner link the LOSER's payload — a silently corrupted chain.
      val tmp = dir.resolve(
        s".$name.link_tmp_${ProcessHandle.current().pid()}_" +
          s"${Thread.currentThread().getId}_${tmpSeq.incrementAndGet()}")
      java.nio.file.Files.write(tmp, payload)
      try {
        try { java.nio.file.Files.createLink(target, tmp); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.nio.file.NoSuchFileException =>
            // tmp vanished under us (e.g. an operator-driven cleanup of
            // dot-temps): the marker was NOT created — report a lost
            // CAS rather than crashing the publish loop
            false
          case _: UnsupportedOperationException =>
            exclusiveCreateNoLink(target, payload)
        }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      exclusiveCreateStream(name, payload)
    }

  /** The local branch's no-hard-links fallback (exotic mounts): O_EXCL
    * create is still an atomic claim; the payload write after it is
    * covered by the reader's empty-marker retry. `write` is a test seam
    * — the withdraw contract below is fault-injected through it.
    */
  private[graft] def exclusiveCreateNoLink(
      target: java.nio.file.Path, payload: Array[Byte],
      write: (java.nio.file.Path, Array[Byte]) => Unit =
        (t, p) => { java.nio.file.Files.write(t, p); () }): Boolean =
    try {
      java.nio.file.Files.createFile(target)
      try { write(target, payload); true }
      catch {
        case _: java.io.IOException =>
          // created-but-unwritten is OUR half marker — withdraw
          // it (mirroring the non-local branch) so readers don't
          // stall forever on an empty payload
          try java.nio.file.Files.deleteIfExists(target)
          catch { case _: java.io.IOException => () }
          false
      }
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** The non-local (HDFS-shape) branch: exclusive create claims the
    * name, the payload streams after — a write/close failure withdraws
    * OUR half marker; a failed create is a lost race with nothing to
    * undo.
    */
  private def exclusiveCreateStream(name: String, payload: Array[Byte]): Boolean = {
    var created = false
    try {
      val out = fs.create(new Path(root, name), false)
      created = true
      try out.write(payload) finally out.close()
      true
    } catch {
      case _: java.io.IOException =>
        // created-but-unwritten is OUR half marker (the exclusive
        // create succeeded) — withdraw it so the chain's readers
        // don't stall on an empty payload; created=false means the
        // create itself lost the race and there is nothing to undo
        if (created) try fs.delete(new Path(root, name), false) catch {
          case _: java.io.IOException => ()
        }
        false
    }
  }

  override def read(name: String): Option[Array[Byte]] =
    try {
      val in = fs.open(new Path(root, name))
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(buf.toByteArray)
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  override def list(prefix: String): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))

  override def delete(name: String): Unit =
    fs.delete(new Path(root, name), false)

  override def createdAt(name: String): Option[Long] =
    try Some(fs.getFileStatus(new Path(root, name)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  override def describe: String = s"fs:${fs.getUri.getScheme}:$root"
}

/** Conditional-PUT manifest commits — the S3 `If-None-Match: *` shape
  * (one atomic compare-and-put of name+payload), held in memory. The
  * lifecycle's deterministic race and threaded soak specs run against
  * this impl to prove the protocol needs nothing beyond that primitive;
  * a production object-store adapter replaces the map with the store's
  * conditional put and inherits the same proven protocol.
  */
final class MemoryManifestCommit extends ManifestCommit {

  private val objects = new ConcurrentHashMap[String, (Array[Byte], Long)]()

  override def createExclusive(name: String, payload: Array[Byte]): Boolean =
    objects.putIfAbsent(name, (payload, System.currentTimeMillis())) == null

  override def read(name: String): Option[Array[Byte]] =
    Option(objects.get(name)).map(_._1)

  override def list(prefix: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    objects.forEach((k, _) => if (k.startsWith(prefix)) out += k)
    out.result()
  }

  override def delete(name: String): Unit = objects.remove(name)

  override def createdAt(name: String): Option[Long] =
    Option(objects.get(name)).map(_._2)

  override def describe: String = "memory-conditional-put"
}

object ManifestCommit {

  /** Path-prefix → commit overrides. A deployment (or spec) registers
    * an adapter for the index roots living on a store whose manifest
    * primitive is not a filesystem create; unmatched paths fall back
    * to [[FsManifestCommit]] on the path's own filesystem. Longest
    * matching prefix wins so a test registration cannot shadow an
    * unrelated sibling tree.
    */
  private val overrides = new ConcurrentHashMap[String, ManifestCommit]()

  def register(pathPrefix: String, commit: ManifestCommit): Unit =
    overrides.put(pathPrefix, commit)

  def unregister(pathPrefix: String): Unit = overrides.remove(pathPrefix)

  /** True when `main` resolves to a registered (non-filesystem)
    * adapter — [[IndexLifecycle]]'s capability check consults this.
    */
  def hasOverride(main: Path): Boolean = lookup(main.toString).isDefined

  private def lookup(path: String): Option[ManifestCommit] = {
    // capture the commit VALUE during the scan: re-reading the map by
    // key after picking the winner races unregister() into Some(null)
    var bestPrefix: String = null
    var bestCommit: ManifestCommit = null
    overrides.forEach { (prefix, commit) =>
      if (path.startsWith(prefix) &&
        (bestPrefix == null || prefix.length > bestPrefix.length)) {
        bestPrefix = prefix
        bestCommit = commit
      }
    }
    Option(bestCommit)
  }

  /** The commit for the index rooted at `main`. */
  def forIndex(fs: FileSystem, main: Path): ManifestCommit =
    lookup(main.toString).getOrElse(new FsManifestCommit(fs, main))
}
