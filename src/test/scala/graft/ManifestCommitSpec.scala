package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, FilterFileSystem, Path}
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FsManifestCommit

/** Fault-injection coverage for [[FsManifestCommit]]'s two
  * created-but-unwritten withdraw paths — the half-marker class a
  * reader can otherwise stall on forever (its empty-payload retry
  * assumes SOMEONE completes or withdraws the marker):
  *
  *  1. the local no-hard-links fallback (O_EXCL create claims the
  *     name, payload write fails) — driven through the
  *     `exclusiveCreateNoLink` write seam, the only way to force this
  *     branch on a mount that DOES support links;
  *  2. the non-local streaming branch (exclusive create succeeds,
  *     payload write fails) — driven through a wrapper FileSystem
  *     whose first create returns a failing stream.
  *
  * Contract under test, both branches: the failed call returns false,
  * the half marker is withdrawn (name absent), an EXISTING marker is
  * never deleted by a loser, and a subsequent healthy createExclusive
  * of the same name wins with its full payload readable.
  */
class ManifestCommitSpec extends AnyFunSuite {

  private def conf = new Configuration()

  private def localFs: FileSystem = FileSystem.getLocal(conf)

  private def tempRoot(prefix: String): Path =
    new Path(java.nio.file.Files.createTempDirectory(prefix).toString)

  test("no-link fallback: write failure after the O_EXCL claim withdraws the half marker; retry then wins") {
    val root = tempRoot("graft_mcnolink")
    val mc = new FsManifestCommit(localFs, root)
    val target = java.nio.file.Paths.get(root.toString, "_graft_ixgen.g000000001")
    // injected write failure AFTER the exclusive create claimed the name
    val lost = mc.exclusiveCreateNoLink(target, "v1".getBytes("UTF-8"),
      (_, _) => throw new java.io.IOException("injected write failure"))
    assert(!lost, "a half-written marker must report a failed CAS")
    assert(!java.nio.file.Files.exists(target),
      "the created-but-unwritten marker must be withdrawn, not left empty")
    // readers are not stalled: the name is free and a healthy attempt wins
    assert(mc.exclusiveCreateNoLink(target, "v1".getBytes("UTF-8")))
    assert(new String(mc.read("_graft_ixgen.g000000001").get, "UTF-8") == "v1")
    // and a loser racing an EXISTING marker never deletes it
    assert(!mc.exclusiveCreateNoLink(target, "v1-loser".getBytes("UTF-8")))
    assert(new String(mc.read("_graft_ixgen.g000000001").get, "UTF-8") == "v1")
  }

  /** First create returns a stream that fails on write — the
    * HDFS-shape "create claimed the name, payload stream died" fault.
    * The non-`file:` URI routes [[FsManifestCommit]] to its streaming
    * branch; everything else delegates to the real local fs.
    */
  private class FailingWriteFs(raw: FileSystem) extends FilterFileSystem(raw) {
    @volatile var failNext = true
    override def getUri: URI = URI.create("mock://faulty")
    override def create(f: Path, permission: FsPermission, overwrite: Boolean,
        bufferSize: Int, replication: Short, blockSize: Long,
        progress: Progressable): FSDataOutputStream = {
      val real = super.create(f, permission, overwrite, bufferSize,
        replication, blockSize, progress)
      if (!failNext) real
      else {
        failNext = false
        new FSDataOutputStream(new java.io.FilterOutputStream(real) {
          override def write(b: Int): Unit =
            throw new java.io.IOException("injected write failure")
          override def write(b: Array[Byte], off: Int, len: Int): Unit =
            throw new java.io.IOException("injected write failure")
        }, null)
      }
    }
  }

  test("streaming branch: write failure after the exclusive create withdraws the half marker; retry then wins") {
    val root = tempRoot("graft_mcstream")
    val fs = new FailingWriteFs(localFs)
    fs.setConf(conf)
    val mc = new FsManifestCommit(fs, root)
    assert(mc.describe.startsWith("fs:mock"),
      s"the mock scheme must route to the streaming branch: ${mc.describe}")
    val lost = mc.createExclusive("_graft_ixgen.g000000001", "v1".getBytes("UTF-8"))
    assert(!lost, "a half-written marker must report a failed CAS")
    assert(!localFs.exists(new Path(root, "_graft_ixgen.g000000001")),
      "the created-but-unwritten marker must be withdrawn, not left empty")
    // the name is free again: the retry (healthy stream) wins with payload
    assert(mc.createExclusive("_graft_ixgen.g000000001", "v1".getBytes("UTF-8")))
    assert(new String(mc.read("_graft_ixgen.g000000001").get, "UTF-8") == "v1")
    // a loser whose CREATE fails (name taken) has nothing to undo and
    // must not delete the winner's marker
    assert(!mc.createExclusive("_graft_ixgen.g000000001", "loser".getBytes("UTF-8")))
    assert(new String(mc.read("_graft_ixgen.g000000001").get, "UTF-8") == "v1")
  }
}
