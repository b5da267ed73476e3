package graft.tools

import org.apache.hadoop.fs.Path

/** Cross-process CAS contention driver — forked as a SECOND JVM by
  * IndexLifecycleSpec to prove the `file:` marker commit is atomic
  * ACROSS processes (the kernel-atomic hard-link branch of
  * [[graft.sources.FsManifestCommit]]), not just within one JVM's
  * publishLock. No Spark: just the commit primitive, raced bare.
  *
  * args: <dir> <n> <id> <readyFile>. Waits for the ready file (both
  * contenders start together), then attempts to exclusively create
  * marker versions 1..n as fast as possible, printing the versions it
  * WON as one `WON:v1,v2,...` line. The parent runs the same loop and
  * asserts the win sets are disjoint and complete.
  */
object CasContend {
  def main(args: Array[String]): Unit = {
    val Array(dir, nStr, id, ready) = args
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    val mc = new graft.sources.FsManifestCommit(fs, new Path(dir))
    val readyPath = java.nio.file.Paths.get(ready)
    val deadline = System.currentTimeMillis() + 30000
    while (!java.nio.file.Files.exists(readyPath)) {
      if (System.currentTimeMillis() > deadline) sys.error("ready-file timeout")
      Thread.sleep(2)
    }
    val won = (1 to nStr.toInt).filter { v =>
      mc.createExclusive(f"_graft_ixgen.g$v%09d", id.getBytes("UTF-8"))
    }
    println("WON:" + won.mkString(","))
  }
}
