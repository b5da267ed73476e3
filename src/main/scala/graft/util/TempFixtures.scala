package graft.util

/** Shared build-once temp fixtures for the driver registry: a
  * persisted index is a long-lived table built by an offline job in
  * production, so the registered queries memoize the build per
  * (fixture, dataset dir) per JVM and time only the probe path — the
  * per-ingest production cost. Cached roots are deleted on JVM exit
  * (best-effort, mirroring LlmQueries' index cleanup walk).
  */
object TempFixtures {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      cache.values.forEach { p =>
        val root = java.nio.file.Paths.get(p).getParent
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator.asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } catch { case _: java.io.IOException => () } // best-effort
      }
    }))
  }

  /** The memoized path for `key` (use "name:<datasetDir>"), building
    * it via `build(path)` on first request. The path's parent is a
    * fresh temp dir; `build` must fully populate the path.
    */
  def dir(key: String)(build: String => Unit): String = {
    hook
    cache.computeIfAbsent(key, _ => {
      val prefix = "graft_fx_" + key.takeWhile(_ != ':')
      val root = java.nio.file.Files.createTempDirectory(prefix)
      val p = root.toString + "/index"
      try build(p)
      catch {
        case t: Throwable =>
          // a half-built fixture must neither be cached (the next call
          // retries the build) nor leak its temp dir
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(root).iterator.asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
          } catch { case _: java.io.IOException => () }
          throw t
      }
      p
    })
  }
}
