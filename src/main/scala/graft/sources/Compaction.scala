package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet tables — the housekeeping operator
  * every long-running ingest needs: a streaming sink (or a parallel
  * batch write) emits one file per task per trigger, and after days of
  * micro-batches a table is thousands of KB-sized files whose per-file
  * open/footer cost dominates every scan. Compaction bin-packs them
  * back to ~`targetBytes` outputs.
  *
  * Scale design: the rewrite is one job — scan (file-parallel) →
  * round-robin repartition to `ceil(totalBytes / targetBytes)` tasks →
  * write. No shuffle key means no skew; the exchange carries each row
  * once. At 100 TB compaction runs per partition/bucket (compose with
  * the `__bucket=`/`list=` layouts used by the CDC sink and IVF index —
  * each directory is a self-contained compaction unit), never as one
  * global job, and only directories whose small-file count crosses a
  * threshold are touched.
  *
  * Crash safety (same swap discipline as the CDC sink's recovery —
  * streaming/CdcPipeline.recoverBucketLayout): the compacted copy is
  * staged next to the table, then main→retired, staged→main, retired
  * deleted. Every crash window is recoverable: staged is incomplete
  * (no _SUCCESS) → drop it and rerun; main missing with a complete
  * staged → finish the swap; main missing with only retired → restore
  * retired. Readers see the old or the new table, never a mix.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int,
                         bytes: Long, rewritten: Boolean)

  private[graft] def stagedPath(p: Path) = new Path(p.getParent, p.getName + ".__graft_compact_staged")
  private[graft] def retiredPath(p: Path) = new Path(p.getParent, p.getName + ".__graft_compact_retired")

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path) =
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))

  /** Complete or roll back an interrupted previous compaction so the
    * table is readable before we (re)compact. Idempotent.
    */
  private[graft] def recover(fs: org.apache.hadoop.fs.FileSystem, main: Path): Unit = {
    val staged = stagedPath(main); val retired = retiredPath(main)
    val stagedComplete =
      fs.exists(staged) && fs.exists(new Path(staged, "_SUCCESS"))
    if (!fs.exists(main)) {
      if (stagedComplete) {
        // crashed between the two renames — finish the swap
        if (!fs.rename(staged, main))
          sys.error(s"compaction recovery: rename $staged -> $main failed")
      } else if (fs.exists(retired)) {
        // staged incomplete but main already retired (rename order
        // violated only by manual tampering) — restore the original
        if (!fs.rename(retired, main))
          sys.error(s"compaction recovery: rename $retired -> $main failed")
      } else {
        sys.error(s"compaction: $main missing and no recoverable sibling")
      }
    }
    // main exists: any staged/retired leftovers are stale — drop them
    if (fs.exists(staged)) fs.delete(staged, true)
    if (fs.exists(retired)) fs.delete(retired, true)
  }

  /** Compact the parquet table at `path` into ~`targetBytes` files.
    * No-op (rewritten=false) when the table is already at or below the
    * target file count — compaction must be cheap to call repeatedly.
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val main = new Path(path)
    val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, main)
    val files = dataFiles(fs, main)
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (files.size <= nOut)
      return Stats(files.size, files.size, bytes, rewritten = false)
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(stagedPath(main).toString)
    swapIn(fs, main)
    Stats(files.size, dataFiles(fs, main).size, bytes, rewritten = true)
  }

  /** Swap a fully-written staged dir in for `main` (main→retired,
    * staged→main, retired deleted). Callers must have finished writing
    * the staged dir (with _SUCCESS) first; [[recover]] completes the
    * swap if a crash lands between the renames.
    */
  private[graft] def swapIn(fs: org.apache.hadoop.fs.FileSystem, main: Path): Unit = {
    val staged = stagedPath(main); val retired = retiredPath(main)
    if (fs.exists(main) && !fs.rename(main, retired))
      sys.error(s"compaction: rename $main -> $retired failed")
    if (!fs.rename(staged, main))
      sys.error(s"compaction: rename $staged -> $main failed")
    fs.delete(retired, true)
  }
}
