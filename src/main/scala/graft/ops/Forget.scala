package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion propagation into persisted derived artifacts — the
  * right-to-be-forgotten path a production training-data pipeline must
  * have: when source documents are deleted (a CDC `d` op, a takedown,
  * a GDPR request), their traces in long-lived index structures
  * ([[Dedup.writeShingleIndex]] postings, [[Similarity.ivfWriteIndex]]
  * inverted lists) must go too, WITHOUT rebuilding the index.
  *
  * Shape: locate the partitions that contain the ids (one scan with
  * the id predicate pushed to parquet — row-group stats prune most
  * files; the result is a BOUNDED (partition-values, count) list, not
  * a data collect), then rewrite ONLY those partitions with the ids
  * filtered out via dynamic partition overwrite — the same
  * touched-partition rewrite discipline as the CDC sink
  * ([[graft.streaming.CdcPipeline.idempotentParquetUpsert]]). A
  * partition whose every row is forgotten produces no output under
  * dynamic overwrite, so those directories are deleted explicitly —
  * otherwise the stale postings would silently survive.
  *
  * Crash contract: the overwrite commits per partition; a crash
  * between the rewrite and the empty-directory deletes leaves the ids
  * present in (at most) the emptied partitions — re-running the same
  * forget is idempotent and completes the job (the locate pass finds
  * exactly the leftovers). Derived OUTPUTS (pair tables, dedup
  * reports) are downstream of the index and are the caller's to
  * re-derive or filter; this op owns the index itself.
  */
object Forget {

  /** Remove every row with `idCol` ∈ `ids` from the partitioned
    * parquet table at `path`, rewriting only the touched partitions.
    * Returns the number of rows removed. `partCols` must be the
    * table's partition columns in order (e.g. `Seq("ingest",
    * "bucket")` for the shingle index, `Seq("list")` for the IVF
    * index).
    */
  def rewriteWithout(spark: SparkSession, path: String,
                     partCols: Seq[String], idCol: String,
                     ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "nothing to forget")
    val t = spark.read.parquet(path)
    // one pass: which partitions hold the ids, and how many rows go
    val touched = t.filter(col(idCol).isin(ids: _*))
      .groupBy(partCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .collect()
    if (touched.isEmpty) return 0L
    val removed = touched.map(_.getAs[Long]("__n")).sum
    def partCond(r: org.apache.spark.sql.Row) =
      partCols.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
        .reduce(_ && _)
    val cond = touched.map(partCond).reduce(_ || _)
    val remaining = t.filter(cond && !col(idCol).isin(ids: _*))
    // partitions that still have rows after the filter — computed
    // BEFORE the overwrite (bounded collect); the complement must be
    // deleted by hand below
    val keep = remaining.select(partCols.map(col): _*).distinct()
      .collect().map(_.toSeq).toSet
    remaining
      .repartition(partCols.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(r => keep.contains(r.toSeq.dropRight(1))).foreach { r =>
      val dir = partCols.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(path, dir), true)
    }
    removed
  }

  /** Forget documents in a persisted shingle index
    * ([[Dedup.writeShingleIndex]] layout: `ingest=<tag>/bucket=<n>`).
    * Other documents' postings and `n_sh` values are untouched — a
    * forgotten doc only ever contributed its own rows.
    *
    * All four family forgetters run through
    * [[graft.sources.IndexLifecycle.mutate]]: on a generational index
    * the rewrite targets the current version dir and commits a version
    * bump, so a rebuild racing the forget is fenced (it would
    * otherwise republish the pre-forget rows it had already read) and
    * a forget losing the race re-runs against the winner's output —
    * [[rewriteWithout]] is idempotent, so the re-run removes exactly
    * the revived leftovers. Flat indexes keep the plain in-place
    * rewrite.
    */
  def fromShingleIndex(spark: SparkSession, indexPath: String,
                       docIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "bucket"), "doc", docIds))

  /** Forget vectors in a persisted IVF index
    * ([[Similarity.ivfWriteIndex]] layout: `ingest=<tag>/list=<n>`). The coarse
    * quantizer's centroids are statistics over the historical corpus
    * and carry no per-vector data — they stay valid (and are refreshed
    * by the periodic rebuild, same policy as the shingle hot list).
    */
  def fromIvfIndex(spark: SparkSession, indexPath: String,
                   vecIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "list"), "nid", vecIds))

  /** Forget vectors in a persisted semantic cell index
    * ([[SemDedup.writeCellIndex]] layout: `ingest=<tag>/cell=<id>/`, columns
    * `vec_id`, `embedding`). The `_graft_centroids` sidecar stays: the
    * quantizer's centroids are corpus statistics, not per-vector data
    * (same argument as [[fromIvfIndex]]) — even when a forgotten id
    * WAS a centroid, the centroid row stores only the historical mean
    * position every other member was assigned against; survivors' cell
    * assignments are build-time facts and do not change. The periodic
    * index rebuild refreshes the quantizer, same policy as the shingle
    * hot list.
    */
  def fromCellIndex(spark: SparkSession, indexPath: String,
                    vecIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "cell"), "vec_id", vecIds))

  /** Forget images in a persisted perceptual-hash index
    * ([[Multimodal.writePhashIndex]] layout: `ingest=<tag>/bucket=<n>`,
    * columns `id`, `h`, `b`, `v`). A forgotten image only ever
    * contributed its own band rows — survivors' hashes are per-image
    * facts, so the touched-partition rewrite is sound, completing the
    * deletion-propagation symmetry across all four index families
    * (shingle, IVF, semantic cell, phash).
    */
  def fromPhashIndex(spark: SparkSession, indexPath: String,
                     imageIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "bucket"), "id", imageIds))

  /** Forget master records in a persisted ER deletion-variant index
    * ([[EntityResolution.writeVariantIndex]] layout:
    * `ingest=<tag>/bucket=<n>`, columns `id`, `nm`, `blk`, `v`). A
    * record only ever contributed its own variant rows; the hot-variant
    * sidecar is a corpus statistic and is refreshed by the periodic
    * rebuild (the shingle hot-list policy) — between rebuilds it can
    * only over-prune probe keys, never produce a wrong pair.
    */
  def fromVariantIndex(spark: SparkSession, indexPath: String,
                       recordIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "bucket"), "id", recordIds))

  /** Forget documents in a persisted span-fingerprint index
    * ([[SpanDedup.writeSpanIndex]] layout: `ingest=<tag>/bucket=<n>`,
    * columns `doc`, `h`, `cnt`). Per-(doc, span) counts are the unit
    * of storage precisely so deletion propagates: removing a doc's
    * rows subtracts its contribution from every span total the probes
    * aggregate — a per-span running total could never forget.
    */
  def fromSpanIndex(spark: SparkSession, indexPath: String,
                    docIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "bucket"), "doc", docIds))

  /** Forget documents in a persisted BM25 postings index
    * ([[Search.writeBm25Index]] layout: `ingest=<tag>/bucket=<n>`,
    * columns `doc_id`, `t`, `tf`, `len`). A doc's posting rows are its
    * own; the per-segment corpus stats (N, sum_len) are NOT
    * decremented — they are corpus constants on the hot-list policy,
    * refreshed by the periodic rebuild. Until then a stale (larger) N
    * biases every term's idf upward and avgdl stays put — a bounded,
    * forgotten-fraction-sized scoring drift, never a missing or
    * resurrected document (dft and the postings themselves are exact
    * immediately).
    */
  def fromBm25Index(spark: SparkSession, indexPath: String,
                    docIds: Seq[Long]): Long =
    graft.sources.IndexLifecycle.mutate(spark, indexPath)(dir =>
      rewriteWithout(spark, dir, Seq("ingest", "bucket"), "doc_id", docIds))

  // ------------------------------------------- reader-isolated variants

  /** The `viaRebuild` family: the same deletions expressed as a fenced
    * [[graft.sources.IndexLifecycle.forgetViaRebuild]] — the index is
    * rebuilt from its victim-filtered contents into a FRESH data dir
    * and published through the CAS, so a concurrent prober only ever
    * resolves a fully-built version (the in-place `from*Index` forms
    * rewrite files inside the live dir and have a documented torn-read
    * window for the touched partitions). Cost: one full index rewrite
    * instead of touched-partition rewrites — the price of full reader
    * isolation; pick per deployment. A second benefit falls out for
    * free: every derived corpus statistic (shingle hot list, ER hot
    * variants, BM25 segment stats, cell/IVF quantizers) is refreshed
    * from the survivors, so the in-place forms' documented
    * stats-drift-until-next-rebuild window does not exist here. For
    * the cell and IVF families that refresh re-runs the quantizer, so
    * survivors may land in DIFFERENT cells/lists than before (corpus
    * statistics, not per-vector data — same as any maintenance
    * rebuild).
    */
  def fromShingleIndexViaRebuild(spark: SparkSession, indexPath: String,
                                 docIds: Seq[Long],
                                 orphanGraceMs: Long =
                                   graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                                 readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("doc").isin(docIds: _*), orphanGraceMs, readerGraceMs)(
      Dedup.shingleRebuildClosure)

  def fromIvfIndexViaRebuild(spark: SparkSession, indexPath: String,
                             vecIds: Seq[Long],
                             orphanGraceMs: Long =
                               graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                             readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("nid").isin(vecIds: _*), orphanGraceMs, readerGraceMs)(
      Similarity.ivfDetRebuildClosure(spark))

  def fromCellIndexViaRebuild(spark: SparkSession, indexPath: String,
                              vecIds: Seq[Long],
                              orphanGraceMs: Long =
                                graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                              readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("vec_id").isin(vecIds: _*),
      orphanGraceMs, readerGraceMs) { (kept, srcDir, dst) =>
      // quantizer policy from the index's own sidecar (params doctrine)
      SemDedup.writeCellIndex(
        kept.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding",
        SemDedup.readCellCentroidEvery(spark, srcDir), dst)
    }

  def fromPhashIndexViaRebuild(spark: SparkSession, indexPath: String,
                               imageIds: Seq[Long],
                               orphanGraceMs: Long =
                                 graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                               readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("id").isin(imageIds: _*), orphanGraceMs, readerGraceMs)(
      Multimodal.phashRebuildClosure(spark))

  def fromVariantIndexViaRebuild(spark: SparkSession, indexPath: String,
                                 recordIds: Seq[Long],
                                 orphanGraceMs: Long =
                                   graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                                 readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("id").isin(recordIds: _*), orphanGraceMs, readerGraceMs)(
      EntityResolution.variantRebuildClosure(spark))

  def fromSpanIndexViaRebuild(spark: SparkSession, indexPath: String,
                              docIds: Seq[Long],
                              orphanGraceMs: Long =
                                graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                              readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("doc").isin(docIds: _*), orphanGraceMs, readerGraceMs)(
      SpanDedup.spanRebuildClosure(spark))

  def fromBm25IndexViaRebuild(spark: SparkSession, indexPath: String,
                              docIds: Seq[Long],
                              orphanGraceMs: Long =
                                graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                              readerGraceMs: Long = 0L): Long =
    graft.sources.IndexLifecycle.forgetViaRebuild(spark, indexPath,
      col("doc_id").isin(docIds: _*), orphanGraceMs, readerGraceMs)(
      Search.bm25RebuildClosure(spark))
}
