package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Dedup, Validate}

/** Streaming incremental near-dup detection: the probe-then-append
  * ingest loop of [[Dedup.jaccardAgainstIndex]] /
  * [[Dedup.appendToShingleIndex]] lifted onto Structured Streaming, so
  * a continuously-ingesting corpus (the FileTopic/Kafka transport, a
  * cloud drop directory) is deduplicated against everything that
  * arrived before it — batch×corpus per trigger, never corpus×corpus.
  *
  * Per micro-batch, inside one `foreachBatch`:
  *  1. probe: near-dup pairs of the batch against the persisted index
  *     (bucket-partition-pruned, hot list applied index-side) are
  *     written to `pairsDir/batch=<id>`;
  *  2. append: the batch's postings land in the index under
  *     `ingest=b<id>` so the NEXT batch sees this one.
  *
  * Both writes are dynamic partition overwrites keyed by the streaming
  * batchId, which Structured Streaming holds fixed across retries of a
  * failed batch — so a crash anywhere in the probe→append→commit
  * window replays to the SAME partitions and the loop is idempotent
  * end-to-end (the transport is at-least-once; a blind append would
  * silently inflate later probes' intersection counts). The replayed
  * probe additionally EXCLUDES its own batch's ingest segment — a
  * crash after the append but before the checkpoint commit would
  * otherwise make the replay match the batch against its
  * previously-appended self and rewrite the pairs partition with
  * self/intra-batch matches. This is the
  * same batchId-keyed idempotence contract as
  * [[CdcPipeline.idempotentParquetUpsert]], applied to an index.
  *
  * Scale: each trigger pays batch shingling (map-only) + one
  * broadcast hot-list anti-join + one equi-join against the pruned
  * index scan — per-trigger cost ∝ batch, not corpus; the index grows
  * by one `ingest` partition per batch and is re-compacted by the
  * periodic [[Dedup.writeShingleIndex]] rebuild (which also refreshes
  * the hot list), exactly the segment-merge maintenance a log-
  * structured store runs.
  *
  * Every attach* loop takes `maxSegments` (round-12 DEFAULTS: the
  * family's measured-knee policy — 8 for the shingle-probing loops,
  * 16 for the bucket-pruned families; pass 0 to disable when an
  * external maintenance job owns compaction, accepting unbounded
  * segment growth until it runs): when set,
  * the trigger runs the family's
  * [[graft.sources.IndexLifecycle.maybeRebuild]] policy after its
  * append, so segment accumulation is bounded IN the loop instead of
  * by an operator remembering the maintenance job — probes stay on the
  * flat part of the measured probe-vs-segment-count curve at an
  * amortized O(rebuild / maxSegments) per trigger. Replay stays safe
  * when a rebuild absorbs a replayed batch's tag because the probes'
  * exclusion is id-level, not only segment-level (see
  * [[Dedup.jaccardAgainstIndex]]), and because a crash-restart replay
  * of an already-absorbed tag is detected before it can re-seal
  * ([[graft.sources.IndexLifecycle.appendSegment]]'s pre-check). Each
  * loop also takes `readerGraceMs` (default 0), threaded into its
  * maybeRebuild: in-loop compaction rebuilds OFTEN and retention keeps
  * only two data dirs, so a deployment with long-running concurrent
  * readers must pass the same grace here as on its explicit rebuilds
  * or a probe can lose its dir mid-scan. Rebuild POLICY (nBuckets,
  * maxDf, centroidEvery, ...) is never passed here: every family reads
  * it from the index's own params sidecar.
  *
  * @note BEHAVIOR CHANGE (round 12): `maxSegments` defaults flipped
  *       from 0 (off) to the measured-knee caps below. A deployment
  *       that upgraded across that change and relied on an EXTERNAL
  *       maintenance job now runs in-loop rebuilds too — per-trigger
  *       latency spikes at the rebuild cadence plus the rebuild's
  *       write amplification. Pass `maxSegments = 0` explicitly to
  *       restore the old behavior and keep compaction external.
  */
object StreamingDedup {

  /** Default in-loop compaction caps: HALF the measured probe knee of
    * the family's probe-vs-segment-count curve (PLANS.md round-10
    * batches 3/14). The shingle probe reads wide posting rows per
    * touched bucket and degrades ~2.5x by 16 segments, so the
    * shingle-probing loops cap at 8; the bm25/cell/phash/ER
    * bucket-pruned probes stay flat to ~64, so those loops cap at 16.
    * A cap of 0 disables in-loop compaction (unbounded segment growth
    * — only for deployments whose maintenance job rebuilds on its own
    * schedule).
    */
  val ShingleMaxSegments = 8
  val BucketedMaxSegments = 16

  /** Shared trigger scaffolding for every attach* loop: run the body
    * under its own cache-ownership scope ([[graft.util.Caches.scoped]])
    * so THIS trigger's operator-owned persists are released at trigger
    * exit even when the body throws (a failed trigger must not pin its
    * caches for the session's remaining lifetime), and concurrent
    * streams in one session never unpersist each other's in-flight
    * frames — ownership is a per-scope token, immune to JVM thread-id
    * reuse.
    */
  private def perTrigger(body: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => graft.util.Caches.scoped(body(batch, batchId))


  /** Build the `foreachBatch` writer; the caller picks trigger/
    * checkpoint options and calls `.start()`. `docs` must be a
    * streaming DataFrame with `idCol` and `textCol` columns; the index
    * at `indexPath` must already exist ([[Dedup.writeShingleIndex]] —
    * the offline base build, possibly empty of postings but carrying
    * the hot-list sidecar).
    */
  def attach(docs: DataFrame, idCol: String, textCol: String,
             indexPath: String, pairsDir: String,
             n: Int = 3, threshold: Double = 0.5,
             nBuckets: Int = 64, maxSegments: Int = ShingleMaxSegments,
             readerGraceMs: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      Dedup.jaccardAgainstIndex(spark, indexPath, batch,
          idCol, textCol, n, threshold, nBuckets,
          excludeIngest = Some(s"b$batchId"))
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
      Dedup.appendToShingleIndex(spark, indexPath, batch,
        idCol, textCol, n, ingestTag = s"b$batchId", nBuckets = nBuckets)
      // maxSegments > 0 = the in-loop compaction policy: one segment
      // accumulates per batch, so the steady-state stream pays the
      // bounded merge every ~maxSegments triggers and probes stay on
      // the flat part of the measured probe-vs-segment-count curve.
      // Safe under replay: the probe's exclusion is id-level, so a
      // rebuild absorbing the replayed tag cannot resurrect self-matches
      if (maxSegments > 0)
        Dedup.maybeRebuildShingleIndex(spark, indexPath, maxSegments,
          readerGraceMs = readerGraceMs)
    })

  /** The same probe-then-append streaming loop over EMBEDDINGS: each
    * micro-batch's semantic near-dups against the persisted cell index
    * ([[graft.ops.SemDedup.writeCellIndex]]) land in
    * `pairsDir/batch=<id>`, then the batch joins the index under
    * `ingest=b<id>` so the next trigger sees it. Identical idempotence
    * contract to [[attach]]: both writes are batchId-keyed dynamic
    * partition overwrites, so an at-least-once replay is a no-op. The
    * index owns the quantizer (centroid sidecar), so every batch
    * assigns into the same cell space regardless of arrival order;
    * per-trigger cost is batch assignment (map-only, broadcast
    * centroids) + one equi-join against the touched-cell-pruned index
    * scan — ∝ batch, never corpus×corpus.
    */
  def attachSemantic(vecs: DataFrame, idCol: String, vecCol: String,
                     indexPath: String, pairsDir: String,
                     threshold: Double,
                     maxSegments: Int = BucketedMaxSegments,
                     readerGraceMs: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] = {
    vecs.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.SemDedup.semanticAgainstIndex(spark, indexPath, batch,
          idCol, vecCol, threshold, excludeIngest = Some(s"b$batchId"))
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
      graft.ops.SemDedup.appendToCellIndex(spark, indexPath, batch,
        idCol, vecCol, ingestTag = s"b$batchId")
      if (maxSegments > 0)
        graft.ops.SemDedup.maybeRebuildCellIndex(spark, indexPath,
          maxSegments, readerGraceMs = readerGraceMs)
    })
  }

  /** The probe-then-append loop for IMAGES: each micro-batch's
    * perceptual near-dups against the persisted phash index
    * ([[graft.ops.Multimodal.writePhashIndex]]) land in
    * `pairsDir/batch=<id>`, then the batch's dHash band rows join the
    * index under `ingest=b<id>` so the next trigger dedups against
    * them. Identical batchId-keyed idempotence contract to [[attach]].
    * Per-trigger cost: batch decode+hash (map-only) + one equi-join
    * against the bucket-pruned index scan — ∝ batch, never
    * corpus×corpus. Completes the streaming symmetry: text, embedding
    * and image modalities all run the same ingest loop.
    */
  def attachPhash(images: DataFrame, indexPath: String, pairsDir: String,
                  maxDist: Int = 3, nBuckets: Int = 64,
                  maxSegments: Int = BucketedMaxSegments,
                  readerGraceMs: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] =
    images.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.Multimodal.phashAgainstIndex(spark, indexPath, batch,
          maxDist, nBuckets, excludeIngest = Some(s"b$batchId"))
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
      graft.ops.Multimodal.appendToPhashIndex(spark, indexPath, batch,
        ingestTag = s"b$batchId", maxDist = maxDist, nBuckets = nBuckets)
      if (maxSegments > 0)
        graft.ops.Multimodal.maybeRebuildPhashIndex(spark, indexPath,
          maxSegments, readerGraceMs = readerGraceMs)
    })

  /** Streaming ENTITY RESOLUTION on master-table ingest — the
    * probe-then-append loop for record linkage: each micro-batch of
    * NEW master records (a CDC feed on the customer table, a partner
    * onboarding drop) is first LINKED against every master already
    * indexed ("which existing entity does this record match?" — the
    * pairs land in `pairsDir/batch=<id>`), then its deletion variants
    * join the index under `ingest=b<id>` so the next batch resolves
    * against it. Identical batchId-keyed idempotence contract to
    * [[attach]] (the probe excludes its own replayed segment; the
    * append is a sealed-segment rewrite). Per-trigger cost: batch
    * variant derivation (map-only explode) + one equi-join against
    * the bucket-pruned index scan — ∝ batch, never master × batch.
    * Completes the streaming symmetry across all the index families:
    * text, embedding, image, and now structured-record identity.
    */
  def attachLink(masters: DataFrame, idCol: String, nameCol: String,
                 blockCol: String, indexPath: String, pairsDir: String,
                 maxDist: Int = 1, nBuckets: Int = 16,
                 maxSegments: Int = BucketedMaxSegments,
                 readerGraceMs: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] =
    masters.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.EntityResolution.linkAgainstIndex(spark, indexPath, batch,
          idCol, nameCol, blockCol, maxDist, nBuckets,
          excludeIngest = Some(s"b$batchId"))
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(pairsDir)
      graft.ops.EntityResolution.appendToVariantIndex(spark, indexPath,
        batch, idCol, nameCol, blockCol, ingestTag = s"b$batchId",
        maxDist = maxDist, nBuckets = nBuckets)
      if (maxSegments > 0)
        graft.ops.EntityResolution.maybeRebuildVariantIndex(spark,
          indexPath, maxSegments, readerGraceMs = readerGraceMs)
    })

  /** Streaming RETRIEVAL REFRESH on corpus ingest — the BM25 postings
    * index's streaming path: each micro-batch of new documents joins
    * the index under `ingest=b<id>` (sealed, batchId-idempotent), then
    * the STANDING query set re-ranks over the grown corpus and the
    * refreshed top-k snapshot lands in `outDir/batch=<id>` — the
    * saved-search / alerting shape, where results must reflect every
    * document ingested so far. Unlike the dedup loops the probe runs
    * AFTER the append and does NOT exclude the batch's own segment:
    * the snapshot is supposed to include the new documents, and a
    * replayed trigger re-appends idempotently then recomputes the
    * identical snapshot into its own partition. Per-trigger cost:
    * batch tokenization (map-only) + the standing queries' hit-list
    * probe — ∝ batch + hits, never corpus.
    */
  def attachBm25(docs: DataFrame, idCol: String, textCol: String,
                 indexPath: String, outDir: String,
                 standingQueries: Seq[(Int, String)], k: Int = 10,
                 nBuckets: Int = 16,
                 maxSegments: Int = BucketedMaxSegments,
                 readerGraceMs: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.ops.Search.appendToBm25Index(spark, indexPath, batch,
        idCol, textCol, ingestTag = s"b$batchId", nBuckets = nBuckets)
      // compact BEFORE the probe: the probe is the per-trigger product,
      // so it should read the collapsed layout the policy just paid for
      if (maxSegments > 0)
        graft.ops.Search.maybeRebuildBm25Index(spark, indexPath,
          maxSegments, readerGraceMs = readerGraceMs)
      graft.ops.Search.bm25AgainstIndex(spark, indexPath,
          standingQueries, k, nBuckets)
        .withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(outDir)
    })

  /** [[attachCurate]] extended to a MULTIMODAL corpus — the streaming
    * form of `pipeline_train_export_mm`'s two-canon composition, per
    * micro-batch inside one foreachBatch:
    *
    *  1. GATE: Gopher-style repetition filters on the text;
    *  2. TEXT CANON: survivors probe the persisted shingle index and
    *     near-dups of anything already ingested are dropped;
    *  3. IMAGE CANON: the remaining docs' images probe the persisted
    *     phash index — a doc whose image perceptually duplicates an
    *     already-curated image is dropped EVEN WHEN ITS TEXT IS UNIQUE
    *     (the cut the text-only loop cannot make);
    *  4. SCORE: survivors carry DSIR importance weights into
    *     `outDir/batch=<id>`;
    *  5. both indexes absorb the survivors (text postings under
    *     `ingest=b<id>`, dHash bands likewise) so the NEXT batch's two
    *     canons see this batch's curated documents.
    *
    * `images` maps a batch to its [[graft.ops.Multimodal.MediaRow]]
    * frame (doc_id, mime, payload) — a production multimodal table
    * selects its binary column; the registered fixture derives the
    * closed-form synthetic payloads. Same batchId-keyed idempotence
    * contract as [[attach]]: both probes exclude the batch's own
    * replayed segment, both appends and the output write are
    * batchId-keyed overwrites. Per trigger nothing scans history:
    * gate map-only, both probes bucket-pruned batch×history, the
    * scoring join carries the 256-row model.
    */
  /** `redactRules`: the same scrub-before-the-gate option as
    * [[attachCurate]] — scrubbed text feeds the gate, both canons'
    * probes, the index appends, and the scored output; the image
    * payload columns pass through untouched.
    */
  def attachCurateMm(docs: DataFrame, idCol: String, textCol: String,
                     images: DataFrame => DataFrame,
                     indexPath: String, phashIndexPath: String,
                     modelPath: String, outDir: String,
                     n: Int = 3, threshold: Double = 0.8,
                     nBuckets: Int = 64, maxDist: Int = 3,
                     phashBuckets: Int = 64,
                     maxSegments: Int = ShingleMaxSegments,
                     phashMaxSegments: Int = BucketedMaxSegments,
                     readerGraceMs: Long = 0L,
                     redactRules: Seq[graft.ops.Redact.Rule] = Nil): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch(perTrigger { (raw: DataFrame, batchId: Long) =>
      curateMmBatch(raw, batchId, idCol, textCol, images, indexPath,
        phashIndexPath, modelPath, outDir, n, threshold, nBuckets,
        maxDist, phashBuckets, maxSegments, phashMaxSegments,
        readerGraceMs, redactRules)
    })

  /** The per-batch MULTIMODAL curate body — SCRUB → gate → text canon
    * → image canon → DSIR score → land → both index appends →
    * per-family in-loop compaction — shared verbatim by
    * [[attachCurateMm]] and [[attachIngestMm]] (the same
    * single-source discipline as [[curateBatch]]: a threshold or
    * stage-order change must reach the composed ingest and the
    * standalone loop together).
    */
  private def curateMmBatch(raw: DataFrame, batchId: Long,
                            idCol: String, textCol: String,
                            images: DataFrame => DataFrame,
                            indexPath: String, phashIndexPath: String,
                            modelPath: String, outDir: String,
                            n: Int, threshold: Double, nBuckets: Int,
                            maxDist: Int, phashBuckets: Int,
                            maxSegments: Int, phashMaxSegments: Int,
                            readerGraceMs: Long,
                            redactRules: Seq[graft.ops.Redact.Rule]): Unit = {
    val spark = raw.sparkSession
    import org.apache.spark.sql.functions._
    val batch = if (redactRules.isEmpty) raw
                else graft.ops.Redact.apply(raw, textCol, redactRules)
    val rep = graft.ops.TextAnalysis.repetition(batch, idCol, textCol)
    // keep EVERY batch column (unlike attachCurate's id+text): the
    // image payload must still be there when `images` runs on the
    // text survivors and again on the final survivors
    val kept = batch.join(rep, idCol)
      .filter(floor(col("dup_trigram_ratio") * 1e6) <= 20000L &&
        floor(col("top_token_ratio") * 1e6) <= 120000L)
      .select(batch.columns.map(col): _*)
    val textDups = graft.ops.Dedup.jaccardAgainstIndex(spark, indexPath,
        kept, idCol, textCol, n, threshold, nBuckets,
        excludeIngest = Some(s"b$batchId"))
      .select(col("i").as(idCol)).distinct()
    val ddText = kept.join(textDups, Seq(idCol), "left_anti")
    val imgDups = graft.ops.Multimodal.phashAgainstIndex(spark,
        phashIndexPath, images(ddText), maxDist, phashBuckets,
        excludeIngest = Some(s"b$batchId"))
      .select(col("j").as(idCol)).distinct()
    val survivors = ddText.join(imgDups, Seq(idCol), "left_anti")
    graft.ops.Dsir.scoreAgainstModel(spark, modelPath, survivors,
        idCol, textCol)
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(outDir)
    graft.ops.Dedup.appendToShingleIndex(spark, indexPath, survivors,
      idCol, textCol, n, ingestTag = s"b$batchId", nBuckets = nBuckets)
    graft.ops.Multimodal.appendToPhashIndex(spark, phashIndexPath,
      images(survivors), ingestTag = s"b$batchId", maxDist = maxDist,
      nBuckets = phashBuckets)
    // per-family caps: the shingle knee is ~8 segments, the banded
    // phash probe stays flat to ~64 — one shared cap would rebuild
    // the image index twice as often as its measured policy
    if (maxSegments > 0)
      graft.ops.Dedup.maybeRebuildShingleIndex(spark, indexPath,
        maxSegments, readerGraceMs = readerGraceMs)
    if (phashMaxSegments > 0)
      graft.ops.Multimodal.maybeRebuildPhashIndex(spark, phashIndexPath,
        phashMaxSegments, readerGraceMs = readerGraceMs)
  }

  /** [[attachIngest]] for the MULTIMODAL pipeline (r15 verdict #4):
    * ADMIT ([[attachValidated]]'s routing) → SCRUB → CURATE-MM
    * ([[attachCurateMm]]'s body, via the shared [[curateMmBatch]]) in
    * ONE foreachBatch — quarantine, validation report feed, curated
    * output, BOTH index appends (text postings + dHash bands), and
    * the checkpoint share a single batchId-keyed idempotence unit. A
    * quarantined row never reaches the scrub, either index, or the
    * scorer; a doc whose image perceptually duplicates an
    * already-curated image is cut even when its text is unique.
    * Per-trigger cost is the sum of the stages' — all
    * batch-proportional, nothing corpus-sized.
    */
  def attachIngestMm(rows: DataFrame, idCol: String, textCol: String,
                     images: DataFrame => DataFrame,
                     checks: Seq[Validate.Check],
                     redactRules: Seq[graft.ops.Redact.Rule],
                     indexPath: String, phashIndexPath: String,
                     modelPath: String, outDir: String,
                     quarantineDir: String, reportDir: String,
                     n: Int = 3, threshold: Double = 0.8,
                     nBuckets: Int = 64, maxDist: Int = 3,
                     phashBuckets: Int = 64,
                     maxSegments: Int = ShingleMaxSegments,
                     phashMaxSegments: Int = BucketedMaxSegments,
                     readerGraceMs: Long = 0L): DataStreamWriter[org.apache.spark.sql.Row] = {
    val rowChecks = checks.filterNot(_.isInstanceOf[Validate.Unique])
    require(rowChecks.nonEmpty,
      "the admission stage needs at least one row-level check to route on")
    Seq("batch", "reasons", "violations").foreach(c =>
      require(!rows.columns.contains(c),
        s"attachIngestMm writes column '$c' — rename it in the input " +
          "(it would be silently overwritten)"))
    rows.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions._
      def land(df: DataFrame, dir: String): Unit =
        df.withColumn("batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(dir)
      // 1. ADMIT
      land(Validate.quarantine(batch, rowChecks)
        .withColumn("reasons", concat_ws(",", col("violations")))
        .drop("violations"), quarantineDir)
      land(Validate.report(batch, checks), reportDir)
      val admitted = Validate.clean(batch, rowChecks)
      // 2+3. SCRUB → CURATE-MM: the SAME body attachCurateMm runs
      curateMmBatch(admitted, batchId, idCol, textCol, images,
        indexPath, phashIndexPath, modelPath, outDir, n, threshold,
        nBuckets, maxDist, phashBuckets, maxSegments, phashMaxSegments,
        readerGraceMs, redactRules)
    })
  }

  /** The full per-batch CURATION loop — the streaming composition of
    * three already-proven stages, chained the way a production ingest
    * runs them inside ONE foreachBatch:
    *
    *  1. GATE: Gopher-style repetition filters
    *     ([[graft.ops.TextAnalysis.repetition]], the pipeline_curate
    *     thresholds) drop low-quality documents map-side;
    *  2. DEDUP: survivors probe the persisted shingle index
    *     ([[graft.ops.Dedup.jaccardAgainstIndex]]) and near-dups of
    *     ANYTHING already ingested — offline corpus or an earlier
    *     batch — are dropped;
    *  3. SCORE: unique survivors are scored against the persisted
    *     DSIR model ([[graft.ops.Dsir.scoreAgainstModel]]) and land
    *     in `outDir/batch=<id>` with their importance weights;
    *  4. the survivors' postings join the index under `ingest=b<id>`
    *     so the next batch dedups against them.
    *
    * Same batchId-keyed idempotence contract as [[attach]]. Per
    * trigger nothing scans the historical corpus: the gate is
    * map-only, the probe is bucket-pruned batch×history, the scoring
    * join carries the 256-row model.
    */
  /** `exportable = true` declares the run will end in a
    * [[graft.ops.TrainExport.commitStreamDrain]] drain export, whose
    * per-batch pins REQUIRE in-loop compaction off (a mid-stream
    * rebuild absorbs ingest tags and the per-batch corpora stop
    * existing as segment subsets of any retained version — r13's
    * default-configuration trap, which otherwise surfaces only AT
    * EXPORT TIME, after the stream drained). The mode FORCES the
    * effective cap to 0; a caller that also passes a contradictory
    * positive `maxSegments` fails HERE, at attach time, before the
    * first batch processes. Run the maintenance rebuild AFTER the
    * drain export commits.
    */
  /** `redactRules` (empty = no scrub, the pre-r15 behavior): a PII
    * rule sheet ([[graft.ops.Redact.StandardRules]] or a custom one)
    * applied to `textCol` BEFORE the repetition gate — so the gate's
    * ratios, the dedup shingles, the index postings, and the DSIR
    * features are all computed on SCRUBBED text, and no raw PII span
    * ever reaches the output, the index, or a drain export derived
    * from them. Scrub position matters beyond hygiene: two documents
    * identical up to a distinct PII span (the same form letter sent to
    * different addresses) dedup ONLY after the scrub canonicalizes the
    * span — CdcStreamSpec pins that cross-batch case. Map-only
    * (chained codegen'd regexp_replace), so the scrub adds zero
    * shuffles to the trigger.
    */
  def attachCurate(docs: DataFrame, idCol: String, textCol: String,
                   indexPath: String, modelPath: String, outDir: String,
                   n: Int = 3, threshold: Double = 0.8,
                   nBuckets: Int = 64,
                   maxSegments: Int = ShingleMaxSegments,
                   readerGraceMs: Long = 0L,
                   exportable: Boolean = false,
                   redactRules: Seq[graft.ops.Redact.Rule] = Nil): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(!exportable || maxSegments == ShingleMaxSegments ||
        maxSegments == 0,
      s"attachCurate(exportable = true) forbids in-loop compaction — " +
        "a mid-stream rebuild absorbs per-batch ingest tags and " +
        "commitStreamDrain's pins become underivable; got maxSegments " +
        s"= $maxSegments (leave it at the default or pass 0)")
    val effMaxSegments = if (exportable) 0 else maxSegments
    docs.writeStream.foreachBatch(perTrigger { (raw: DataFrame, batchId: Long) =>
      curateBatch(raw, batchId, idCol, textCol, indexPath, modelPath,
        outDir, n, threshold, nBuckets, effMaxSegments, readerGraceMs,
        redactRules)
    })
  }

  /** The per-batch curate body — SCRUB → repetition gate → near-dup
    * probe → DSIR score → land → index append → optional in-loop
    * compaction — shared verbatim by [[attachCurate]] and
    * [[attachIngest]] (r15 ADVICE: the ingest composition must not
    * drift from the standalone loop when a gate threshold or stage
    * order changes — the same single-source discipline the
    * parameterized oracle builder enforces on the SQL side). The scrub
    * runs FIRST when rules are given, so gate ratios, shingles,
    * postings, and DSIR features all see scrubbed text.
    */
  private def curateBatch(raw: DataFrame, batchId: Long,
                          idCol: String, textCol: String,
                          indexPath: String, modelPath: String,
                          outDir: String, n: Int, threshold: Double,
                          nBuckets: Int, effMaxSegments: Int,
                          readerGraceMs: Long,
                          redactRules: Seq[graft.ops.Redact.Rule]): Unit = {
    val spark = raw.sparkSession
    import org.apache.spark.sql.functions._
    val batch = if (redactRules.isEmpty) raw
                else graft.ops.Redact.apply(raw, textCol, redactRules)
    val rep = graft.ops.TextAnalysis.repetition(batch, idCol, textCol)
    val kept = batch.join(rep, idCol)
      .filter(floor(col("dup_trigram_ratio") * 1e6) <= 20000L &&
        floor(col("top_token_ratio") * 1e6) <= 120000L)
      .select(idCol, textCol)
    val dups = graft.ops.Dedup.jaccardAgainstIndex(spark, indexPath,
        kept, idCol, textCol, n, threshold, nBuckets,
        excludeIngest = Some(s"b$batchId"))
      .select(col("i").as(idCol)).distinct()
    val survivors = kept.join(dups, Seq(idCol), "left_anti")
    graft.ops.Dsir.scoreAgainstModel(spark, modelPath, survivors,
        idCol, textCol)
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(outDir)
    graft.ops.Dedup.appendToShingleIndex(spark, indexPath, survivors,
      idCol, textCol, n, ingestTag = s"b$batchId", nBuckets = nBuckets)
    if (effMaxSegments > 0)
      Dedup.maybeRebuildShingleIndex(spark, indexPath, effMaxSegments,
        readerGraceMs = readerGraceMs)
  }

  /** Streaming ADMISSION GATE: every micro-batch runs a
    * [[graft.ops.Validate]] constraint sheet BEFORE anything enters
    * the pipeline — clean rows land in `outDir/batch=<id>`, violating
    * rows in `quarantineDir/batch=<id>` with a `reasons` column
    * (comma-joined check names, sheet order), and the O(#checks)
    * per-batch audit report appends to `reportDir/batch=<id>`. This is
    * the validation stage a production ingest runs in front of
    * [[attachCurate]]: malformed rows never reach the dedup index or
    * the scorer, and the report stream is the alerting feed.
    *
    * Routing uses the sheet's ROW-LEVEL checks (a row either violates
    * or it doesn't); key-level checks (`Unique`) are a property of the
    * batch, so they appear in the report but route nothing. All three
    * writes are dynamic partition overwrites keyed by the streaming
    * batchId — the [[attach]] idempotence contract: a replayed batch
    * rewrites its own partitions bit-for-bit.
    *
    * Scale: routing is map-only (zero shuffles — the ValidateSpec plan
    * pin); the report is one partial-agg'd pass per trigger plus one
    * key exchange per Unique; per-trigger cost ∝ batch, never corpus.
    */
  def attachValidated(rows: DataFrame, checks: Seq[Validate.Check],
                      outDir: String, quarantineDir: String,
                      reportDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    val rowChecks = checks.filterNot(_.isInstanceOf[Validate.Unique])
    require(rowChecks.nonEmpty,
      "admission gate needs at least one row-level check to route on")
    // the gate CLAIMS batch (all three sinks), reasons (quarantine) and
    // violations (scratch) via withColumn, which silently replaces an
    // existing column — reject the clash loudly (the Sampling
    // discipline; Validate.withViolations re-checks `violations`)
    Seq("batch", "reasons", "violations").foreach(c =>
      require(!rows.columns.contains(c),
        s"attachValidated writes column '$c' — rename it in the input " +
          "(it would be silently overwritten)"))
    rows.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      def land(df: DataFrame, dir: String): Unit =
        df.withColumn("batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(dir)
      land(Validate.clean(batch, rowChecks), outDir)
      land(Validate.quarantine(batch, rowChecks)
        .withColumn("reasons", concat_ws(",", col("violations")))
        .drop("violations"), quarantineDir)
      land(Validate.report(batch, checks), reportDir)
    })
  }

  /** The ONE-CALL PRODUCTION INGEST — the three proven stages composed
    * in the order a real pipeline runs them, inside ONE foreachBatch:
    *
    *  1. ADMIT ([[attachValidated]]'s routing): the constraint sheet's
    *     row-level checks split the batch — violating rows land in
    *     `quarantineDir/batch=<id>` with `reasons`, the O(#checks)
    *     report appends to `reportDir/batch=<id>` (the
    *     [[graft.ops.Validate.batchTrend]] feed), and ONLY clean rows
    *     proceed: malformed rows never reach the scrub, the index, or
    *     the scorer;
    *  2. SCRUB ([[attachRedacted]]'s stage, positioned as
    *     [[attachCurate]]'s `redactRules` does): the clean rows' text
    *     is redacted BEFORE the gate, so every downstream artifact
    *     sees only scrubbed text;
    *  3. CURATE ([[attachCurate]]'s body): repetition gate → near-dup
    *     probe against everything already ingested → DSIR scoring into
    *     `outDir/batch=<id>` → survivors' postings join the index
    *     under `ingest=b<id>`.
    *
    * Running the trio in one trigger (not three chained streams) is
    * what makes the composition exactly-once AS A UNIT: all five
    * writes are batchId-keyed dynamic overwrites under one checkpoint,
    * so an at-least-once replay rewrites every artifact bit-for-bit —
    * three separate streams would need three checkpoints and an
    * intermediate landing table between each pair. Per-trigger cost is
    * the sum of the stages' (all batch-proportional): map-only routing
    * + one tiny report aggregate + map-only scrub + the bucket-pruned
    * probe + the broadcast-model scoring join.
    *
    * `exportable` carries [[attachCurate]]'s drain-export contract
    * (forces in-loop compaction off, validated at attach).
    */
  def attachIngest(rows: DataFrame, idCol: String, textCol: String,
                   checks: Seq[Validate.Check],
                   redactRules: Seq[graft.ops.Redact.Rule],
                   indexPath: String, modelPath: String, outDir: String,
                   quarantineDir: String, reportDir: String,
                   n: Int = 3, threshold: Double = 0.8,
                   nBuckets: Int = 64,
                   maxSegments: Int = ShingleMaxSegments,
                   readerGraceMs: Long = 0L,
                   exportable: Boolean = false): DataStreamWriter[org.apache.spark.sql.Row] = {
    val rowChecks = checks.filterNot(_.isInstanceOf[Validate.Unique])
    require(rowChecks.nonEmpty,
      "the admission stage needs at least one row-level check to route on")
    require(!exportable || maxSegments == ShingleMaxSegments ||
        maxSegments == 0,
      s"attachIngest(exportable = true) forbids in-loop compaction " +
        s"(the attachCurate drain-export contract); got maxSegments = " +
        s"$maxSegments (leave it at the default or pass 0)")
    val effMaxSegments = if (exportable) 0 else maxSegments
    Seq("batch", "reasons", "violations").foreach(c =>
      require(!rows.columns.contains(c),
        s"attachIngest writes column '$c' — rename it in the input " +
          "(it would be silently overwritten)"))
    rows.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions._
      def land(df: DataFrame, dir: String): Unit =
        df.withColumn("batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(dir)
      // 1. ADMIT
      land(Validate.quarantine(batch, rowChecks)
        .withColumn("reasons", concat_ws(",", col("violations")))
        .drop("violations"), quarantineDir)
      land(Validate.report(batch, checks), reportDir)
      val admitted = Validate.clean(batch, rowChecks)
      // 2+3. SCRUB → CURATE: the SAME body attachCurate runs
      // (curateBatch scrubs first, so hashes/shingles/features are
      // computed on scrubbed text) — shared so a gate-threshold or
      // stage-order change can never reach one loop and not the other
      curateBatch(admitted, batchId, idCol, textCol, indexPath,
        modelPath, outDir, n, threshold, nBuckets, effMaxSegments,
        readerGraceMs, redactRules)
    })
  }

  /** Streaming PII SCRUB stage: every micro-batch lands
    * [[graft.ops.Redact.redacted]] rows (text scrubbed in place, a
    * pre-scrub `pii_hits` count) in `outDir/batch=<id>` and the
    * per-rule [[graft.ops.Redact.report]] audit in
    * `reportDir/batch=<id>` — the scrub a production ingest runs
    * between [[attachValidated]]'s admission gate and
    * [[attachCurate]]'s dedup/scoring, so no raw PII span ever
    * reaches the index, the scorer, or a drained export. Same
    * batchId-keyed dynamic-overwrite idempotence contract as every
    * attach* loop; per-trigger cost is one map-only projection plus
    * one single-row aggregate — ∝ batch, never corpus.
    */
  def attachRedacted(rows: DataFrame, textCol: String,
                     rules: Seq[graft.ops.Redact.Rule],
                     outDir: String, reportDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    Seq("batch", "pii_hits").foreach(c =>
      require(!rows.columns.contains(c),
        s"attachRedacted writes column '$c' — rename it in the input " +
          "(it would be silently overwritten)"))
    rows.writeStream.foreachBatch(perTrigger { (batch: DataFrame, batchId: Long) =>
      def land(df: DataFrame, dir: String): Unit =
        df.withColumn("batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch").parquet(dir)
      land(graft.ops.Redact.redacted(batch, textCol, rules), outDir)
      land(graft.ops.Redact.report(batch, textCol, rules), reportDir)
    })
  }
}
