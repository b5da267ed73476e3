package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSimilarity

/** Similarity search over embedding columns (SURVEY.md §2B north-star
  * ops): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the 100 TB path.
  *
  * Scale design: brute force broadcasts the (small) query set against the
  * corpus — a map-only scan, no shuffle of the corpus — and takes top-k
  * with a per-query window. The LSH variant buckets both sides on sign
  * signatures so candidate generation is an equi-join on (band, bucket);
  * cost is proportional to bucket collisions, not |Q|·|C|.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (brute force).
    * Output: qid, nid, score, rn.
    *
    * The ranking key is the cosine floor-quantized to micro-units
    * (BIGINT), NOT `round(cos, 4)`: Spark's round acts on the
    * shortest-decimal RENDERING (BigDecimal HALF_UP) while DuckDB
    * rounds the binary double, so a cosine just under a .00005
    * boundary can emit different keys per engine and flip a top-k
    * rank — the latent hash-flip class KMeansStep documents. floor()
    * on the (bit-identical, sequential-fold) double is engine-exact;
    * the double `score` column is derived from the BIGINT and thus
    * identical too.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    // corpus spread wide: all |Q|·|C| cosine work lands on its partitions
    val c = graft.util.Tables.spread(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")))
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("score_u",
        floor(cosineSimilarity(col("qvec"), col("nvec")) * 1e6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("nid"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("score_u").cast("double") / 1e6).as("score"), col("rn"))
  }

  /** Hard-negative mining: per query, the top-`k` corpus vectors whose
    * cosine lands in [lo, hi) — similar enough to be informative for
    * contrastive training, dissimilar enough to exclude positives and
    * near-duplicates (the [[graft.ops.Sampling.negativeSamples]] draw
    * is the uniform-negative counterpart). Same broadcast-query scan
    * shape as [[bruteForceTopK]]; the band filter runs before the
    * window, so per-query state is the survivors, not the corpus.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, lo: Double, hi: Double): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = graft.util.Tables.spread(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")))
    // band edges and ranking both live in micro-units (see
    // bruteForceTopK for why round() was an engine-portability bug);
    // the [lo, hi) compare is BIGINT vs BIGINT — no double boundary
    // can flip between engines
    val loU = math.round(lo * 1e6)
    val hiU = math.round(hi * 1e6)
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("score_u",
        floor(cosineSimilarity(col("qvec"), col("nvec")) * 1e6))
      .filter(col("score_u") >= loU && col("score_u") < hiU)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("nid"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("score_u").cast("double") / 1e6).as("score"), col("rn"))
  }

  /** Per-band LSH bucket structs `(band, h)` from one packed
    * sign-of-projection signature (graft.functions.HyperplaneSignature —
    * a single native codegen'd dim×bits loop; a per-bit
    * `zip_with`+`aggregate` column stack was interpreted and slower than
    * brute force). Band value = `rows` consecutive signature bits via
    * shiftright/mask.
    */
  def bandBuckets(vec: Column, dim: Int, bits: Int, bands: Int,
                  seed: Long): Column = {
    import graft.functions.HyperplaneSignature
    val rows = bits / bands
    require(rows >= 1 && rows < 64, s"need 1..63 bits per band, got $rows")
    val sig = HyperplaneSignature.hyperplaneSignature(
      vec, HyperplaneSignature.planes(dim, bits, seed))
    val mask = (1L << rows) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * rows).bitwiseAND(lit(mask)).as("h"))
    }: _*)
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus;
    * each vector is assigned to its nearest centroid's inverted list, and
    * a query scores only the `nprobe` lists whose centroids are closest
    * to it — the classic FAISS-style IVF-Flat layout, expressed as
    * DataFrame ops.
    *
    * Scale design: the centroid table is nlist×dim floats (tiny →
    * broadcast); assignment is a map-only `transform`; the probe join is
    * an equi-join on the list id, so the shuffle is ∝ probed postings,
    * not |Q|·|C|. At 100 TB the inverted lists would be written out
    * partitioned by list id so probes prune at the file level. Train on
    * a sample when the corpus outgrows the driver-coordinated fit.
    * Recall < 1 by construction; spec-tested against the exact baseline.
    */
  /** Coarse quantizer fit + corpus assignment shared by the in-memory and
    * persisted IVF paths: returns (assigned `(nid, nvec, list)`, centroid
    * table `(list, cvec)` — nlist rows, broadcast-sized).
    */
  private[ops] def ivfFit(corpus: DataFrame, idCol: String, vecCol: String,
                          nlist: Int, seed: Long, maxFit: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .withColumn("features", array_to_vector(col("nvec").cast("array<double>")))
    // Train the coarse quantizer on a seeded sample of ≤ maxFit vectors:
    // Voronoi cell centers stabilize long before the full corpus is seen,
    // and the KMeans fit is the only driver-coordinated stage — at 100 TB
    // it must NOT scale with the corpus. Assignment of the full corpus is
    // still the map-only model.transform below. The count() is parquet
    // metadata only (no data scan).
    val nCorpus = c.count()
    val fitOn =
      if (nCorpus <= maxFit) c
      else c.sample(withReplacement = false,
        math.min(1.0, maxFit.toDouble * 1.05 / nCorpus), seed)
    // a coarse quantizer only needs rough Voronoi cells — 5 iterations
    // converges the bench recall identically to 10 at half the fit cost,
    // and random init skips k-means||'s extra passes over the sample
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setInitMode("random")
      .fit(fitOn)
    val assigned = model.transform(c)
      .select(col("nid"), col("nvec"), col("prediction").as("list"))
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat)) }.toSeq
      .toDF("list", "cvec")
    (assigned, cents)
  }

  /** Rank the `nprobe` closest inverted lists per query. */
  private[ops] def probeLists(queries: DataFrame, cents: DataFrame, idCol: String,
                              vecCol: String, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cd").desc, col("list"))
    q.crossJoin(broadcast(cents))
      .withColumn("cd", cosineSimilarity(col("qvec"), col("cvec")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("qid", "qvec", "list")
  }

  /** Score probed postings and keep the top k per query (micro-unit
    * ranking key — same contract as [[bruteForceTopK]]).
    */
  private def scoreProbed(assigned: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("nid"))
    assigned.join(broadcast(probes), "list")
      .filter(col("nid") =!= col("qid"))
      .withColumn("score_u",
        floor(cosineSimilarity(col("qvec"), col("nvec")) * 1e6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("score_u").cast("double") / 1e6).as("score"), col("rn"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L, maxFit: Long = 100000L): DataFrame = {
    val (assigned, cents) = ivfFit(corpus, idCol, vecCol, nlist, seed, maxFit)
    scoreProbed(assigned, probeLists(queries, cents, idCol, vecCol, nprobe), k)
  }

  /** Deterministic-quantizer IVF — the hash-oracle-checked twin of
    * [[ivfTopK]], closing the one ANN family that had no checked
    * variant at all. Same IVF shape (coarse quantizer → inverted
    * lists → probe nprobe lists → exact re-rank), but the quantizer is
    * the seedless every-`centroidEvery`-th-vector init (KMeansStep /
    * Pq's SQL-replayable doctrine) instead of an opaque Spark-ML
    * KMeans fit, so DuckDB replays centroids, assignment, probes and
    * ranking verbatim. Assignment and probe ranking both use
    * floor-micro-unit squared L2 (ties → smaller list id — the
    * repo-wide cross-engine contract); final scores are floor-micro
    * cosine like every top-k in this file. Each corpus vector lives in
    * exactly one list and probed lists are distinct, so (qid, nid)
    * candidates are unique by construction — no dedup stage.
    *
    * Scale shape: centroids are n/centroidEvery rows (broadcast);
    * assignment is the broadcast cross product folded by a map-side
    * combinable `min_by` partial agg — the exchange carries ONE row
    * per corpus vector, not the n·k distance rows a window would
    * shuffle; probing broadcasts the query side; scoring touches
    * probed postings only. The production path keeps the fitted
    * quantizer ([[ivfTopK]] — trained cells beat arbitrary ones on
    * recall); this twin is the correctness anchor, same trade as
    * dedup_minhash_md5.
    */
  def ivfTopKDet(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, centroidEvery: Int = 50,
                 nprobe: Int = 4): DataFrame = {
    import graft.functions.SquaredDistance.squaredDistance
    val cents = graft.util.Caches.own(
      corpus.filter(col(idCol) % centroidEvery === 0)
        .select(col(idCol).as("list"), col(vecCol).as("cvec")))
    require(!cents.isEmpty,
      s"ivfTopKDet: no corpus id is congruent 0 mod $centroidEvery — " +
        "the deterministic quantizer is empty and every probe would " +
        "silently return zero neighbors; pick a centroidEvery that " +
        "intersects the id population")
    val assigned = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u",
        floor(squaredDistance(col("nvec"), col("cvec")) * 1e6).cast("long"))
      .groupBy(col("nid"))
      .agg(min_by(struct(col("list"), col("nvec")),
        struct(col("d2_u"), col("list"))).as("__a"))
      .select(col("nid"), col("__a.nvec").as("nvec"), col("__a.list").as("list"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("d2_u"), col("list"))
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u",
        floor(squaredDistance(col("qvec"), col("cvec")) * 1e6).cast("long"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("qid", "qvec", "list")
    scoreProbed(assigned, probes, k)
  }

  private def centroidsPath(indexPath: String) = s"$indexPath/_graft_centroids"

  private def ivfdetParamsSidecar(indexPath: String) =
    s"$indexPath/_graft_ivfdet_params"

  /** The det index's pinned quantizer policy (params doctrine: policy
    * is set ONCE at [[ivfWriteIndexDet]] and never at a rebuild/forget
    * call site — a drifting centroidEvery silently reshapes every
    * list). Missing sidecar = a pre-round-12 layout: rebuild offline
    * with ivfWriteIndexDet.
    */
  private def readIvfDetParams(spark: org.apache.spark.sql.SparkSession,
                               dir: String): Int =
    try spark.read.parquet(ivfdetParamsSidecar(dir))
      .head().getAs[Int]("centroid_every")
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        sys.error(s"det IVF index at $dir has no _graft_ivfdet_params " +
          "sidecar — it predates the pinned-params layout; rebuild it " +
          s"offline with ivfWriteIndexDet (${e.getMessage.linesIterator.next()})")
    }

  /** Persist the IVF index: inverted lists directory-partitioned by list
    * id (`indexPath/list=<i>/…`) plus the nlist-row centroid table in an
    * underscore sidecar (invisible to parquet reads of the index root).
    * This is the 100 TB layout: a probe touches `nprobe/nlist` of the
    * corpus AT THE FILE LEVEL — unprobed lists are never listed, opened,
    * or scanned. One exchange on `list` keeps it to one file per list per
    * write (same small-files discipline as the bucketed CDC sink).
    */
  def ivfWriteIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    indexPath: String, nlist: Int = 16, seed: Long = 42L,
                    maxFit: Long = 100000L): Unit = {
    val (assigned, cents) = ivfFit(corpus, idCol, vecCol, nlist, seed, maxFit)
    assigned.withColumn("ingest", lit("base"))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("ingest", "list").parquet(indexPath)
    cents.coalesce(1).write.mode("overwrite").parquet(centroidsPath(indexPath))
  }

  /** Persist a DETERMINISTIC-quantizer IVF index — [[ivfTopKDet]]'s
    * layout made durable: centroids are the seedless
    * every-`centroidEvery`-th corpus vectors, assignment is the
    * min_by floor-micro-d2 partial agg, and the inverted lists land
    * directory-partitioned under an `ingest=base` level (same probe
    * pruning, same sidecar contract as [[ivfWriteIndex]]). This is the
    * index form whose probes — including probes AFTER appends — replay
    * verbatim in ANSI SQL, so the persisted+appended path stays
    * hash-oracle-checked end to end.
    */
  def ivfWriteIndexDet(corpus: DataFrame, idCol: String, vecCol: String,
                       centroidEvery: Int, indexPath: String): Unit = {
    import graft.functions.SquaredDistance.squaredDistance
    val spark = corpus.sparkSession
    val cents = graft.util.Caches.own(
      corpus.filter(col(idCol) % centroidEvery === 0)
        .select(col(idCol).as("list"), col(vecCol).as("cvec")))
    // loud, not silent: an id slice containing no multiple of
    // centroidEvery writes an empty index whose every later probe
    // returns zero neighbors with no error — the writeCellIndex
    // failure class (the %7-victims-vs-49 modulus trap), guarded here
    // the same way
    require(!cents.isEmpty,
      s"ivfWriteIndexDet: no corpus id is congruent 0 mod " +
        s"$centroidEvery — the deterministic quantizer would be empty " +
        "and the index unusable; pick a centroidEvery that intersects " +
        "the id population")
    corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u",
        floor(squaredDistance(col("nvec"), col("cvec")) * 1e6).cast("long"))
      .groupBy(col("nid"))
      .agg(min_by(struct(col("list"), col("nvec")),
        struct(col("d2_u"), col("list"))).as("__a"))
      .select(col("nid"), col("__a.nvec").as("nvec"), col("__a.list").as("list"))
      .withColumn("ingest", lit("base"))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("ingest", "list").parquet(indexPath)
    cents.select(col("list"), col("cvec"))
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath(indexPath))
    // pin the quantizer policy in-index (params doctrine): rebuilds and
    // forgets re-read it instead of taking it at the call site
    import spark.implicits._
    Seq(Tuple1(centroidEvery)).toDF("centroid_every")
      .coalesce(1).write.mode("overwrite")
      .parquet(ivfdetParamsSidecar(indexPath))
  }

  /** Segment-merge rebuild for the det-quantizer IVF index — identical
    * contract to [[graft.ops.SemDedup.rebuildCellIndex]]: re-absorb
    * every `ingest` segment into a fresh `ingest=base` build with a
    * freshly selected quantizer, behind
    * [[graft.sources.IndexLifecycle]]'s CAS-versioned publish (crash
    * mid-rebuild leaves the old version serving; concurrent appends
    * fence the commit instead of being lost or duplicated).
    */
  def rebuildIvfIndexDet(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String,
                         orphanGraceMs: Long =
                           graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                         readerGraceMs: Long = 0L): Unit =
    graft.sources.IndexLifecycle.rebuild(spark, indexPath,
        orphanGraceMs, readerGraceMs) {
      (src, srcDir, dst) =>
        // quantizer policy comes from the SOURCE dir's sidecar —
        // rebuild call sites can no longer silently retune
        // (ivfWriteIndexDet is the retune path)
        ivfWriteIndexDet(src.select(col("nid"), col("nvec")),
          "nid", "nvec", readIvfDetParams(spark, srcDir), dst)
    }

  private[ops] def ivfDetRebuildClosure(
      spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, String, String) => Unit =
    (kept, srcDir, dst) =>
      ivfWriteIndexDet(kept.select(col("nid"), col("nvec")),
        "nid", "nvec", readIvfDetParams(spark, srcDir), dst)

  /** Append a batch of vectors to a persisted IVF index under its own
    * `ingest=<tag>` partition — the ANN-index analogue of
    * [[graft.ops.SemDedup.appendToCellIndex]] (FAISS `add` for the
    * directory layout). The batch assigns against the index-owned
    * centroid sidecar with the deterministic min_by floor-micro-d2
    * fold; the batchId-keyed dynamic partition overwrite makes
    * at-least-once replay idempotent. Works on both index forms (the
    * sidecar schema is shared); for the seeded [[ivfWriteIndex]] form
    * the appended vectors' list assignment uses the deterministic
    * ranking rather than the ML model's (identical except on exact
    * micro-unit distance ties), and the periodic rebuild re-absorbs
    * the segments and refreshes the quantizer — the same segment-merge
    * maintenance policy as the shingle and cell indexes.
    */
  def ivfAppendToIndex(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, batch: DataFrame,
                       idCol: String, vecCol: String,
                       ingestTag: String): Unit = {
    import graft.functions.SquaredDistance.squaredDistance
    graft.sources.IndexLifecycle.appendSegment(spark, indexPath, ingestTag) {
      (dir, tmp) =>
        // quantizer read from the dir being appended to — a racing
        // rebuild's re-seal assigns against the refreshed centroids
        val cents = spark.read.parquet(centroidsPath(dir))
        batch.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
          .crossJoin(broadcast(cents))
          .withColumn("d2_u",
            floor(squaredDistance(col("nvec"),
              col("cvec").cast("array<float>")) * 1e6).cast("long"))
          .groupBy(col("nid"))
          .agg(min_by(struct(col("list"), col("nvec")),
            struct(col("d2_u"), col("list"))).as("__a"))
          .select(col("nid"), col("__a.nvec").as("nvec"),
            col("__a.list").as("list"))
          .repartition(col("list"))
          .write.mode("overwrite").partitionBy("list").parquet(tmp)
    }
  }

  /** ANN top-k over a persisted IVF index. The probed list ids are
    * collected driver-side — bounded at ≤ nlist ints, NOT a data collect
    * — and pushed as a static partition filter, so the scan's
    * PartitionFilters prune every unprobed `list=` directory before any
    * file is read (asserted in LlmOpsSpec). Same output contract as
    * [[ivfTopK]] given the same quantizer seed.
    */
  def ivfProbeIndex(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val dir = graft.sources.IndexLifecycle.resolveDir(spark, indexPath)
    val cents = spark.read.parquet(centroidsPath(dir))
    val probes = probeLists(queries, cents, idCol, vecCol, nprobe)
    val probed = probes.select("list").distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = spark.read.parquet(dir)
      .filter(col("list").isin(probed: _*))
    scoreProbed(assigned, probes, k)
  }

  /** Probe a persisted DETERMINISTIC index ([[ivfWriteIndexDet]],
    * possibly extended by [[ivfAppendToIndex]] segments): probe
    * ranking is floor-micro squared-L2 ascending (ties → smaller list
    * id), matching [[ivfTopKDet]] — NOT the seeded path's cosine
    * ranking — so the whole persisted probe replays in ANSI SQL. Same
    * bounded driver-side list collect + static partition filter as
    * [[ivfProbeIndex]]; the filter prunes list dirs across ALL ingest
    * segments (the partition tree is `ingest=<tag>/list=<id>`).
    */
  def ivfProbeIndexDet(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, queries: DataFrame,
                       idCol: String, vecCol: String, k: Int,
                       nprobe: Int = 4): DataFrame =
    ivfDetProbe(spark,
      graft.sources.IndexLifecycle.resolveDir(spark, indexPath),
      segments = None, queries, idCol, vecCol, k, nprobe)

  /** [[ivfProbeIndexDet]] PINNED to a retained manifest version — the
    * reproducible-export read for the ANN-retrieval family, the same
    * contract as [[graft.ops.Dedup.jaccardAgainstIndexAt]]: the probe
    * targets version `v`'s data dir restricted to the segment set its
    * marker recorded, so the searched corpus (and the quantizer — the
    * centroid sidecar lives in the pinned dir, untouched by appends)
    * is exactly what the export that recorded `v` saw. Fails loudly
    * outside the retention window; forgotten vectors stay forgotten.
    * This closes the TrainExport coverage gap for recipes whose
    * retrieval is ANN.
    */
  def ivfProbeIndexDetAt(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, version: Long,
                         queries: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         nprobe: Int = 4): DataFrame = {
    import org.apache.hadoop.fs.Path
    val m = graft.sources.IndexLifecycle.manifestAt(spark, indexPath, version)
    ivfDetProbe(spark, new Path(new Path(indexPath), m.dir).toString,
      segments = Some(m.segments), queries, idCol, vecCol, k, nprobe)
  }

  private def ivfDetProbe(spark: org.apache.spark.sql.SparkSession,
                          dir: String, segments: Option[Seq[String]],
                          queries: DataFrame,
                          idCol: String, vecCol: String, k: Int,
                          nprobe: Int): DataFrame = {
    import graft.functions.SquaredDistance.squaredDistance
    val cents = spark.read.parquet(centroidsPath(dir))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("d2_u"), col("list"))
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u",
        floor(squaredDistance(col("qvec"), col("cvec")) * 1e6).cast("long"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("qid", "qvec", "list")
    val probed = probes.select("list").distinct()
      .collect().map(_.getLong(0)).toSeq
    val assignedAll = spark.read.parquet(dir)
      .filter(col("list").isin(probed: _*))
    // pinned reads restrict to the segment set version v's marker
    // recorded — appends sealed after the pin share the dir but not
    // the manifest (see jaccardProbe)
    val assigned = segments.fold(assignedAll)(segs =>
      assignedAll.filter(col("ingest").isin(segs: _*)))
    scoreProbed(assigned, probes, k)
  }

  /** LSH ANN: same output shape as bruteForceTopK but only scoring
    * candidates that share at least one signature band with the query.
    * Recall < 1 by construction; spec-tested against the exact baseline.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int,
              bits: Int = 32, bands: Int = 8, seed: Long = 42L): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec),
        explode(bandBuckets(col(vec), dim, bits, bands, seed)).as("bk"))
    val qb = withBuckets(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qid", "qvec")
    val cb = withBuckets(
      corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nid", "nvec")
    // score before dedup — re-scoring a candidate once per shared band
    // is ~dim flops in the native kernel; a distinct() carrying both
    // vectors would shuffle 2×dim floats per candidate instead.
    val joined = cb.as("c").join(broadcast(qb.as("q")),
        col("c.bk") === col("q.bk") && col("c.nid") =!= col("q.qid"))
      .select(col("q.qid").as("qid"), col("c.nid").as("nid"),
        floor(cosineSimilarity(col("q.qvec"), col("c.nvec")) * 1e6).as("score_u"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("nid"))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("score_u").cast("double") / 1e6).as("score"), col("rn"))
  }

  /** md5-twin hyperplane LSH ANN — the hash-oracle-checked variant of
    * [[lshTopK]], completing the md5-twin doctrine for the last ANN
    * family that had only a rows-only form. Hyperplane signs are a
    * pure function of (salt, band, bit, dim) via md5 parity (the
    * [[Embeddings.randomProject]] derivation), projections are exact
    * BIGINT sums over micro-unit components (a sign flip at the ≥ 0
    * boundary is impossible cross-engine: both sides compare the SAME
    * integer), band buckets are the `bits`-bit sign words, and
    * candidates sharing any band are re-ranked by exact floor-micro
    * cosine. DuckDB replays hyperplanes, projections, buckets and the
    * ranking verbatim.
    *
    * Scale shape: signatures are one posexplode + a broadcast
    * (bands·bits)-row hyperplane id frame + one partial-agg'd groupBy
    * (integer sums combine map-side); the candidate join is an
    * equi-join on (band, bucket); re-rank touches candidates only.
    * The production path stays [[lshTopK]] (xxhash-seeded, one codegen
    * pass per vector); this twin costs ~bands·bits md5 calls per
    * component and exists for the oracle, same trade as
    * dedup_minhash_md5.
    */
  def lshTopKMd5(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, bits: Int = 4, bands: Int = 8,
                 dim: Int = 64, salt: String = "lshm"): DataFrame = {
    val spark = corpus.sparkSession
    // the sign table is (bands·bits·dim) rows of pure metadata —
    // evaluate the md5 parity ONCE here and broadcast, instead of
    // re-hashing inside the n·dim·(bands·bits) projection rows (the
    // first cut did exactly that and md5 dominated its bench time)
    val signs = spark.range(bands).toDF("b")
      .crossJoin(spark.range(bits).toDF("t"))
      .crossJoin(spark.range(dim).toDF("dim"))
      .withColumn("s", when(
        conv(substring(md5(concat_ws(":", lit(salt), col("b"), col("t"),
          col("dim"))), 1, 8), 16, 10).cast("long") % 2 === 0,
        lit(1L)).otherwise(lit(-1L)))
    def buckets(df: DataFrame, id: String): DataFrame =
      df.select(col(id),
          posexplode(col(vecCol)).as(Seq("dim", "__x")))
        .join(broadcast(signs), "dim")
        .groupBy(col(id), col("b"), col("t"))
        .agg(sum(col("s") * floor(col("__x").cast("double") * 1e6).cast("long"))
          .as("__p"))
        .groupBy(col(id), col("b"))
        .agg(sum(when(col("__p") >= 0,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(t AS INT))"))
          .otherwise(lit(0L))).as("bucket"))
    val qb = buckets(queries.select(col(idCol).as("qid"), col(vecCol)), "qid")
    val cb = buckets(corpus.select(col(idCol).as("nid"), col(vecCol)), "nid")
    val cand = cb.join(broadcast(qb),
        cb("b") === qb("b") && cb("bucket") === qb("bucket") &&
          col("nid") =!= col("qid"))
      .select(col("qid"), col("nid")).distinct()
    val qv = queries.select(col(idCol).as("__qi"), col(vecCol).as("__qv"))
    val nv = corpus.select(col(idCol).as("__ni"), col(vecCol).as("__nv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("nid"))
    cand.join(nv, col("nid") === col("__ni"))
      .join(broadcast(qv), col("qid") === col("__qi"))
      .withColumn("score_u",
        floor(cosineSimilarity(col("__qv"), col("__nv")) * 1e6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("score_u").cast("double") / 1e6).as("score"), col("rn"))
  }
}
