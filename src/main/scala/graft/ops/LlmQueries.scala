package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Driver registry for the LLM-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal) over the `documents`
  * and `embeddings` tables.
  *
  * Oracle notes: cosine is recomputed in DuckDB with explicit
  * per-element DOUBLE casts (list_sum is sequential) so scores are
  * bit-identical to the native CosineSimilarity kernel; DuckDB's own
  * list_cosine_similarity accumulates in float32 and drifts ~1e-7.
  * MinHash-LSH and SimHash are approximate-by-construction → rows-only
  * here, recall-tested in DedupSpec.
  */
object LlmQueries {

  /** Document-frequency cap for shingle postings — mirrored between the
    * Spark side (Dedup.invertedIndex maxDf broadcast anti-join) and the
    * oracle's hot/ANTI JOIN CTE. 5 is active on the sf0.01 corpus (max
    * df there is 7) while keeping every genuine near-dup pair.
    */
  private val shingleMaxDf = 5

  /** DuckDB rendering of Dedup.md5Hash32 / the md5-derived 32-bit token
    * hash: first 8 hex chars of md5($e) as a BIGINT via the per-char
    * polynomial (DuckDB has no conv()).
    */
  private def duckHex32(e: String): String =
    "CAST(list_sum(list_transform(range(8), k -> " +
      s"CAST(strpos('0123456789abcdef', md5($e)[1+k]) - 1 AS BIGINT) " +
      "* (1::BIGINT << CAST(4*(7-k) AS INT)))) AS BIGINT)"

  /** Sampling.hashOrder60's DuckDB rendering: md5 hex chars 1-8 and
    * 9-16 as two 32-bit words fused hi·2²⁸ + (lo mod 2²⁸).
    */
  private def duckHex60(e: String): String = {
    def word(off: Int) =
      "CAST(list_sum(list_transform(range(8), k -> " +
        s"CAST(strpos('0123456789abcdef', md5($e)[$off+k]) - 1 AS BIGINT) " +
        "* (1::BIGINT << CAST(4*(7-k) AS INT)))) AS BIGINT)"
    s"(${word(1)} * 268435456 + ${word(9)} % 268435456)"
  }

  /** One persisted IVF index per dataset dir per JVM. In production the
    * index is a long-lived table built by an offline job; here the
    * memoization is what keeps `sim_ann_ivf_indexed` measuring the probe
    * path (its point) instead of re-paying the build per invocation.
    * Cached dirs are deleted on JVM exit.
    */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val ivfCleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      ivfIndexCache.values.forEach { idx =>
        val root = java.nio.file.Paths.get(idx).getParent
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator.asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } catch { case _: java.io.IOException => () } // best-effort
      }
    }))
  }

  /** One persisted shingle index per dataset dir per JVM (the corpus
    * side of incremental dedup, built by an "offline job" once) — same
    * memoize-and-cleanup story as the IVF index: the registered query
    * times the PROBE path, which is what runs per ingest.
    */
  private val shingleIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def shingleIndexFor(datasetDir: String,
                              corpus: org.apache.spark.sql.DataFrame): String = {
    ivfCleanupHook
    shingleIndexCache.computeIfAbsent(datasetDir, _ => {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_shingle_idx").toString + "/index"
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      ivfIndexCache.put(s"shingle:$datasetDir", idx) // reuse the cleanup walk
      idx
    })
  }

  /** One full StreamingDedup run per dataset dir per JVM: offline base
    * index (doc_id%10≠0), then two deterministic MemoryStream
    * micro-batches (%20==0, %20==10) through the foreachBatch
    * probe-then-append loop. Memoized like the shingle/IVF indexes —
    * the stream is a fixture; per-trigger economics are benched by
    * `dedup_incremental_indexed` and raced/replayed in CdcStreamSpec.
    * Returns the pairs output directory.
    */
  private val streamingDedupCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def streamingDedupPairsFor(s: org.apache.spark.sql.SparkSession,
                                     datasetDir: String): String = {
    ivfCleanupHook
    streamingDedupCache.computeIfAbsent(datasetDir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_sdedup_q").toString
      val idx = root + "/index"
      val pairs = root + "/pairs"
      val docs = Tables(s, datasetDir, "documents")
      Dedup.writeShingleIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, idx, maxDf = shingleMaxDf)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.attach(
          input.toDS().toDF("doc_id", "text"), "doc_id", "text",
          idx, pairs, n = 3, threshold = 0.8)
        .option("checkpointLocation", root + "/ckpt")
        .start()
      try {
        // this collect is the MemoryStream TRANSPORT harness, not the
        // operator: a real deployment's batches arrive via
        // readStream (FileTopic/Kafka) and never touch the driver;
        // the probe-then-append loop itself is fully distributed
        def slice(m: Int) = docs.filter(col("doc_id") % 20 === m)
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
      ivfIndexCache.put(s"sdedup:$datasetDir", pairs) // reuse cleanup walk
      pairs
    })
  }

  /** Streaming-curation fixture: offline shingle index + DSIR model
    * over the %10≠0 corpus, then two MemoryStream batches (%20==0,
    * %20==10) through [[graft.streaming.StreamingDedup.attachCurate]].
    * Memoized per dataset dir — the registered query times the curated
    * OUTPUT read; each stage's per-batch cost is benched by its own
    * query (text_repetition, dedup_incremental_indexed,
    * sample_importance_incremental).
    */
  private def streamingCurateFor(s: org.apache.spark.sql.SparkSession,
                                 datasetDir: String): String = {
    ivfCleanupHook
    streamingDedupCache.computeIfAbsent(s"curate:$datasetDir", _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_scurate").toString
      val idx = root + "/index"
      val model = root + "/model"
      val out = root + "/out"
      val docs = Tables(s, datasetDir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      Dsir.writeModel(corpus.filter(col("doc_id") % 7 =!= 0),
        corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text", model)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.attachCurate(
          input.toDS().toDF("doc_id", "text"), "doc_id", "text",
          idx, model, out, n = 3, threshold = 0.8)
        .option("checkpointLocation", root + "/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect — see
        // streamingDedupPairsFor's note
        def slice(m: Int) = docs.filter(col("doc_id") % 20 === m)
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
      ivfIndexCache.put(s"scurate:$datasetDir", out) // reuse cleanup walk
      out
    })
  }

  /** Streaming MULTIMODAL curation fixture — the attachCurate fixture
    * plus the phash image canon ([[graft.streaming.StreamingDedup
    * .attachCurateMm]]): offline shingle index + DSIR model over the
    * %10≠0 corpus, an offline PHASH index over a corpus slice chosen so
    * the image canon visibly bites (see the predicate comment), then
    * the same two MemoryStream batches. Memoized per dataset dir via
    * TempFixtures (throwing builds neither cache nor leak).
    */
  private def streamingCurateMmFor(s: org.apache.spark.sql.SparkSession,
                                   datasetDir: String): String =
    graft.util.TempFixtures.dir(s"scuratemm:$datasetDir") { root =>
      val idx = s"$root/shingle"
      val ph = s"$root/phash"
      val model = s"$root/model"
      val out = s"$root/out"
      val docs = Tables(s, datasetDir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      // Phash population: the synthetic planted copies are id%10==7
      // (exact pixel copy of id−7) and id%10==8 (near copy of id−8) —
      // id−7/id−8 are ≡0 (mod 10), i.e. EXACTLY the streaming batch
      // ids, so indexing every planted copy would image-drop the whole
      // stream and indexing none would make the canon vacuous. Keep
      // the exact copies only for id≡27 (mod 40): half of batch 0
      // (ids ≡20 mod 40) has a pre-existing perceptual duplicate and
      // is cut by the image canon even though its TEXT is unique —
      // the cut the text-only loop cannot make — while the other half
      // and batch 1 pass through it.
      val phPop = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 10 =!= 8 &&
        (col("doc_id") % 10 =!= 7 || col("doc_id") % 40 === 27))
      // maxDist=1 (2 bands of 28 bits), NOT the pairs queries' 3: the
      // synthetic gradient corpus is low-entropy enough that hamming≤3
      // coincidences between UNRELATED images starve the fixture (one
      // survivor at sf0.01); at ≤1 the canon still catches the planted
      // exact copies while unrelated images pass
      Multimodal.writePhashIndex(Multimodal.asPhashImageTable(phPop), ph,
        maxDist = 1, nBuckets = 16)
      Dsir.writeModel(corpus.filter(col("doc_id") % 7 =!= 0),
        corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text", model)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.attachCurateMm(
          input.toDS().toDF("doc_id", "text"), "doc_id", "text",
          images = b => Multimodal.asPhashImageTable(b),
          indexPath = idx, phashIndexPath = ph, modelPath = model,
          outDir = out, n = 3, threshold = 0.8, maxDist = 1,
          phashBuckets = 16)
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect — see
        // streamingDedupPairsFor's note
        def slice(m: Int) = docs.filter(col("doc_id") % 20 === m)
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
    }

  /** The near-dup cluster table `sample_split_leakage_safe` joins
    * against, built once per dataset dir per JVM and persisted. In
    * production the cluster assignment is the caller's EXISTING dedup
    * artifact (the same CC output dedup_clusters materializes), not
    * something the split recomputes per run — memoizing keeps the
    * registered query timing the split operator itself (read the
    * cluster table + one broadcast join + a map), which is what runs
    * per split at 100 TB.
    */
  private val clusterTableCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dedupClustersFor(s: org.apache.spark.sql.SparkSession,
                               datasetDir: String): String = {
    ivfCleanupHook
    clusterTableCache.computeIfAbsent(datasetDir, _ => {
      val p = java.nio.file.Files
        .createTempDirectory("graft_clusters").toString + "/clusters"
      val docs = Tables(s, datasetDir, "documents")
      Cluster.dedupClusters(
          Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
            threshold = 0.8, maxDf = shingleMaxDf).select("i", "j"))
        .write.mode("overwrite").parquet(p)
      ivfIndexCache.put(s"clusters:$datasetDir", p) // reuse cleanup walk
      p
    })
  }

  /** Base labeling + new-edge batch for `dedup_clusters_incremental`,
    * built once per dataset dir per JVM. In production BOTH inputs are
    * existing artifacts: the labeling is the corpus's maintained
    * cluster table and the new edges are the streaming probe's output
    * ([[graft.streaming.StreamingDedup]]) — the merge never re-derives
    * either. Memoizing keeps the registered query timing the
    * label-merge operator (read two tables + frontier contraction),
    * which is the per-ingest steady-state cost.
    */
  private val incCcCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def incCcFixtureFor(s: org.apache.spark.sql.SparkSession,
                              datasetDir: String): String = {
    ivfCleanupHook
    incCcCache.computeIfAbsent(datasetDir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_inc_cc").toString
      val docs = Tables(s, datasetDir, "documents")
      val all = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = shingleMaxDf)
        .select("i", "j")
        .transform(t => graft.util.Caches.own(t))
      val isBatch = (c: org.apache.spark.sql.Column) => c % 10 === 0
      Cluster.connectedComponents(
          all.filter(!isBatch(col("i")) && !isBatch(col("j"))))
        .write.mode("overwrite").parquet(s"$root/labels")
      all.filter(isBatch(col("i")) || isBatch(col("j")))
        .write.mode("overwrite").parquet(s"$root/new_pairs")
      ivfIndexCache.put(s"inccc:$datasetDir", s"$root/labels") // cleanup walk
      root
    })
  }

  /** Shared DuckDB replay of asPhashImageTable + dhash56 + the 4×14-bit
    * banding: `bands(id, h, b, v)` regenerated entirely from the
    * closed-form synthetic pixels (eid remap + the one-pixel tweak).
    */
  /** The closed-form dHash/band replay, parameterized by the banding
    * (`maxDist + 1` bands of `56 / (maxDist + 1)` bits — the pigeonhole
    * contract [[graft.ops.Multimodal.phashBandsOf]] implements).
    */
  private def phashBandsCteFor(maxDist: Int): String = {
    val nBands = maxDist + 1
    val bandBits = 56 / nBands
    phashBandsCteRaw
      .replace("BANDBITS", bandBits.toString)
      .replace("BANDMASK", ((1L << bandBits) - 1).toString)
      .replace("NBANDS", nBands.toString)
  }

  private val phashBandsCteRaw =
    """WITH ids AS (
      SELECT doc_id AS id,
        CASE WHEN doc_id % 10 = 7 THEN doc_id - 7
             WHEN doc_id % 10 = 8 THEN doc_id - 8
             ELSE doc_id END AS eid,
        doc_id % 10 = 8 AS tweak
      FROM documents),
    dims AS (SELECT id, eid, tweak,
        8 + eid % 9 AS w, 8 + eid % 7 AS h FROM ids),
    grid AS (
      SELECT id, eid, tweak, w, h, gx.x AS x, gy.y AS y,
        (gx.x * w) // 8 AS sx, (gy.y * h) // 8 AS sy
      FROM dims,
        LATERAL (SELECT unnest(range(8)) AS x) gx,
        LATERAL (SELECT unnest(range(8)) AS y) gy),
    gray AS (
      SELECT id, x, y,
        CASE WHEN tweak AND sx = (2 * w) // 8 AND sy = (3 * h) // 8
          THEN 765
          ELSE (7*eid + 3*sx + 5*sy) % 256 + (11*eid + sx + 2*sy) % 256
               + (13*eid + 3*sx + sy) % 256
        END AS g
      FROM grid),
    bits AS (
      SELECT a.id,
        CAST(sum(CASE WHEN a.g < b.g
          THEN 1::BIGINT << CAST(a.y * 7 + a.x AS INT)
          ELSE 0 END) AS BIGINT) AS h
      FROM gray a JOIN gray b ON a.id = b.id AND a.y = b.y
        AND b.x = a.x + 1
      WHERE a.x < 7
      GROUP BY a.id),
    bands AS (
      SELECT id, h, t.b AS b,
        (h >> CAST(BANDBITS * t.b AS INT)) & BANDMASK AS v
      FROM bits, LATERAL (SELECT unnest(range(NBANDS)) AS b) t)"""

  private val phashBandsCte = phashBandsCteFor(3)

  /** One persisted phash index per dataset dir per JVM — the offline
    * image-index build, same memoize-and-cleanup story as the
    * shingle/cell/IVF indexes: the registered query times the PROBE.
    */
  private val phashIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def phashIndexFor(s: org.apache.spark.sql.SparkSession,
                            datasetDir: String): String = {
    ivfCleanupHook
    phashIndexCache.computeIfAbsent(datasetDir, _ => {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_phash_idx").toString + "/index"
      Multimodal.writePhashIndex(
        Multimodal.asPhashImageTable(Tables(s, datasetDir, "documents"))
          .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8),
        idx)
      ivfIndexCache.put(s"phash:$datasetDir", idx) // cleanup walk
      idx
    })
  }

  private def ivfIndexFor(datasetDir: String,
                          emb: org.apache.spark.sql.DataFrame): String = {
    ivfCleanupHook
    ivfIndexCache.computeIfAbsent(datasetDir, _ => {
      val idx = java.nio.file.Files
        .createTempDirectory("graft_ivf_idx").toString + "/index"
      Similarity.ivfWriteIndex(emb, "vec_id", "embedding", idx, maxFit = 500L)
      idx
    })
  }

  private val shingleCte =
    s"""WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS i)),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > $shingleMaxDf),
      |sh AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s)),
      |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)""".stripMargin

  /** Shared replay of the DSIR weight pipeline (target = doc_id%7==0,
    * 256 buckets, salt "dsir"): hashed unigram+bigram features,
    * dense-spine Laplace-smoothed bucket log-probs floored to
    * micro-nats per corpus, per-doc exact integer sum of the ratios.
    * `rawPred` picks the model's raw-side slice; `scorePred` the docs
    * actually scored (they differ in the incremental variant, where
    * the batch is scored against a model fitted WITHOUT it).
    */
  private def dsirCte(rawPred: String, scorePred: String) =
    s"""WITH tkl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |uni AS (SELECT doc_id, unnest(t) AS g FROM tkl),
      |bi AS (
      |  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
      |  FROM tkl, LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i)),
      |feats AS (
      |  SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
      |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
      |tf AS (SELECT bk, count(*) AS c FROM feats WHERE doc_id % 7 = 0 GROUP BY 1),
      |rf AS (SELECT bk, count(*) AS c FROM feats WHERE $rawPred GROUP BY 1),
      |tt AS (SELECT count(*) AS n FROM feats WHERE doc_id % 7 = 0),
      |rt AS (SELECT count(*) AS n FROM feats WHERE $rawPred),
      |lr AS (
      |  SELECT sp.bk,
      |    CAST(floor(ln((COALESCE(tf.c, 0) + 1)::DOUBLE / (tt.n + 256)) * 1e6) AS BIGINT)
      |    - CAST(floor(ln((COALESCE(rf.c, 0) + 1)::DOUBLE / (rt.n + 256)) * 1e6) AS BIGINT)
      |      AS lr_u
      |  FROM range(256) sp(bk) LEFT JOIN tf USING (bk) LEFT JOIN rf USING (bk), tt, rt),
      |w AS (
      |  SELECT f.doc_id, CAST(count(*) AS INT) AS n_feats,
      |    CAST(sum(lr.lr_u) AS BIGINT) AS logw_u
      |  FROM feats f JOIN lr USING (bk)
      |  WHERE $scorePred GROUP BY 1)""".stripMargin

  private val dsirWeightsCte =
    dsirCte("doc_id % 7 <> 0", "f.doc_id % 7 <> 0")

  /** One persisted DSIR model per dataset dir per JVM (the offline fit
    * over target=%7==0 / already-ingested raw=%7≠0∧%10≠0) — same
    * memoize-and-cleanup story as the shingle/cell indexes: the
    * registered query times the per-batch SCORING path, which is what
    * runs per ingest at 100 TB.
    */
  private val dsirModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dsirModelFor(s: org.apache.spark.sql.SparkSession,
                           datasetDir: String): String = {
    ivfCleanupHook
    dsirModelCache.computeIfAbsent(datasetDir, _ => {
      val p = java.nio.file.Files
        .createTempDirectory("graft_dsir_model").toString + "/model"
      val docs = Tables(s, datasetDir, "documents")
      Dsir.writeModel(
        docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", p)
      ivfIndexCache.put(s"dsir:$datasetDir", p) // reuse cleanup walk
      p
    })
  }

  private val sqlCos =
    """list_sum(list_transform(list_zip(q.embedding, v.embedding),
      |   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      | / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |  * sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
      .stripMargin

  private val sqlCosAb = sqlCos.replace("q.embedding", "a.embedding")
    .replace("v.embedding", "b.embedding")

  val queries: Seq[GQuery] = Seq(

    GQuery("dedup_exact",
      (s, d) => Dedup.exact(Tables(s, d, "documents"), "doc_id", "text")
        .orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        COUNT(*) AS dup_cnt FROM documents GROUP BY text ORDER BY content_hash""")),

    GQuery("dedup_jaccard",
      (s, d) => Dedup.jaccardPairs(Tables(s, d, "documents"),
          "doc_id", "text", n = 3, threshold = 0.8, maxDf = shingleMaxDf)
        .orderBy(col("i"), col("j")),
      Some(s"""$shingleCte,
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j)
        SELECT i, j, CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS jaccard FROM jac
        WHERE jc >= 0.8 ORDER BY i, j""")),

    // Cross-source duplication matrix: near-dup pairs labeled by the
    // (unordered) source pair they straddle — the diagnostic that tells
    // a curation run WHICH feeds copy each other (mirror sites, scraped
    // re-posts) vs merely duplicating internally, i.e. where dedup
    // budget and crawl exclusions should go. Pairs are the already
    // candidate-bounded jaccard set; each label fetch is an equi-join
    // against the doc→source map (pairs ≪ corpus, AQE broadcasts the
    // pair side); one partial-agg'd count per source pair.
    GQuery("dedup_source_overlap",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
          threshold = 0.8, maxDf = shingleMaxDf)
        val m = docs.select(col("doc_id"), col("source"))
        pairs
          .join(m.select(col("doc_id").as("__i"), col("source").as("ga")),
            col("i") === col("__i"))
          .join(m.select(col("doc_id").as("__j"), col("source").as("gb")),
            col("j") === col("__j"))
          .select(least(col("ga"), col("gb")).as("src_a"),
            greatest(col("ga"), col("gb")).as("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_a", "src_b")
      },
      Some(s"""$shingleCte,
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j),
        sel AS (SELECT i, j FROM jac WHERE jc >= 0.8),
        lab AS (
          SELECT least(da.source, db.source) AS src_a,
                 greatest(da.source, db.source) AS src_b
          FROM sel
          JOIN documents da ON da.doc_id = sel.i
          JOIN documents db ON db.doc_id = sel.j)
        SELECT src_a, src_b, count(*) AS n_pairs FROM lab
        GROUP BY src_a, src_b ORDER BY src_a, src_b""")),

    // LSH candidates verified by exact Jaccard — approximate recall, so
    // rows-only (DedupSpec measures recall vs dedup_jaccard).
    GQuery("dedup_minhash_lsh",
      (s, d) => Dedup.minhashLsh(Tables(s, d, "documents"),
          "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.8,
          maxDf = shingleMaxDf)
        .orderBy(col("i"), col("j")),
      None),

    GQuery("dedup_simhash",
      (s, d) => Dedup.simhashPairs(Tables(s, d, "documents"),
          "doc_id", "text", maxDist = 3)
        .orderBy(col("i"), col("j")),
      None),

    // md5-twin of dedup_minhash_lsh: permutation hash = first 8 md5 hex
    // chars, band key = comma-joined signature string — every stage
    // (signatures → bands → candidate join → exact-Jaccard verify) is
    // replayed verbatim by the oracle, so the LSH pipeline itself is
    // hash-checked, not just recall-tested.
    GQuery("dedup_minhash_md5",
      (s, d) => Dedup.minhashLshPortable(Tables(s, d, "documents"),
          "doc_id", "text", n = 3, k = 16, bands = 4, threshold = 0.8,
          maxDf = shingleMaxDf)
        .orderBy(col("i"), col("j")),
      Some(s"""$shingleCte,
        sigs AS (
          SELECT doc_id, i, min(${duckHex32("i::VARCHAR || ' ' || s")}) AS sig
          FROM sh, range(16) r(i) GROUP BY doc_id, i),
        bnd AS (
          SELECT doc_id, i // 4 AS band,
                 string_agg(sig::VARCHAR, ',' ORDER BY i) AS bv
          FROM sigs GROUP BY doc_id, i // 4),
        cands AS (
          SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
        pairs AS (
          SELECT c.i, c.j, count(*) AS common
          FROM cands c
          JOIN sh sa ON sa.doc_id = c.i
          JOIN sh sb ON sb.doc_id = c.j AND sb.s = sa.s
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j)
        SELECT i, j, CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS jaccard FROM jac
        WHERE jc >= 0.8 ORDER BY i, j""")),

    // md5-twin of dedup_simhash: 32-bit fingerprints from md5-hashed
    // tokens; pigeonhole bands (4 × 8 bits for maxDist 3) and popcount
    // verify replayed exactly in the oracle.
    GQuery("dedup_simhash_md5",
      (s, d) => Dedup.simhashPairsPortable(Tables(s, d, "documents"),
          "doc_id", "text", maxDist = 3)
        .orderBy(col("i"), col("j")),
      Some(s"""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
          FROM documents),
        h AS (SELECT doc_id, ${duckHex32("t")} AS h FROM toks),
        bitsums AS (
          SELECT doc_id, b,
                 sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS c
          FROM h, range(32) r(b) GROUP BY doc_id, b),
        sims AS (
          SELECT doc_id,
                 sum(CASE WHEN c > 0 THEN (1::BIGINT << CAST(b AS INT))
                     ELSE 0::BIGINT END) AS sh
          FROM bitsums GROUP BY doc_id),
        bnd AS (
          SELECT doc_id, sh, c AS band, (sh >> CAST(c * 8 AS INT)) & 255 AS v
          FROM sims, range(4) r(c)),
        cands AS (
          SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
                 a.sh AS si, b.sh AS sj
          FROM bnd a JOIN bnd b
            ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id)
        SELECT i, j, CAST(bit_count(xor(si, sj)) AS INT) AS dist
        FROM cands WHERE bit_count(xor(si, sj)) <= 3 ORDER BY i, j""")),

    // Incremental-ingest dedup: the doc_id%10 "new batch" joined against
    // the rest of the corpus only — batch×corpus postings, never
    // corpus×corpus. The oracle restricts the same pair join by the
    // same predicate.
    GQuery("dedup_incremental",
      (s, d) => Dedup.jaccardAgainstCorpus(Tables(s, d, "documents"),
          "doc_id", "text", n = 3, threshold = 0.8,
          newPred = _ % 10 === 0, maxDf = shingleMaxDf)
        .orderBy(col("i"), col("j")),
      Some(s"""$shingleCte,
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b
            ON a.s = b.s AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j)
        SELECT i, j, CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS jaccard FROM jac
        WHERE jc >= 0.8 ORDER BY i, j""")),

    // Containment near-dup: |A∩B| / min(|A|,|B|) — catches the
    // short-doc-quoted-inside-long-doc redundancy Jaccard structurally
    // misses (score ⊇ jaccard at equal threshold; 0.9 keeps it a
    // distinct, tighter family on this corpus).
    GQuery("dedup_containment",
      (s, d) => Dedup.containmentPairs(Tables(s, d, "documents"),
          "doc_id", "text", n = 3, threshold = 0.9, maxDf = shingleMaxDf)
        .orderBy(col("i"), col("j")),
      Some(s"""$shingleCte,
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        cm AS (
          SELECT i, j, common::DOUBLE / least(ca.n, cb.n) AS c
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j)
        SELECT i, j, CAST(CAST(floor(c * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS containment
        FROM cm WHERE c >= 0.9 ORDER BY i, j""")),

    // Bloom-prefiltered incremental EXACT dedup: the runtime-filter
    // rendering — definitely-new batch docs short-circuit past the
    // confirm join (no false negatives), only the maybe slice joins.
    // Output is exact, so the oracle is the plain anti-join semantics
    // with no bloom internals to replay.
    GQuery("dedup_incremental_bloom",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dedup.exactNewViaBloom(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text")
          .orderBy(col("content_hash"))
      },
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
          COUNT(*) AS dup_cnt
        FROM documents b WHERE doc_id % 10 = 0
          AND NOT EXISTS (SELECT 1 FROM documents c
                          WHERE c.doc_id % 10 <> 0 AND c.text = b.text)
        GROUP BY text ORDER BY content_hash""")),

    // The PERSISTED-index form of incremental dedup: corpus postings
    // pre-shingled and df-capped at index-build time (offline job,
    // memoized per JVM), batch shingled live and filtered by the
    // INDEX's persisted hot list (the index is the source of truth for
    // "too common" — a 10%-sized batch's local dfs are meaningless),
    // probe = equi-join against the index with bucket ids pushed as a
    // partition filter. The oracle replays the corpus-side cap applied
    // to BOTH sides.
    GQuery("dedup_incremental_indexed",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val idx = shingleIndexFor(d, docs.filter(col("doc_id") % 10 =!= 0))
        Dedup.jaccardAgainstIndex(s, idx,
            docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", n = 3, threshold = 0.8)
          .orderBy(col("i"), col("j"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        sh0 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
          FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS i)),
        bat0 AS (SELECT * FROM sh0 WHERE doc_id % 10 = 0),
        cor0 AS (SELECT * FROM sh0 WHERE doc_id % 10 <> 0),
        chot AS (SELECT s FROM cor0 GROUP BY s HAVING count(*) > $shingleMaxDf),
        bat AS (SELECT bat0.* FROM bat0 ANTI JOIN chot USING (s)),
        cor AS (SELECT cor0.* FROM cor0 ANTI JOIN chot USING (s)),
        bcnt AS (SELECT doc_id, count(*) AS n FROM bat GROUP BY 1),
        ccnt AS (SELECT doc_id, count(*) AS n FROM cor GROUP BY 1),
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM bat a JOIN cor b ON a.s = b.s
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN bcnt ca ON ca.doc_id = i JOIN ccnt cb ON cb.doc_id = j)
        SELECT i, j, CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS jaccard
        FROM jac WHERE jc >= 0.8 ORDER BY i, j""")),

    // Pairwise near-dup verdicts → per-document cluster assignment +
    // canonical-member choice (connected components via hash-min label
    // propagation — ops/Cluster.scala). The oracle closes the same pair
    // set with a recursive CTE and must agree on every (doc, cluster,
    // keep) row, so the iterative Spark propagation is hash-checked
    // against a declarative transitive closure.
    GQuery("dedup_clusters",
      (s, d) => Cluster.dedupClusters(
          Dedup.jaccardPairs(Tables(s, d, "documents"), "doc_id", "text",
            n = 3, threshold = 0.8, maxDf = shingleMaxDf).select("i", "j"))
        .orderBy(col("doc_id")),
      Some(s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j),
        e0 AS (SELECT i, j FROM jac WHERE jc >= 0.8),
        e AS (SELECT i AS a, j AS b FROM e0 UNION SELECT j, i FROM e0),
        reach(node, r) AS (
          SELECT a, b FROM e
          UNION
          SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a)
        SELECT node AS doc_id, least(node, min(r)) AS cluster,
               CAST(least(node, min(r)) = node AS INT) AS keep
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // INCREMENTAL clustering: the historical corpus (doc_id%10≠0) is
    // labeled once, then the batch's pairs (any pair touching a
    // %10==0 doc) merge into that labeling via
    // Cluster.incrementalComponents — untouched components pass
    // through an anti-join, only the merge frontier enters the
    // contraction loop. The output must be BYTE-IDENTICAL to the
    // one-shot clustering of all pairs, so the oracle is exactly
    // dedup_clusters' recursive CTE — the strongest possible check
    // that the incremental path loses nothing.
    GQuery("dedup_clusters_incremental",
      (s, d) => {
        // base labels + probe edges are MEMOIZED per dataset dir
        // (incCcFixtureFor): in production both are existing artifacts
        // — the maintained cluster table and the streaming probe's
        // pairs — so the query times the label-merge itself.
        val root = incCcFixtureFor(s, d)
        Cluster.incrementalComponents(
            s.read.parquet(s"$root/labels"),
            s.read.parquet(s"$root/new_pairs"))
          .select(col("node").as("doc_id"), col("cluster"),
            (col("node") === col("cluster")).cast("int").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j),
        e0 AS (SELECT i, j FROM jac WHERE jc >= 0.8),
        e AS (SELECT i AS a, j AS b FROM e0 UNION SELECT j, i FROM e0),
        reach(node, r) AS (
          SELECT a, b FROM e
          UNION
          SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a)
        SELECT node AS doc_id, least(node, min(r)) AS cluster,
               CAST(least(node, min(r)) = node AS INT) AS keep
        FROM reach GROUP BY node ORDER BY doc_id""")),

    // Canonical selection: clustering only GROUPS duplicates; curation
    // keeps the cleanest member of each group and drops the rest. Per
    // cluster, argmax of the Gopher-style quality score on a
    // floor-quantized micro-unit key (id tiebreak) — the oracle replays
    // clustering (recursive CTE), the quality formula, and the argmax.
    GQuery("dedup_keep_best",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Cluster.keepBest(
            Cluster.dedupClusters(
              Dedup.jaccardPairs(docs, "doc_id", "text",
                n = 3, threshold = 0.8, maxDf = shingleMaxDf)
                .select("i", "j")),
            TextAnalysis.quality(docs, "text"),
            "doc_id", "quality_score")
          .orderBy(col("cluster"))
      },
      Some(s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j),
        e0 AS (SELECT i, j FROM jac WHERE jc >= 0.8),
        e AS (SELECT i AS a, j AS b FROM e0 UNION SELECT j, i FROM e0),
        reach(node, r) AS (
          SELECT a, b FROM e
          UNION
          SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a),
        cl AS (SELECT node AS doc_id, least(node, min(r)) AS cluster
          FROM reach GROUP BY node),
        qr AS (SELECT doc_id, length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents),
        q AS (SELECT doc_id,
          (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) AS qs
          FROM qr),
        scored AS (SELECT cl.cluster, cl.doc_id,
            CAST(floor(q.qs * 1e6) AS BIGINT) AS qu
          FROM cl JOIN q USING (doc_id)),
        r AS (SELECT cluster, doc_id, qu,
            row_number() OVER (PARTITION BY cluster
              ORDER BY qu DESC NULLS LAST, doc_id) AS rn,
            count(*) OVER (PARTITION BY cluster) AS n_members
          FROM scored)
        SELECT cluster, doc_id AS best_id, CAST(qu AS DOUBLE) / 1e6 AS best_quality,
          CAST(n_members AS BIGINT) AS n_members
        FROM r WHERE rn = 1 ORDER BY cluster""")),

    // Embedding-cosine near-dup, exact all-pairs (oracle-checked). The
    // 0.4 threshold is tuned to this synthetic corpus (near-orthogonal
    // vectors, max pairwise cosine ≈ 0.6) so the result is non-trivial;
    // real near-dup corpora would use ≥ 0.9.
    GQuery("dedup_embedding",
      (s, d) => Dedup.embeddingPairs(Tables(s, d, "embeddings"),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy(col("i"), col("j")),
      Some(s"""SELECT i, j, CAST(cos_u AS DOUBLE) / 1e6 AS cos FROM (
          SELECT a.vec_id AS i, b.vec_id AS j,
            CAST(floor(${sqlCosAb} * 1e6) AS BIGINT) AS cos_u
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        WHERE cos_u >= 400000 ORDER BY i, j""")),

    // LSH-blocked variant at a realistic near-dup threshold (0.9): the
    // 8×8-bit bands admit ~2.5% of random pairs as candidates, so the
    // scan is bucket-join-bounded, not n². Approximate recall →
    // rows-only; LlmOpsSpec proves recall on planted near-duplicates.
    GQuery("dedup_embedding_lsh",
      (s, d) => Dedup.embeddingPairsLsh(Tables(s, d, "embeddings"),
          "vec_id", "embedding", dim = 64, threshold = 0.9)
        .orderBy(col("i"), col("j")),
      None),

    // Embedding-batch quality audit: per-source centroid (exact
    // fixed-point component means) and mean cosine-to-centroid — a
    // corrupted or mis-normalized embedding batch shows up as low
    // coherence for its source. Scale shape: per-(source, dim)
    // micro-unit sums partial-agg off one posexplode (no vector ever
    // shuffles whole), the centroid table is source-cardinality
    // (bounded enum → broadcast), the scoring pass is map-only. All
    // folds sequential-per-row → the oracle replays them bit-exactly.
    GQuery("embed_source_coherence",
      (s, d) => {
        val docs = Tables(s, d, "documents").select(col("doc_id"), col("source"))
        val emb = Tables(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val j = docs.join(emb, col("doc_id") === col("vec_id"))
          .select(col("source"), col("embedding"))
        val comp = j
          .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("source", "dim")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("x").cast("double") * 1e6).cast("long")).as("su"))
        val cent = comp.groupBy("source")
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("su"),
              col("n")))),
            st => st("su").cast("double") / (st("n") * 1e6)).as("cvec"))
        def sq(a: org.apache.spark.sql.Column) = aggregate(a, lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
        val dot = aggregate(zip_with(col("embedding"), col("cvec"),
            (x, y) => x.cast("double") * y), lit(0.0), (acc, e) => acc + e)
        j.join(broadcast(cent), "source")
          .withColumn("c",
            dot / (sqrt(sq(col("embedding"))) * sqrt(sq(col("cvec")))))
          .groupBy("source")
          .agg(count(lit(1)).as("n_vecs"),
            (sum(floor(col("c") * 1e6).cast("long")).cast("double") /
              (count(lit(1)) * 1e6)).as("mean_cos"))
          .orderBy("source")
      },
      Some("""WITH j AS (
          SELECT d.source, e.embedding
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        comp AS (
          SELECT source, dim, count(*) AS n,
            SUM(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS su
          FROM (SELECT source, generate_subscripts(embedding, 1) - 1 AS dim,
                       unnest(embedding) AS x
                FROM j)
          GROUP BY source, dim),
        cent AS (
          SELECT source, list(CAST(su AS DOUBLE) / (n * 1e6) ORDER BY dim) AS cvec
          FROM comp GROUP BY source),
        cosr AS (
          SELECT j.source,
            list_sum(list_transform(list_zip(j.embedding, cent.cvec),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(j.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(cent.cvec, x -> x * x)))) AS c
          FROM j JOIN cent USING (source))
        SELECT source, count(*) AS n_vecs,
          CAST(SUM(CAST(floor(c * 1e6) AS BIGINT)) AS DOUBLE)
            / (count(*) * 1e6) AS mean_cos
        FROM cosr GROUP BY source ORDER BY source""")),

    // Embedding hygiene, L2 normalization: component / ||v|| — the
    // precondition FAISS-style cosine≡dot search assumes. Map-only;
    // exploded scalar rows so the oracle hashes raw bit-exact doubles
    // (sequential fold, one sqrt, one division — both engines agree).
    // The %25 subset keeps the dump row count civilized.
    GQuery("embed_normalize_l2",
      (s, d) => Embeddings.normalizeL2(
          Tables(s, d, "embeddings").filter(col("vec_id") % 25 === 0),
          "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim")),
      Some("""SELECT vec_id, CAST(g.i - 1 AS INT) AS dim,
          CASE WHEN nrm = 0.0 THEN 0.0
               ELSE CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) / nrm
          END AS x_n
        FROM (
          SELECT vec_id, embedding,
            sqrt(list_reduce(list_prepend(0.0::DOUBLE,
              list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
              (acc, x) -> acc + x)) AS nrm
          FROM embeddings WHERE vec_id % 25 = 0),
          LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
        ORDER BY vec_id, dim""")),

    // Embedding hygiene, mean-centering (anisotropy removal): exact
    // fixed-point per-dimension means (micro-unit BIGINT sums, the
    // k-means update contract) broadcast onto a map-only subtract.
    GQuery("embed_center",
      (s, d) => Embeddings.center(
          Tables(s, d, "embeddings").filter(col("vec_id") % 25 === 0),
          "vec_id", "embedding")
        .orderBy(col("vec_id"), col("dim")),
      Some("""WITH sub AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
        comp AS (
          SELECT CAST(g.i - 1 AS INT) AS dim,
            CAST(SUM(CAST(floor(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * 1e6)
              AS BIGINT)) AS DOUBLE) / (count(*) * 1e6) AS mean
          FROM sub,
            LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
          GROUP BY 1)
        SELECT vec_id, CAST(g.i - 1 AS INT) AS dim,
          CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) - comp.mean AS x_c
        FROM sub,
          LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
        JOIN comp ON comp.dim = CAST(g.i - 1 AS INT)
        ORDER BY vec_id, dim""")),

    // Johnson–Lindenstrauss ±1 random projection 64 → 16 dims
    // (Embeddings.randomProject): the sign matrix is regenerated
    // cell-by-cell from md5(salt:j:dim) in BOTH engines — no seed
    // state — and each output component is an exact BIGINT sum of
    // sign·floor(x·1e6) terms, so the dense projection is fully
    // hash-oracle-checked. Distance preservation is property-tested
    // in LlmOpsSpec.
    GQuery("embed_random_projection",
      (s, d) => Embeddings.randomProject(
          Tables(s, d, "embeddings").filter(col("vec_id") % 25 === 0),
          "vec_id", "embedding", kOut = 16, salt = "jl")
        .orderBy(col("vec_id"), col("j")),
      Some(s"""WITH sub AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0)
        SELECT vec_id, j, CAST(su AS DOUBLE) / (1e6 * sqrt(16.0)) AS x_p
        FROM (
          SELECT vec_id, j,
            SUM((CASE WHEN ${duckHex32("'jl:' || j || ':' || (g.i - 1)")} % 2 = 0
                 THEN 1 ELSE -1 END)
              * CAST(floor(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * 1e6)
                  AS BIGINT)) AS su
          FROM sub,
            LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g,
            (SELECT unnest(range(16)) AS j)
          GROUP BY vec_id, j)
        ORDER BY vec_id, j""")),

    GQuery("sim_topk_bruteforce",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.bruteForceTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 10)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""SELECT qid, nid, CAST(score_u AS DOUBLE) / 1e6 AS score, rn FROM (
          SELECT q.vec_id AS qid, v.vec_id AS nid,
            CAST(floor($sqlCos * 1e6) AS BIGINT) AS score_u,
            CAST(row_number() OVER (PARTITION BY q.vec_id
              ORDER BY CAST(floor($sqlCos * 1e6) AS BIGINT) DESC NULLS LAST,
                       v.vec_id) AS INT) AS rn
          FROM embeddings q, embeddings v
          WHERE q.vec_id % 100 = 0 AND v.vec_id <> q.vec_id)
        WHERE rn <= 10 ORDER BY qid, rn""")),

    // int8-quantized brute-force top-k (ops/Quantize.scala): 4×-smaller
    // codes, exact integer dot products — the quantize → dot → top-k
    // pipeline replayed bit-for-bit by the oracle (floor-based
    // round-half-up and integer sums are engine-portable; the float
    // cosine's seeded/approximate cousins are rows-only). Recall vs the
    // float baseline is spec-tested in LlmOpsSpec.
    GQuery("sim_topk_int8",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Quantize.int8TopK(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 10)
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        val score = """CAST(floor(
            CAST(list_sum(list_transform(list_zip(q.q, v.q), p -> p[1]*p[2])) AS DOUBLE)
            / (sqrt(CAST(q.nn AS DOUBLE)) * sqrt(CAST(v.nn AS DOUBLE))) * 1e6) AS BIGINT)"""
        s"""WITH qv AS (
          SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nn
          FROM (
            SELECT vec_id,
              CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0::BIGINT)
                   ELSE list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) / (mx / 127) + 0.5) AS BIGINT)) END AS q
            FROM (SELECT vec_id, embedding,
                    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
                  FROM embeddings)))
        SELECT qid, nid, CAST(score_u AS DOUBLE) / 1e6 AS score, rn FROM (
          SELECT q.vec_id AS qid, v.vec_id AS nid, $score AS score_u,
            CAST(row_number() OVER (PARTITION BY q.vec_id
              ORDER BY $score DESC NULLS LAST, v.vec_id) AS INT) AS rn
          FROM qv q, qv v
          WHERE q.vec_id % 100 = 0 AND v.vec_id <> q.vec_id)
        WHERE rn <= 10 ORDER BY qid, rn"""
      }),

    GQuery("sim_ann_lsh",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.lshTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
            dim = 64, k = 10)
          .orderBy(col("qid"), col("rn"))
      },
      None),

    // md5-twin hyperplane LSH (Similarity.lshTopKMd5): the
    // hash-oracle-checked variant — md5-parity hyperplane signs,
    // exact BIGINT sign projections, bit-word band buckets, exact
    // floor-micro cosine re-rank. DuckDB replays the whole pipeline,
    // turning the last rows-only ANN family into a checked one (the
    // production path stays the seeded sim_ann_lsh above).
    GQuery("sim_ann_lsh_md5",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.lshTopKMd5(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
            k = 10, bits = 4, bands = 8)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH hp AS (
          SELECT b.b, t.t, d.dim,
            CASE WHEN (${duckHex32("'lshm:' || b.b || ':' || t.t || ':' || d.dim")})
              % 2 = 0 THEN 1 ELSE -1 END AS s
          FROM range(8) b(b), range(4) t(t), range(64) d(dim)),
        m AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS xq
          FROM embeddings),
        proj AS (
          SELECT m.vec_id, hp.b, hp.t, CAST(SUM(hp.s * m.xq) AS BIGINT) AS p
          FROM m JOIN hp USING (dim) GROUP BY 1, 2, 3),
        buck AS (
          SELECT vec_id, b,
            CAST(SUM(CASE WHEN p >= 0 THEN (1::BIGINT << CAST(t AS INT))
              ELSE 0 END) AS BIGINT) AS bucket
          FROM proj GROUP BY 1, 2),
        qb AS (SELECT * FROM buck WHERE vec_id % 100 = 0),
        cand AS (
          SELECT DISTINCT qb.vec_id AS qid, buck.vec_id AS nid
          FROM qb JOIN buck ON qb.b = buck.b AND qb.bucket = buck.bucket
            AND buck.vec_id <> qb.vec_id),
        sc AS (
          SELECT qid, nid,
            CAST(floor((${sqlCos.replace("q.embedding", "x.embedding")
              .replace("v.embedding", "y.embedding")}) * 1e6) AS BIGINT) AS cos_u
          FROM cand JOIN embeddings x ON x.vec_id = cand.qid
                    JOIN embeddings y ON y.vec_id = cand.nid)
        SELECT qid, nid, CAST(cos_u AS DOUBLE) / 1e6 AS score, rn FROM (
          SELECT qid, nid, cos_u,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos_u DESC NULLS LAST, nid) AS INT) AS rn
          FROM sc)
        WHERE rn <= 10 ORDER BY qid, rn""")),

    // IVF-Flat ANN (k-means coarse quantizer, nprobe lists searched).
    // Approximate → rows-only; recall vs brute force in LlmOpsSpec.
    // maxFit=500 keeps the quantizer fit on a bounded seeded sample at
    // every scale factor (live at sf0.1's 2000 vectors) — the fit must
    // never scale with the corpus.
    GQuery("sim_ann_ivf",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.ivfTopK(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
            k = 10, maxFit = 500L)
          .orderBy(col("qid"), col("rn"))
      },
      None),

    // Same quantizer/probes as sim_ann_ivf, but through the PERSISTED
    // index: inverted lists written partitionBy("list"), probes pushed as
    // a static partition filter so unprobed list dirs are never opened
    // (the 100 TB layout; PartitionFilters plan-asserted in LlmOpsSpec).
    // The index is built ONCE per (session, dataset dir) and reused —
    // repeated bench/verify invocations time the probe path the name
    // promises, not index build, and /tmp doesn't accumulate a dir per
    // run (the cached dirs are removed on JVM exit).
    // Approximate → rows-only; result ≡ sim_ann_ivf is spec-asserted.
    GQuery("sim_ann_ivf_indexed",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val idx = ivfIndexFor(d, emb)
        Similarity.ivfProbeIndex(s, idx,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 10)
          .orderBy(col("qid"), col("rn"))
      },
      None),

    // Deterministic-quantizer IVF (Similarity.ivfTopKDet): the
    // hash-oracle-checked twin of the Spark-ML-fitted pair above —
    // centroids are the seedless every-50th-vector init, assignment
    // and probe ranking are floor-micro squared-L2 (ties → smaller
    // list), scores floor-micro cosine. DuckDB replays the whole
    // quantize→probe→re-rank pipeline, so the IVF family (previously
    // the last ANN group with NO checked variant) now has its anchor;
    // production keeps the fitted quantizer for recall.
    GQuery("sim_ann_ivf_det",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.ivfTopKDet(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
            k = 10, centroidEvery = 50, nprobe = 4)
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        val d2vc = """list_sum(list_transform(list_zip(v.embedding, c.embedding), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        val d2qc = d2vc.replace("v.embedding", "q.embedding")
        s"""WITH cents AS (
            SELECT vec_id AS list, embedding FROM embeddings WHERE vec_id % 50 = 0),
          a AS (
            SELECT vec_id AS nid, list FROM (
              SELECT v.vec_id, c.list,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY CAST(floor($d2vc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.list) AS rn
              FROM embeddings v, cents c) t WHERE rn = 1),
          p AS (
            SELECT qid, list FROM (
              SELECT q.vec_id AS qid, c.list,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY CAST(floor($d2qc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.list) AS rn
              FROM embeddings q, cents c WHERE q.vec_id % 100 = 0) t
            WHERE rn <= 4),
          sc AS (
            SELECT p.qid, a.nid,
              CAST(floor((${sqlCos.replace("q.embedding", "x.embedding")
                .replace("v.embedding", "y.embedding")}) * 1e6) AS BIGINT) AS score_u
            FROM p JOIN a USING (list)
              JOIN embeddings x ON x.vec_id = p.qid
              JOIN embeddings y ON y.vec_id = a.nid
            WHERE a.nid <> p.qid)
          SELECT qid, nid, CAST(score_u AS DOUBLE) / 1e6 AS score, rn FROM (
            SELECT qid, nid, score_u,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY score_u DESC NULLS LAST, nid) AS INT) AS rn
            FROM sc)
          WHERE rn <= 10 ORDER BY qid, rn"""
      }),

    // Persisted det-quantizer IVF index + APPEND, probed end to end:
    // base index over the vec_id%10≠0 corpus (centroidEvery=49 — the
    // %50 init would select zero ids in this slice), one appended
    // ingest segment (%20==0, FAISS `add` for the directory layout),
    // then %20==10 queries probe base ∪ appended with the partition
    // filter pruning list dirs across BOTH segments. The quantizer,
    // both assignments, d2-ranked probes and the cosine re-rank all
    // replay in DuckDB — the persisted+appended ANN path's
    // hash-oracle anchor (its seeded twin sim_ann_ivf_indexed stays
    // rows-only). Fixture memoized per dataset dir; the registered
    // query times the probe, which is the per-search production cost.
    GQuery("sim_ann_ivf_det_append",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        ivfCleanupHook
        val idx = ivfIndexCache.computeIfAbsent(s"ivfdetapp:$d", _ => {
          val p = java.nio.file.Files
            .createTempDirectory("graft_ivf_det_app").toString + "/index"
          Similarity.ivfWriteIndexDet(emb.filter(col("vec_id") % 10 =!= 0),
            "vec_id", "embedding", centroidEvery = 49, indexPath = p)
          Similarity.ivfAppendToIndex(s, p,
            emb.filter(col("vec_id") % 20 === 0),
            "vec_id", "embedding", ingestTag = "b0")
          p
        })
        Similarity.ivfProbeIndexDet(s, idx,
            emb.filter(col("vec_id") % 20 === 10), "vec_id", "embedding",
            k = 10, nprobe = 4)
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        val d2vc = """list_sum(list_transform(list_zip(v.embedding, c.embedding), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        val d2qc = d2vc.replace("v.embedding", "q.embedding")
        s"""WITH cents AS (
            SELECT vec_id AS list, embedding FROM embeddings
            WHERE vec_id % 10 <> 0 AND vec_id % 49 = 0),
          pop AS (
            SELECT * FROM embeddings
            WHERE vec_id % 10 <> 0 OR vec_id % 20 = 0),
          a AS (
            SELECT vec_id AS nid, list FROM (
              SELECT v.vec_id, c.list,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY CAST(floor($d2vc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.list) AS rn
              FROM pop v, cents c) t WHERE rn = 1),
          p AS (
            SELECT qid, list FROM (
              SELECT q.vec_id AS qid, c.list,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY CAST(floor($d2qc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.list) AS rn
              FROM embeddings q, cents c WHERE q.vec_id % 20 = 10) t
            WHERE rn <= 4),
          sc AS (
            SELECT p.qid, a.nid,
              CAST(floor((${sqlCos.replace("q.embedding", "x.embedding")
                .replace("v.embedding", "y.embedding")}) * 1e6) AS BIGINT) AS score_u
            FROM p JOIN a USING (list)
              JOIN embeddings x ON x.vec_id = p.qid
              JOIN embeddings y ON y.vec_id = a.nid
            WHERE a.nid <> p.qid)
          SELECT qid, nid, CAST(score_u AS DOUBLE) / 1e6 AS score, rn FROM (
            SELECT qid, nid, score_u,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY score_u DESC NULLS LAST, nid) AS INT) AS rn
            FROM sc)
          WHERE rn <= 10 ORDER BY qid, rn"""
      }),

    // IVF-PQ (ops/Pq.scala): the FAISS production composition — IVF
    // list pruning (nprobe/nlist of the corpus touched) × PQ codes
    // (32× less bytes per touched row). Rows-only like its IVF parent
    // (Spark-ML KMeans fit is not SQL-replayable); recall is
    // spec-tested, and sim_ann_pq below is the oracle-checked flat twin.
    GQuery("sim_ann_ivfpq",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Pq.ivfPqTopK(emb, emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4,
          m = 8, subDim = 8, centroidEvery = 50, maxFit = 500L)
          .orderBy(col("qid"), col("rn"))
      },
      None),

    // IVF-PQ with the DETERMINISTIC coarse quantizer
    // (Pq.ivfPqTopKDet): the composition anchor the seeded production
    // form above lacks — sim_ann_ivf_det proved the coarse stage and
    // sim_ann_pq the ADC stage, but their END-TO-END composition
    // (coarse assign → probe prune → ADC over only the probed lists)
    // had recall specs only. Here DuckDB replays the whole chain:
    // every-50th coarse centroids, floor-micro-d2 min assignment
    // (ties → smaller list), (d2, list)-ranked nprobe=4 probes,
    // every-50th PQ codebook, argmin codes, exact BIGINT ADC sums,
    // (ad2, nid) ranking.
    GQuery("sim_ann_ivfpq_det",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Pq.ivfPqTopKDet(emb, emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 10, coarseEvery = 50, nprobe = 4,
          m = 8, subDim = 8, centroidEvery = 50)
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        val d2vc = """list_sum(list_transform(list_zip(v.embedding, c.embedding), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        val d2qc = d2vc.replace("v.embedding", "q.embedding")
        val subD2 = """list_sum(list_transform(list_zip(s.sv, c.cv), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        s"""WITH cents AS (
            SELECT vec_id AS list, embedding FROM embeddings WHERE vec_id % 50 = 0),
          a AS (
            SELECT vec_id AS nid, list FROM (
              SELECT v.vec_id, c.list,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY CAST(floor($d2vc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.list) AS rn
              FROM embeddings v, cents c) t WHERE rn = 1),
          p AS (
            SELECT qid, list FROM (
              SELECT q.vec_id AS qid, c.list,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY CAST(floor($d2qc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.list) AS rn
              FROM embeddings q, cents c WHERE q.vec_id % 100 = 0) t
            WHERE rn <= 4),
          sub AS (
            SELECT vec_id, j, list_slice(embedding, j*8 + 1, j*8 + 8) AS sv
            FROM embeddings, (SELECT unnest(range(8)) AS j)),
          cbk AS (
            SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id % 50 = 0),
          d2 AS (
            SELECT s.vec_id, s.j, c.c,
              CAST(floor($subD2 * 1e6) AS BIGINT) AS du
            FROM sub s JOIN cbk c ON s.j = c.j),
          codes AS (
            SELECT vec_id AS nid, j, c AS code FROM (
              SELECT vec_id, j, c,
                row_number() OVER (PARTITION BY vec_id, j
                  ORDER BY du ASC NULLS LAST, c) AS rn
              FROM d2) WHERE rn = 1),
          lut AS (
            SELECT vec_id AS qid, j, c, du FROM d2 WHERE vec_id % 100 = 0),
          cand AS (
            SELECT p.qid, a.nid FROM p JOIN a USING (list)
            WHERE a.nid <> p.qid),
          sc AS (
            SELECT cand.qid, cand.nid, CAST(SUM(du) AS BIGINT) AS ad2_u
            FROM cand
              JOIN codes ON codes.nid = cand.nid
              JOIN lut ON lut.qid = cand.qid AND lut.j = codes.j
                AND lut.c = codes.code
            GROUP BY 1, 2)
          SELECT qid, nid, CAST(ad2_u AS DOUBLE) / 1e6 AS ad2, rn FROM (
            SELECT qid, nid, ad2_u,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY ad2_u ASC NULLS LAST, nid) AS INT) AS rn
            FROM sc)
          WHERE rn <= 10 ORDER BY qid, rn"""
      }),

    // Product quantization ANN (ops/Pq.scala): 32× code compression +
    // ADC top-k. Fully ORACLE-CHECKED, unlike the Spark-ML-backed IVF
    // pair: the codebook is the seedless every-50th-vector sample
    // (KMeansStep's init), assignment is argmin over floor-micro-unit
    // distances (ties → lowest codeword), ADC scores are exact BIGINT
    // sums — DuckDB replays codebook, codes, LUT and ranking verbatim.
    GQuery("sim_ann_pq",
      (s, d) => Pq.adcTopK(Tables(s, d, "embeddings"),
          "vec_id", "embedding", m = 8, subDim = 8, centroidEvery = 50,
          probePred = _ % 100 === 0, k = 10)
        .orderBy(col("qid"), col("rn")),
      Some {
        val subD2 = """list_sum(list_transform(list_zip(s.sv, c.cv), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        s"""WITH sub AS (
            SELECT vec_id, j, list_slice(embedding, j*8 + 1, j*8 + 8) AS sv
            FROM embeddings, (SELECT unnest(range(8)) AS j)),
          cents AS (
            SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id % 50 = 0),
          d2 AS (
            SELECT s.vec_id, s.j, c.c,
              CAST(floor($subD2 * 1e6) AS BIGINT) AS du
            FROM sub s JOIN cents c ON s.j = c.j),
          codes AS (
            SELECT vec_id AS nid, j, c AS code FROM (
              SELECT vec_id, j, c,
                row_number() OVER (PARTITION BY vec_id, j
                  ORDER BY du ASC NULLS LAST, c) AS rn
              FROM d2) WHERE rn = 1),
          lut AS (
            SELECT vec_id AS qid, j, c, du FROM d2 WHERE vec_id % 100 = 0),
          sc AS (
            SELECT qid, nid, SUM(du) AS ad2_u
            FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.c
            WHERE nid <> qid GROUP BY qid, nid)
          SELECT qid, nid, CAST(ad2_u AS DOUBLE) / 1e6 AS ad2, rn FROM (
            SELECT qid, nid, ad2_u,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY ad2_u ASC NULLS LAST, nid) AS INT) AS rn
            FROM sc)
          WHERE rn <= 10 ORDER BY qid, rn"""
      }),

    // PQ + exact refine (the production FAISS recall fix): ADC top-40
    // candidates per probe, exact squared-L2 re-rank of those raw
    // vectors only, keep top 10. The refine stage touches
    // |probes|·refine·k rows — the only post-encode full-vector reads
    // are per-candidate. Same oracle chain as sim_ann_pq plus two CTEs.
    GQuery("sim_ann_pq_refine",
      (s, d) => Pq.adcTopKRefined(Tables(s, d, "embeddings"),
          "vec_id", "embedding", m = 8, subDim = 8, centroidEvery = 50,
          probePred = _ % 100 === 0, k = 10, refine = 4)
        .orderBy(col("qid"), col("rn")),
      Some {
        val subD2 = """list_sum(list_transform(list_zip(s.sv, c.cv), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        val fullD2 = """list_sum(list_transform(list_zip(q.embedding, x.embedding), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        s"""WITH sub AS (
            SELECT vec_id, j, list_slice(embedding, j*8 + 1, j*8 + 8) AS sv
            FROM embeddings, (SELECT unnest(range(8)) AS j)),
          cents AS (
            SELECT vec_id AS c, j, sv AS cv FROM sub WHERE vec_id % 50 = 0),
          d2 AS (
            SELECT s.vec_id, s.j, c.c,
              CAST(floor($subD2 * 1e6) AS BIGINT) AS du
            FROM sub s JOIN cents c ON s.j = c.j),
          codes AS (
            SELECT vec_id AS nid, j, c AS code FROM (
              SELECT vec_id, j, c,
                row_number() OVER (PARTITION BY vec_id, j
                  ORDER BY du ASC NULLS LAST, c) AS rn
              FROM d2) WHERE rn = 1),
          lut AS (
            SELECT vec_id AS qid, j, c, du FROM d2 WHERE vec_id % 100 = 0),
          sc AS (
            SELECT qid, nid, SUM(du) AS ad2_u
            FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.c
            WHERE nid <> qid GROUP BY qid, nid),
          cand AS (
            SELECT qid, nid FROM (
              SELECT qid, nid,
                row_number() OVER (PARTITION BY qid
                  ORDER BY ad2_u ASC NULLS LAST, nid) AS arn
              FROM sc) WHERE arn <= 40),
          ex AS (
            SELECT cand.qid, cand.nid,
              CAST(floor($fullD2 * 1e6) AS BIGINT) AS d2_u
            FROM cand JOIN embeddings q ON q.vec_id = cand.qid
                      JOIN embeddings x ON x.vec_id = cand.nid)
          SELECT qid, nid, CAST(d2_u AS DOUBLE) / 1e6 AS d2, rn FROM (
            SELECT qid, nid, d2_u,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY d2_u ASC NULLS LAST, nid) AS INT) AS rn
            FROM ex)
          WHERE rn <= 10 ORDER BY qid, rn"""
      }),

    // Concat-and-chunk sequence packing (GPT-style pretraining layout):
    // per-shard prefix sums assign every document a start offset and
    // ctx-window; shards (md5-derived, portable) are the parallelism
    // knob — no global serial pass. Oracle replays shard, offset and
    // window assignment exactly.
    GQuery("pack_sequences",
      (s, d) => Packing.concatChunk(Tables(s, d, "documents"), "doc_id",
          size(TextAnalysis.tokens(col("text"))), ctx = 512, shards = 8)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("start_off"), col("bin"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
          CAST((${duckHex32("'pack:' || doc_id")} % 10000) % 8 AS INT) AS shard
        FROM documents),
        c AS (SELECT doc_id, shard, n_tokens,
          CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_off
        FROM t)
        SELECT doc_id, shard, n_tokens, start_off,
          CAST(floor(start_off / 512.0) AS BIGINT) AS bin
        FROM c ORDER BY doc_id""")),

    // Length-bucketed batching accounting (the no-concat batch layout
    // finetuning/inference uses): width-16 buckets, per-bucket padding
    // waste at the bucket-ceiling pad, waste ratio in floor-micro
    // units. Map + one partial-agg'd groupBy on ~max_len/width keys.
    GQuery("pack_length_buckets",
      (s, d) => Packing.lengthBuckets(Tables(s, d, "documents"), "doc_id",
          size(TextAnalysis.tokens(col("text"))), width = 16)
        .orderBy(col("bucket")),
      Some("""WITH t AS (
          SELECT greatest(CAST(len(list_filter(string_split(text, ' '),
            x -> x <> '')) AS BIGINT), 1) AS n
          FROM documents),
        b AS (
          SELECT CAST(floor((n - 1) / 16.0) AS BIGINT) AS bucket,
            count(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS sum_tokens
          FROM t GROUP BY 1)
        SELECT bucket, n_docs, sum_tokens,
          CAST((bucket + 1) * 16 * n_docs AS BIGINT) AS padded_tokens,
          CAST(floor((CAST((bucket + 1) * 16 * n_docs AS BIGINT) - sum_tokens)
            * 1e6 / ((bucket + 1) * 16 * n_docs)) AS BIGINT) AS waste_u
        FROM b ORDER BY bucket""")),

    // Packing-efficiency readout: documents started and tokens begun
    // per ctx-window.
    GQuery("pack_bin_stats",
      (s, d) => Packing.binStats(
          Packing.concatChunk(Tables(s, d, "documents"), "doc_id",
            size(TextAnalysis.tokens(col("text"))), ctx = 512, shards = 8),
          ctx = 512)
        .orderBy(col("shard"), col("bin")),
      Some(s"""WITH t AS (SELECT doc_id,
          CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
          CAST((${duckHex32("'pack:' || doc_id")} % 10000) % 8 AS INT) AS shard
        FROM documents),
        c AS (SELECT doc_id, shard, n_tokens,
          CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_off
        FROM t)
        SELECT shard, CAST(floor(start_off / 512.0) AS BIGINT) AS bin,
          COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_started
        FROM c GROUP BY shard, bin ORDER BY shard, bin""")),

    // Deterministic train/valid/test assignment (80/10/10): a pure
    // function of doc_id, so reruns, repartitions and corpus growth
    // never move a document between splits (rand()-based sampling has
    // none of those properties). Map-side only; oracle replays the md5
    // bucket exactly.
    GQuery("sample_hash_split",
      (s, d) => Sampling.hashSplit(Tables(s, d, "documents"), "doc_id",
          "graft", Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
        CASE WHEN ${duckHex32("'graft:' || doc_id")} % 10000 < 8000 THEN 'train'
             WHEN ${duckHex32("'graft:' || doc_id")} % 10000 < 9000 THEN 'valid'
             ELSE 'test' END AS split
        FROM documents ORDER BY doc_id""")),

    // Deterministic uniform contrastive negatives: 4 per anchor, a pure
    // function of (doc_id, j, salt) over the dense id domain, self-
    // collisions bumped to the next id. The oracle replays the md5 draw
    // and the bump exactly; the payload-fetch equi-join is the shape a
    // training job pays anyway.
    GQuery("sample_negatives",
      (s, d) => Sampling.negativeSamples(Tables(s, d, "documents"),
          "doc_id", k = 4, salt = "neg")
        .orderBy(col("anchor"), col("j")),
      Some(s"""WITH c AS (SELECT count(*) AS n FROM documents),
        cand AS (
          SELECT doc_id AS anchor, js.j AS j,
            ${duckHex32("'neg:' || doc_id || ':' || js.j")} % c.n AS h, c.n AS n
          FROM documents, c, LATERAL (SELECT unnest(range(4)) AS j) js)
        SELECT anchor, CAST(j AS INT) AS j,
          CASE WHEN h = anchor THEN (h + 1) % n ELSE h END AS neg_id
        FROM cand ORDER BY anchor, j""")),

    // Hard negatives for contrastive training: top-5 corpus vectors per
    // query in the cosine band [0.15, 0.40) — informative but not
    // positive/near-dup. Exact brute-force scan with the band filter
    // before the window (per-query state ∝ band survivors).
    GQuery("sim_hard_negatives",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        Similarity.hardNegatives(emb,
            emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
            k = 5, lo = 0.15, hi = 0.40)
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""SELECT qid, nid, CAST(score_u AS DOUBLE) / 1e6 AS score, rn FROM (
          SELECT q.vec_id AS qid, v.vec_id AS nid,
            CAST(floor($sqlCos * 1e6) AS BIGINT) AS score_u,
            CAST(row_number() OVER (PARTITION BY q.vec_id
              ORDER BY CAST(floor($sqlCos * 1e6) AS BIGINT) DESC NULLS LAST,
                       v.vec_id) AS INT) AS rn
          FROM embeddings q, embeddings v
          WHERE q.vec_id % 100 = 0 AND v.vec_id <> q.vec_id
            AND CAST(floor($sqlCos * 1e6) AS BIGINT) >= 150000
            AND CAST(floor($sqlCos * 1e6) AS BIGINT) < 400000)
        WHERE rn <= 5 ORDER BY qid, rn""")),

    // Content-stable 10% sample of the corpus by id hash.
    GQuery("sample_hash_keep",
      (s, d) => Sampling.hashSample(Tables(s, d, "documents"), "doc_id",
          "keep", bps = 1000)
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id FROM documents
        WHERE ${duckHex32("'keep:' || doc_id")} % 10000 < 1000
        ORDER BY doc_id""")),

    // Mixture sampling to target language proportions (en 50% / zh 20%
    // / de 15% / fr 10% / es 5%): the largest total N whose per-group
    // needs fit availability, exact hash-rank takes per group. The
    // oracle replays the BIGINT sizing chain (caps → min → takes) and
    // the rank selection verbatim.
    GQuery("sample_mixture",
      (s, d) => Sampling.mixtureSample(Tables(s, d, "documents"),
          "doc_id", "lang", "mix",
          Seq("en" -> 5000, "zh" -> 2000, "de" -> 1500,
            "fr" -> 1000, "es" -> 500))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id")),
      Some(s"""WITH wt(lang, w) AS (VALUES
          ('en', 5000), ('zh', 2000), ('de', 1500), ('fr', 1000), ('es', 500)),
        caps AS (
          SELECT lang, w, n, n * 10000 // w AS cap
          FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
          JOIN wt USING (lang)),
        nmax AS (SELECT min(cap) AS nm FROM caps),
        tgt AS (SELECT lang, nm * w // 10000 AS take FROM caps, nmax),
        r AS (
          SELECT doc_id, documents.lang AS lang, take,
            row_number() OVER (PARTITION BY documents.lang
              ORDER BY ${duckHex32("'mix:' || doc_id")} % 10000, doc_id) AS rk
          FROM documents JOIN tgt ON documents.lang = tgt.lang)
        SELECT doc_id, lang FROM r WHERE rk <= take
        ORDER BY lang, doc_id""")),

    // Temperature rebalance at α = 1/2 (Sampling.temperatureSample):
    // targets ∝ √n_g — √ is IEEE-correctly-rounded (pow is not), so the
    // derived integer basis points and the whole BIGINT sizing chain
    // replay exactly; selection is the same hash rank as sample_mixture.
    GQuery("sample_temperature",
      (s, d) => Sampling.temperatureSample(Tables(s, d, "documents"),
          "doc_id", "lang", "temp")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("lang"), col("doc_id")),
      Some(s"""WITH w AS (
          SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS wu
          FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)),
        tot AS (SELECT SUM(wu) AS tw FROM w),
        bp AS (SELECT lang, n, greatest(wu * 10000 // tw, 1) AS bp FROM w, tot),
        nmax AS (SELECT min(n * 10000 // bp) AS nm FROM bp),
        tgt AS (SELECT lang, nm * bp // 10000 AS take FROM bp, nmax),
        r AS (
          SELECT doc_id, documents.lang AS lang, take,
            row_number() OVER (PARTITION BY documents.lang
              ORDER BY ${duckHex32("'temp:' || doc_id")} % 10000, doc_id) AS rk
          FROM documents JOIN tgt ON documents.lang = tgt.lang)
        SELECT doc_id, lang FROM r WHERE rk <= take
        ORDER BY lang, doc_id""")),

    // Epoch-repetition mixing (the "data recipe"): de 3.0 epochs,
    // es 2.25, zh 1.25, fr 1.0, en 0.5 — integer epochs explode
    // map-side, the fractional epoch is a salted-hash-stable subset.
    GQuery("sample_repeat_epochs",
      (s, d) => Sampling.repeatEpochs(Tables(s, d, "documents"),
          "doc_id", "lang", "repeat",
          Seq("de" -> 30000, "es" -> 22500, "zh" -> 12500,
            "fr" -> 10000, "en" -> 5000))
        .select(col("doc_id"), col("lang"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch")),
      Some(s"""WITH w(lang, ebp) AS (VALUES
          ('de', 30000), ('es', 22500), ('zh', 12500),
          ('fr', 10000), ('en', 5000)),
        j AS (SELECT doc_id, documents.lang AS lang, ebp
          FROM documents JOIN w ON documents.lang = w.lang),
        fullr AS (
          SELECT doc_id, lang, CAST(unnest(range(ebp // 10000)) AS INT) AS epoch
          FROM j),
        fracr AS (
          SELECT doc_id, lang, CAST(ebp // 10000 AS INT) AS epoch
          FROM j
          WHERE ebp % 10000 > 0
            AND ${duckHex32("'repeat:' || doc_id")} % 10000 < ebp % 10000)
        SELECT doc_id, lang, epoch
        FROM (SELECT * FROM fullr UNION ALL SELECT * FROM fracr)
        ORDER BY doc_id, epoch""")),

    // Exact 5% per event_type, chosen by hash rank within the stratum —
    // per-group fraction is exact (ceil), assignment still deterministic.
    GQuery("sample_stratified",
      (s, d) => Sampling.stratifiedSample(Tables(s, d, "events"),
          "event_id", "event_type", "strat", bps = 500)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_type"), col("event_id")),
      Some(s"""WITH h AS (
          SELECT event_id, event_type,
            ${duckHex32("'strat:' || event_id")} % 10000 AS b
          FROM events),
        r AS (
          SELECT event_id, event_type,
            row_number() OVER (PARTITION BY event_type ORDER BY b, event_id) AS rk,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM h)
        SELECT event_id, event_type FROM r
        WHERE rk <= ceil(n * 500 / 10000.0)
        ORDER BY event_type, event_id""")),

    // Integer-unit PageRank (ops/Graph.scala): 5 iterations over the
    // nation ring graph (+5/+7 mod 25), rank carried as BIGINT 1e-12
    // units so every engine replays the iteration bit-for-bit — the
    // oracle unrolls the same 5 stages as plain CTEs. The iterative
    // driver loop is the same join+partial-agg shape per round that CC
    // uses; nothing here is float-order dependent.
    GQuery("graph_pagerank",
      (s, d) => {
        val nation = Tables(s, d, "nation")
        val nodes = nation.select(col("n_nationkey").as("node"))
        val edges = nation
          .select(col("n_nationkey").as("src"),
            ((col("n_nationkey") + 5) % 25).as("dst"))
          .unionByName(nation.select(col("n_nationkey").as("src"),
            ((col("n_nationkey") + 7) % 25).as("dst")))
        Graph.pageRank(nodes, edges, iters = 5)
          .orderBy(col("node"))
      },
      Some {
        val init = Graph.TotalUnits / 25
        val base = Graph.TotalUnits * 15 / 100 / 25
        val stages = (1 to 5).map { k =>
          s"""c$k AS (SELECT e.dst AS node, SUM(r${k - 1}.u // d.deg) AS s
               FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
               JOIN d ON d.src = e.src
               GROUP BY e.dst),
             r$k AS (SELECT r${k - 1}.node,
                 CAST($base + COALESCE((c$k.s * 85) // 100, 0) AS BIGINT) AS u
               FROM r${k - 1} LEFT JOIN c$k USING (node))"""
        }.mkString(",\n")
        s"""WITH e AS (
            SELECT n_nationkey AS src, (n_nationkey + 5) % 25 AS dst FROM nation
            UNION ALL
            SELECT n_nationkey, (n_nationkey + 7) % 25 FROM nation),
          d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
          r0 AS (SELECT n_nationkey AS node, CAST($init AS BIGINT) AS u FROM nation),
          $stages
          SELECT node, u, CAST(u AS DOUBLE) / 1e12 AS rank
          FROM r5 ORDER BY node"""
      }),

    GQuery("text_stats",
      (s, d) => TextAnalysis.stats(Tables(s, d, "documents"), "text")
        .select("doc_id", "n_bytes", "n_chars_m", "token_cnt", "uniq_tokens",
          "avg_token_len", "type_token_ratio")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        CAST(length(text) AS INT) AS n_chars_m,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS token_cnt,
        CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS INT) AS uniq_tokens,
        CAST(length(replace(text, ' ', '')) AS DOUBLE)
          / len(list_filter(string_split(text, ' '), x -> x <> '')) AS avg_token_len,
        CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS DOUBLE)
          / len(list_filter(string_split(text, ' '), x -> x <> '')) AS type_token_ratio
        FROM documents ORDER BY doc_id""")),

    GQuery("text_quality",
      (s, d) => TextAnalysis.quality(Tables(s, d, "documents"), "text")
        .select("doc_id", "punct_ratio", "digit_ratio", "stopword_ratio",
          "quality_score")
        .orderBy(col("doc_id")),
      // CASE guards mirror TextAnalysis.quality's empty-doc definition
      // (ratios are 0.0 when length/token count is zero, not NaN).
      Some("""WITH q AS (SELECT doc_id, length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
          len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
              x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS stops
          FROM documents)
        SELECT doc_id,
        CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END AS punct_ratio,
        CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END AS digit_ratio,
        CASE WHEN toks > 0 THEN stops::DOUBLE / toks ELSE 0.0 END AS stopword_ratio,
        (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
          * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
          * least(1.0, toks::DOUBLE / 20.0) AS quality_score
        FROM q ORDER BY doc_id""")),

    // Order-sensitive Rabin–Karp fingerprint — xxhash64 is Spark-specific
    // so no DuckDB oracle; Horner-chain properties pinned in LlmOpsSpec.
    GQuery("text_rolling_hash",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.rollingHash(col("text")).as("rh"))
        .orderBy(col("doc_id")),
      None),

    // Same Horner chain with an md5-derived token hash → the
    // order-sensitive fingerprint is hash-checked against DuckDB
    // (list_reduce mirrors the fold; hex-slice polynomial mirrors conv).
    GQuery("text_rolling_hash_md5",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.rollingHashPortable(col("text")).as("rh"))
        .orderBy(col("doc_id")),
      Some {
        val hexval = "CAST(list_sum(list_transform(range(8), k -> " +
          "CAST(strpos('0123456789abcdef', md5(t)[1+k]) - 1 AS BIGINT) " +
          "* (1::BIGINT << CAST(4*(7-k) AS INT)))) AS BIGINT) % 2147483648"
        s"""SELECT doc_id, list_reduce(
            list_prepend(0::BIGINT,
              list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                t -> $hexval)),
            (acc, x) -> (acc * 1000003 + x) % 2147483648) AS rh
          FROM documents ORDER BY doc_id"""
      }),

    // Corpus-statistical quality: average unigram surprisal under the
    // corpus's own token distribution (cheap LM filter). Per-token
    // surprisal quantized to DECIMAL(28,9) before the sum so the
    // aggregate is exact/commutative — bit-identical to the oracle.
    GQuery("text_unigram_surprisal",
      (s, d) => TextAnalysis.unigramSurprisal(
          Tables(s, d, "documents"), "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
          FROM documents),
        perdoc AS (SELECT doc_id, t, count(*) AS k FROM toks GROUP BY doc_id, t),
        freq AS (SELECT t, count(*) AS cnt FROM toks GROUP BY t),
        tot AS (SELECT count(*) AS total FROM toks),
        scored AS (
          SELECT doc_id, k,
            CAST(floor(-ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS nlp_u
          FROM perdoc JOIN freq USING (t), tot)
        SELECT doc_id, CAST(sum(k) AS INT) AS n_tokens,
          CAST(sum(k * nlp_u) AS DOUBLE) / (sum(k) * 1e6) AS surprisal
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // Second-order LM filter: average bigram surprisal under the
    // corpus's own transition model (TextAnalysis.bigramSurprisal) —
    // same fixed-point micro-nat discipline as the unigram twin.
    GQuery("text_bigram_surprisal",
      (s, d) => TextAnalysis.bigramSurprisal(
          Tables(s, d, "documents"), "doc_id", "text")
        .withColumnRenamed("doc", "doc_id")
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        big AS (
          SELECT doc_id, tk[i] AS t1, tk[i + 1] AS t2
          FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) s),
        perdoc AS (SELECT doc_id, t1, t2, count(*) AS k
                   FROM big GROUP BY doc_id, t1, t2),
        c2 AS (SELECT t1, t2, count(*) AS cnt2 FROM big GROUP BY t1, t2),
        c1 AS (SELECT t1, count(*) AS cnt1 FROM big GROUP BY t1),
        scored AS (
          SELECT doc_id, k,
            CAST(floor(-ln(CAST(cnt2 AS DOUBLE) / cnt1) * 1e6) AS BIGINT) AS nlp_u
          FROM perdoc JOIN c2 USING (t1, t2) JOIN c1 USING (t1))
        SELECT doc_id, CAST(sum(k) AS INT) AS n_bigrams,
          CAST(sum(k * nlp_u) AS DOUBLE) / (sum(k) * 1e6) AS surprisal2
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // Gopher-style repetition filters: duplicate-trigram ratio (map-only
    // array ops) + top-token share (partial-agg'd (doc, token) counts —
    // shuffles key on doc, so no stop-token can skew a partition).
    GQuery("text_repetition",
      (s, d) => TextAnalysis.repetition(Tables(s, d, "documents"),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        tri AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
            ELSE [] END AS tg
          FROM toks),
        trir AS (
          SELECT doc_id, CASE WHEN len(tg) > 0
            THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
            ELSE 0.0 END AS dup_trigram_ratio
          FROM tri),
        cnt AS (
          SELECT doc_id, t, count(*) AS k
          FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
        top AS (
          SELECT doc_id, max(k)::DOUBLE / sum(k) AS top_token_ratio
          FROM cnt GROUP BY doc_id)
        SELECT t.doc_id, trir.dup_trigram_ratio,
               COALESCE(top.top_token_ratio, 0.0) AS top_token_ratio
        FROM toks t JOIN trir USING (doc_id) LEFT JOIN top USING (doc_id)
        ORDER BY doc_id""")),

    // Benchmark decontamination: exact 5-gram collision against the
    // doc_id%7 "benchmark" subset — the train/test-overlap audit an LLM
    // corpus runs before training. Equi-join on the n-gram (benchmark
    // side broadcast-sized), distinct-count shuffled on doc.
    GQuery("text_decontaminate",
      (s, d) => Dedup.ngramOverlap(Tables(s, d, "documents"),
          "doc_id", "text", n = 5, benchPred = _ % 7 === 0)
        .orderBy(col("doc")),
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id AS doc, array_to_string(tk[i:i+4], ' ') AS s
          FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS i)),
        b AS (SELECT s, doc AS bdoc FROM sh WHERE doc % 7 = 0)
        SELECT sh.doc, CAST(count(DISTINCT sh.s) AS BIGINT) AS n_shared
        FROM sh JOIN b ON sh.s = b.s AND sh.doc <> b.bdoc
        GROUP BY 1 ORDER BY doc""")),

    // Source-mixture rebalancing: down-sample every language to the
    // smallest one's size via integer-bps hash keeps — deterministic
    // domain reweighting (the oracle replays the bps table and every
    // per-doc keep decision exactly).
    GQuery("sample_mix_rebalance",
      (s, d) => Sampling.rebalanceUniform(Tables(s, d, "documents"),
          "doc_id", "lang", "mix")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_before"),
          sum(col("keep").cast("long")).as("n_after"))
        .orderBy(col("lang")),
      Some(s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        m AS (SELECT min(n) AS minn FROM c),
        b AS (SELECT lang, (minn * 10000) // n AS bps FROM c, m),
        k AS (SELECT d.lang,
                CASE WHEN ${duckHex32("'mix:' || doc_id")} % 10000 < b.bps
                     THEN 1 ELSE 0 END AS keep
              FROM documents d JOIN b USING (lang))
        SELECT lang, count(*) AS n_before, CAST(sum(keep) AS BIGINT) AS n_after
        FROM k GROUP BY lang ORDER BY lang""")),

    // PII scrub: deterministic synthetic PII (email, IPv4, account
    // number derived from doc_id) appended to each document, then
    // redacted by the shared Java/RE2-subset patterns — counts and the
    // md5 of the redacted text must match DuckDB running the IDENTICAL
    // regexes. Map-side regexp_replace, the shape of a 100 TB scrub.
    GQuery("text_pii_redact",
      (s, d) => {
        val withPii = Tables(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@mail.example.com ip "),
            col("doc_id") % 256, lit("."), (col("doc_id") * 7) % 256,
            lit("."), (col("doc_id") * 13) % 256, lit("."),
            (col("doc_id") * 29) % 256,
            lit(" acct "), col("doc_id") * 1009 + 123456789).as("t"))
        TextAnalysis.redactPii(withPii, "t")
          .select(col("doc_id"), col("n_emails"), col("n_ips"),
            md5(col("redacted")).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      Some {
        import TextAnalysis.{emailPattern, ipPattern, longNumPattern}
        s"""WITH p AS (SELECT doc_id,
            text || ' contact user' || doc_id || '@mail.example.com ip ' ||
            (doc_id % 256) || '.' || (doc_id * 7 % 256) || '.' ||
            (doc_id * 13 % 256) || '.' || (doc_id * 29 % 256) ||
            ' acct ' || (doc_id * 1009 + 123456789) AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '$emailPattern')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(t, '$ipPattern')) AS INT) AS n_ips,
          md5(regexp_replace(regexp_replace(regexp_replace(t,
            '$emailPattern', '<EMAIL>', 'g'),
            '$ipPattern', '<IP>', 'g'),
            '$longNumPattern', '<NUM>', 'g')) AS redacted_md5
        FROM p ORDER BY doc_id"""
      }),

    GQuery("text_fingerprint",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(
          list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
        FROM documents ORDER BY doc_id""")),

    GQuery("text_regex_tokens",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.regexTokenCount(col("text")).as("n_regex_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
        CAST(len(regexp_extract_all(text, '${TextAnalysis.tokenPattern}')) AS INT)
          AS n_regex_tokens
        FROM documents ORDER BY doc_id""")),

    GQuery("text_langid",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id")),
      Some {
        val hits = TextAnalysis.langStopwords.map { case (lang, words) =>
          s"len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''), " +
            s"x -> x IN (${words.map(w => s"'$w'").mkString(", ")}))) AS h_$lang"
        }.mkString(", ")
        val langs = TextAnalysis.langStopwords.map(_._1)
        val best = s"greatest(${langs.map(l => s"h_$l").mkString(", ")})"
        // foldRight over list order ⇒ first language is the outermost CASE,
        // matching TextAnalysis.langId's first-listed-wins tie rule.
        val pick = langs.foldRight(s"'${langs.head}'") { (l, acc) =>
          s"CASE WHEN h_$l = $best THEN '$l' ELSE $acc END"
        }
        s"""SELECT doc_id, lang, $pick AS lang_pred
           FROM (SELECT doc_id, lang, $hits FROM documents)
           ORDER BY doc_id"""
      }),

    // REAL image decode (pure-JVM P6 codec): synthetic images whose
    // dimensions and pixels are closed-form in doc_id, decoded back to
    // per-channel means — the oracle regenerates every pixel via lateral
    // generate_series and must agree on the exact integer sums.
    GQuery("multimodal_img_decode",
      (s, d) => Multimodal.decodeImages(
          Multimodal.asImageTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          avg((7*doc_id + 3*x + 5*y) % 256) AS mean_r,
          avg((11*doc_id + x + 2*y) % 256) AS mean_g,
          avg((13*doc_id + 3*x + y) % 256) AS mean_b
        FROM px GROUP BY doc_id, w, h ORDER BY doc_id""")),

    // Perceptual image dedup (dHash + pigeonhole band join — the
    // LAION-scale image-dedup shape): planted exact copies (id%10==7)
    // and one-pixel edits (id%10==8) must pair with their originals at
    // hamming 0 / ≤2. FULLY hash-oracle-checked — the synthetic pixels
    // are closed-form, so DuckDB regenerates grid grays, the 56-bit
    // gradient hash, the 4×14-bit bands, the candidate join and the
    // popcount verify; the decode→hash kernel itself is additionally
    // pinned by PhashSpec. Never all-pairs: candidates come from the
    // (band, value) equi-join only.
    GQuery("multimodal_phash_pairs",
      (s, d) => Multimodal.phashPairs(
          Multimodal.asPhashImageTable(
            Tables.spread(Tables(s, d, "documents"))), maxDist = 3)
        .orderBy(col("i"), col("j")),
      Some(s"""$phashBandsCte,
        cand AS (
          SELECT DISTINCT a.id AS i, a.h AS hi, b.id AS j, b.h AS hj
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.v = b.v AND a.id < b.id)
        SELECT i, j, CAST(bit_count(xor(hi, hj)) AS INT) AS dist
        FROM cand WHERE bit_count(xor(hi, hj)) <= 3
        ORDER BY i, j""")),

    // The image index lifecycle's probe half: corpus dHash bands
    // PERSISTED bucket-partitioned (memoized offline build, the
    // shingle-index economics for images), the planted-dup batch
    // hashed live and probed — touched buckets pushed as a partition
    // filter, candidates across all ingest segments, popcount verify.
    // Oracle replays both sides' hashes and the band join; bucketing
    // never changes results (every batch (band, value) is included).
    GQuery("multimodal_phash_incremental",
      (s, d) => {
        val imgs = Multimodal.asPhashImageTable(Tables(s, d, "documents"))
        Multimodal.phashAgainstIndex(s, phashIndexFor(s, d),
            imgs.filter(col("doc_id") % 10 === 7 ||
              col("doc_id") % 10 === 8), maxDist = 3)
          .orderBy(col("i"), col("j"))
      },
      Some(s"""$phashBandsCte,
        corp AS (SELECT * FROM bands WHERE id % 10 <> 7 AND id % 10 <> 8),
        bat AS (SELECT * FROM bands WHERE id % 10 = 7 OR id % 10 = 8),
        cand AS (
          SELECT DISTINCT c.id AS i, c.h AS hi, q.id AS j, q.h AS hj
          FROM corp c JOIN bat q ON c.b = q.b AND c.v = q.v)
        SELECT i, j, CAST(bit_count(xor(hi, hj)) AS INT) AS dist
        FROM cand WHERE bit_count(xor(hi, hj)) <= 3
        ORDER BY i, j""")),

    // REAL nearest-neighbor resize: decode → resample to 4×4 → re-encode
    // → decode again. The oracle mirrors the integer sampling formula
    // sx = x2·w/4, sy = y2·h/4 pixel for pixel.
    GQuery("multimodal_img_resize",
      (s, d) => Multimodal.decodeImages(
          Multimodal.resizeImages(
            Multimodal.asImageTable(Tables.spread(Tables(s, d, "documents"))),
            w2 = 4, h2 = 4))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, (xs.x2 * w) // 4 AS sx, (ys.y2 * h) // 4 AS sy
          FROM g,
            LATERAL (SELECT unnest(range(4)) AS x2) xs,
            LATERAL (SELECT unnest(range(4)) AS y2) ys)
        SELECT doc_id, 4 AS width, 4 AS height,
          avg((7*doc_id + 3*sx + 5*sy) % 256) AS mean_r,
          avg((11*doc_id + sx + 2*sy) % 256) AS mean_g,
          avg((13*doc_id + 3*sx + sy) % 256) AS mean_b
        FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL JPEG decode (JDK javax.imageio): the same synthetic pattern
    // as the PPM pair, pushed through actual lossy DCT compression.
    // Dimensions survive the codec exactly → full hash oracle on the
    // decode path end-to-end; pixel means are lossy (≈±1 unit at
    // quality 1.0) → tolerance-checked in JpegSpec instead, the same
    // exact-twin/approximate-op split as MinHash vs its md5 twin.
    GQuery("multimodal_jpeg_dims",
      (s, d) => Multimodal.decodeJpeg(
          Multimodal.asJpegTable(Tables.spread(Tables(s, d, "documents"))))
        .select(col("doc_id"), col("width"), col("height"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS width,
          CAST(8 + doc_id % 7 AS INT) AS height
        FROM documents ORDER BY doc_id""")),

    // Full decoded statistics of the lossy payload — engine-specific by
    // nature (the JDK's IDCT), so rows-only here; JpegSpec pins the
    // channel means to the closed-form source within ±1.5 units.
    GQuery("multimodal_jpeg_decode",
      (s, d) => Multimodal.decodeJpeg(
          Multimodal.asJpegTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      None),

    // decode → nearest-neighbor 4×4 resample (the SAME pixel-space
    // kernel as multimodal_img_resize) → JPEG re-encode → decode:
    // output dimensions are contract-exact through two lossy trips.
    GQuery("multimodal_jpeg_resize",
      (s, d) => Multimodal.decodeJpeg(
          Multimodal.resizeJpeg(
            Multimodal.asJpegTable(Tables.spread(Tables(s, d, "documents"))),
            w2 = 4, h2 = 4))
        .select(col("doc_id"), col("width"), col("height"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 4 AS width, 4 AS height
        FROM documents ORDER BY doc_id""")),

    // REAL PNG decode (JDK javax.imageio): the same synthetic pattern
    // as the PPM/JPEG pairs through real deflate compression — and
    // because PNG is LOSSLESS, the full stats row (dims AND channel
    // means) carries the pixel-exact hash oracle, unlike the JPEG twin
    // whose pixel stats are tolerance-spec'd.
    GQuery("multimodal_png_decode",
      (s, d) => Multimodal.decodePng(
          Multimodal.asPngTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          avg((7*doc_id + 3*x + 5*y) % 256) AS mean_r,
          avg((11*doc_id + x + 2*y) % 256) AS mean_g,
          avg((13*doc_id + 3*x + y) % 256) AS mean_b
        FROM px GROUP BY doc_id, w, h ORDER BY doc_id""")),

    // decode → nearest-neighbor 4×4 resample → PNG re-encode → decode:
    // lossless both trips, so the oracle mirrors the integer sampling
    // formula pixel for pixel (the full-fidelity version of
    // multimodal_jpeg_resize's dims-only check).
    GQuery("multimodal_png_resize",
      (s, d) => Multimodal.decodePng(
          Multimodal.resizePng(
            Multimodal.asPngTable(Tables.spread(Tables(s, d, "documents"))),
            w2 = 4, h2 = 4))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, (xs.x2 * w) // 4 AS sx, (ys.y2 * h) // 4 AS sy
          FROM g,
            LATERAL (SELECT unnest(range(4)) AS x2) xs,
            LATERAL (SELECT unnest(range(4)) AS y2) ys)
        SELECT doc_id, 4 AS width, 4 AS height,
          avg((7*doc_id + 3*sx + 5*sy) % 256) AS mean_r,
          avg((11*doc_id + sx + 2*sy) % 256) AS mean_g,
          avg((13*doc_id + 3*sx + sy) % 256) AS mean_b
        FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL video-container decode (animated GIF via javax.imageio):
    // frame count, dimensions and whole-clip mean luma. GIF is
    // palette-based and LOSSLESS, so unlike JPEG the pixel statistics
    // get a full hash oracle — the lateral ranges regenerate every
    // (frame, x, y) pixel closed-form.
    GQuery("multimodal_video_decode",
      (s, d) => Multimodal.decodeVideo(
          Multimodal.asVideoTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 2 + doc_id % 4 AS nf, 8 + doc_id % 9 AS w,
                 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, nf, w, h, fs.f AS f, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(nf)) AS f) fs,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(nf AS INT) AS n_frames, CAST(w AS INT) AS width,
          CAST(h AS INT) AS height,
          avg((17*doc_id + 37*f + 3*x + 5*y) % 256) AS mean_luma
        FROM px GROUP BY doc_id, nf, w, h ORDER BY doc_id""")),

    // REAL frame sampling (every 2nd frame) — the video analogue of
    // the audio decimation pair; per-frame mean luma, frame-exact.
    GQuery("multimodal_video_frames",
      (s, d) => Multimodal.sampleVideoFrames(
          Multimodal.asVideoTable(Tables.spread(Tables(s, d, "documents"))),
          stride = 2)
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH g AS (
          SELECT doc_id, 2 + doc_id % 4 AS nf, 8 + doc_id % 9 AS w,
                 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, fs.f AS f, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(0, nf, 2)) AS f) fs,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(f AS INT) AS frame_idx,
          avg((17*doc_id + 37*f + 3*x + 5*y) % 256) AS mean_luma
        FROM px GROUP BY doc_id, f ORDER BY doc_id, f""")),

    // REAL audio decode (pure-JVM RIFF/PCM16 codec): synthetic clips
    // whose sample values are closed-form in (doc_id, i); the oracle
    // regenerates every sample and must agree on the exact integer sums.
    GQuery("multimodal_audio_decode",
      (s, d) => Multimodal.decodeAudio(
          Multimodal.asAudioTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 400 + doc_id % 200 AS n FROM documents),
        sm AS (
          SELECT doc_id, n, si.i AS i
          FROM g, LATERAL (SELECT unnest(range(n)) AS i) si)
        SELECT doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
          CAST(n AS DOUBLE) * 1000 / 8000 AS duration_ms,
          avg(abs((31*doc_id + 7*i) % 65536 - 32768)) AS mean_abs
        FROM sm GROUP BY doc_id, n ORDER BY doc_id""")),

    // REAL lossy compression with a DETERMINISTIC loss: G.711 μ-law
    // companding (the telephony codec) is pure integer arithmetic, so
    // the oracle replays the full encode→decode round trip closed-form
    // — per-sample sign/clip/bias, segment by magnitude range, 4-bit
    // mantissa, mid-step reconstruction — and must agree on the exact
    // decoded sums AND the max companding error.
    GQuery("multimodal_mulaw_roundtrip",
      (s, d) => Multimodal.decodeMulaw(
          Multimodal.asMulawTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 400 + doc_id % 200 AS n FROM documents),
        sm AS (
          SELECT doc_id, n, si.i AS i,
            CAST((31*doc_id + 7*si.i) % 65536 - 32768 AS INT) AS s
          FROM g, LATERAL (SELECT unnest(range(n)) AS i) si),
        enc AS (
          SELECT doc_id, n, s,
            s < 0 AS neg,
            LEAST(CASE WHEN s < 0 THEN -s ELSE s END, 32635) + 132 AS m1
          FROM sm),
        seg AS (
          SELECT doc_id, n, s, neg, m1,
            CASE WHEN m1 >= 16384 THEN 7 WHEN m1 >= 8192 THEN 6
                 WHEN m1 >= 4096 THEN 5 WHEN m1 >= 2048 THEN 4
                 WHEN m1 >= 1024 THEN 3 WHEN m1 >= 512 THEN 2
                 WHEN m1 >= 256 THEN 1 ELSE 0 END AS e
          FROM enc),
        dec AS (
          SELECT doc_id, n, s,
            CASE WHEN neg THEN -((((m1 >> (e+3)) & 15) * 8 + 132) << e) + 132
                 ELSE ((((m1 >> (e+3)) & 15) * 8 + 132) << e) - 132 END AS d
          FROM seg)
        SELECT doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
          avg(abs(d)) AS mean_abs,
          CAST(max(abs(d - s)) AS INT) AS max_err
        FROM dec GROUP BY doc_id, n ORDER BY doc_id""")),

    // REAL decimating resample (k=4): every 4th sample survives, rate
    // drops to 2000 Hz — the oracle samples the same indices.
    GQuery("multimodal_audio_resample",
      (s, d) => Multimodal.decodeAudio(
          Multimodal.resampleAudio(
            Multimodal.asAudioTable(Tables.spread(Tables(s, d, "documents"))),
            k = 4))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 400 + doc_id % 200 AS n,
                 (400 + doc_id % 200 + 3) // 4 AS n2 FROM documents),
        sm AS (
          SELECT doc_id, n2, si.i AS i
          FROM g, LATERAL (SELECT unnest(range(n2)) AS i) si)
        SELECT doc_id, 2000 AS sample_rate, CAST(n2 AS INT) AS n_samples,
          CAST(n2 AS DOUBLE) * 1000 / 2000 AS duration_ms,
          avg(abs((31*doc_id + 7*(4*i)) % 65536 - 32768)) AS mean_abs
        FROM sm GROUP BY doc_id, n2 ORDER BY doc_id""")),

    GQuery("multimodal_features",
      (s, d) => Multimodal.extractFeatures(
          Multimodal.asMediaTable(Tables.spread(Tables(s, d, "documents"))))
        .select("doc_id", "mime", "n_bytes")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 'application/octet-stream' AS mime,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes
        FROM documents ORDER BY doc_id""")),

    // Resized length is exactly reproducible relationally: ceil(n/stride)
    // with stride = ceil(n/target) — so the oracle checks the contract
    // even though the byte content is kernel-defined.
    GQuery("multimodal_resize",
      (s, d) => Multimodal.resize(
          Multimodal.asMediaTable(Tables.spread(Tables(s, d, "documents"))),
          target = 64)
        .select(col("doc_id"), col("n_bytes"),
          octet_length(col("resized")).as("resized_bytes"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        CAST(CASE WHEN octet_length(encode(text)) <= 64 THEN octet_length(encode(text))
          ELSE ceil(octet_length(encode(text))::DOUBLE
                    / ceil(octet_length(encode(text)) / 64.0)) END AS INT) AS resized_bytes
        FROM documents ORDER BY doc_id""")),

    GQuery("multimodal_frames",
      (s, d) => Multimodal.sampleFrames(
          Multimodal.asMediaTable(Tables.spread(Tables(s, d, "documents"))), n = 8)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).as("total_bytes"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE)
          / CAST(ceil(octet_length(encode(text)) / 8.0) AS INT)) AS BIGINT) AS n_frames,
        CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
        FROM documents ORDER BY doc_id""")),

    // Leakage-safe train/test split: near-dup CLUSTERS move as units
    // (group id = cluster representative, singletons group as
    // themselves), so no near-dup pair straddles the boundary — the
    // dedup-aware split that prevents paraphrase contamination of the
    // test set by construction. Oracle replays clustering (recursive
    // CTE) + the md5 group bucket.
    GQuery("sample_split_leakage_safe",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Sampling.leakageSafeSplit(docs, "doc_id",
            s.read.parquet(dedupClustersFor(s, d)),
            salt = "split", trainBps = 8000)
          .select(col("doc_id"), col("group_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        pairs AS (
          SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS common
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (
          SELECT i, j, common::DOUBLE / (ca.n + cb.n - common) AS jc
          FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j),
        e0 AS (SELECT i, j FROM jac WHERE jc >= 0.8),
        e AS (SELECT i AS a, j AS b FROM e0 UNION SELECT j, i FROM e0),
        reach(node, r) AS (
          SELECT a, b FROM e
          UNION
          SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a),
        cl AS (
          SELECT node AS doc_id, least(node, min(r)) AS cluster
          FROM reach GROUP BY node)
        SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS group_id,
          CASE WHEN (${duckHex32(
            "'split:' || CAST(COALESCE(cl.cluster, d.doc_id) AS VARCHAR)")}
            % 10000) < 8000 THEN 'train' ELSE 'test' END AS split
        FROM documents d LEFT JOIN cl USING (doc_id)
        ORDER BY doc_id""")),

    // Token-budget mixture take: per language, keep docs in md5-rank
    // order while the running token sum stays within a 3000-token
    // budget — recipes budget TOKENS, not doc counts (doc-count takes
    // over-weight sources with long documents). One shuffle on the
    // group key + a running-sum window; kept set is a pure function of
    // ids and budgets.
    GQuery("sample_token_budget",
      (s, d) => Sampling.tokenBudgetSample(Tables(s, d, "documents"),
          "doc_id", "lang", size(TextAnalysis.tokens(col("text"))),
          salt = "tb", budget = 3000L)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
          SELECT doc_id, lang,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
            (${duckHex32("'tb:' || doc_id")} % 10000) AS rk
          FROM documents),
        c AS (
          SELECT doc_id, lang, n_tokens,
            CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY rk, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_tokens
          FROM t)
        SELECT doc_id, lang, n_tokens, cum_tokens FROM c
        WHERE cum_tokens <= 3000 ORDER BY doc_id""")),

    // Deterministic global shuffle + sharding (training export's last
    // step): shard/pos are pure functions of (salt, id); reading shards
    // 0..7 in pos order replays one uniform permutation, any shard
    // subset is a uniform subsample. One exchange on shard + a
    // within-shard sort — never ORDER BY rand()'s global sort.
    GQuery("sample_shuffle_shards",
      (s, d) => Sampling.shuffleShards(Tables(s, d, "documents"),
          "doc_id", salt = "shuf", numShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos")),
      Some(s"""WITH h AS (
          SELECT doc_id, ${duckHex60("'shuf:' || doc_id")} AS h
          FROM documents)
        SELECT doc_id, CAST(h % 8 AS INT) AS shard,
          CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
            - 1 AS BIGINT) AS pos
        FROM h ORDER BY shard, pos""")),

    // Per-source quality gate: keep the top 30% of each source by the
    // text_quality score (micro-unit exact cut, ties → smaller id) —
    // the per-domain classifier-score filter a global threshold can't
    // express. Count + rank stack on one exchange keyed by source.
    GQuery("sample_quality_gate",
      (s, d) => {
        val q = TextAnalysis.quality(Tables(s, d, "documents"), "text")
          .withColumn("score_u",
            floor(col("quality_score") * 1e6).cast("long"))
        Sampling.qualityGate(q, "doc_id", "source", col("score_u"),
            keepBps = 3000)
          .select(col("doc_id"), col("source"), col("score_u"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH q AS (SELECT doc_id, source, length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents),
        sc AS (SELECT doc_id, source,
          CAST(floor(
            (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) * 1e6) AS BIGINT) AS score_u
          FROM q),
        g AS (SELECT doc_id, source, score_u,
          count(*) OVER (PARTITION BY source) AS n,
          row_number() OVER (PARTITION BY source
            ORDER BY score_u DESC, doc_id) AS rn
          FROM sc)
        SELECT doc_id, source, score_u FROM g
        WHERE rn <= (n * 3000 + 9999) // 10000 ORDER BY doc_id""")),

    // End-to-end training export — the composition a pretraining run
    // actually consumes: quality gate (top 70% per source) → exact-
    // dedup canon (min-id per md5(text)) → deterministic 95/5
    // train/valid split → per-split shuffle into 4 shards with dense
    // positions. Every stage is an already-proven op; the value is the
    // one-call recipe and the one-WITH-stack oracle over the whole
    // chain. Cost ≈ sum of stages: one source-keyed exchange (gate),
    // one md5 groupBy + semi join (canon), map-only split, one
    // (split, shard) exchange (shards) — nothing quadratic, nothing
    // corpus-sized on the driver.
    GQuery("pipeline_train_export",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val scored = TextAnalysis.quality(docs, "text")
          .withColumn("score_u",
            floor(col("quality_score") * 1e6).cast("long"))
        val gated = Sampling.qualityGate(scored, "doc_id", "source",
          col("score_u"), keepBps = 7000)
        val canon = gated.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val dd = gated.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
        val split = Sampling.hashSplit(dd, "doc_id", "xsp",
          Seq("train" -> 9500, "valid" -> 500))
        Sampling.shuffleShards(split, "doc_id", "xsh", numShards = 4,
            extraPartitionCols = Seq(col("split")))
          .select(col("doc_id"), col("split"), col("shard"), col("pos"))
          .orderBy(col("split"), col("shard"), col("pos"))
      },
      Some(s"""WITH q AS (SELECT doc_id, source, text,
          length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents),
        sc AS (SELECT doc_id, source, text,
          CAST(floor(
            (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) * 1e6) AS BIGINT) AS score_u
          FROM q),
        g AS (SELECT doc_id, source, text, score_u,
          count(*) OVER (PARTITION BY source) AS n,
          row_number() OVER (PARTITION BY source
            ORDER BY score_u DESC, doc_id) AS rn
          FROM sc),
        gated AS (SELECT doc_id, text FROM g
          WHERE rn <= (n * 7000 + 9999) // 10000),
        canon AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        dd AS (SELECT gated.doc_id FROM gated SEMI JOIN canon USING (doc_id)),
        sp AS (SELECT doc_id,
          CASE WHEN ${duckHex32("'xsp:' || doc_id")} % 10000 < 9500
            THEN 'train' ELSE 'valid' END AS split
          FROM dd),
        h AS (SELECT doc_id, split,
          ${duckHex60("'xsh:' || doc_id")} AS h FROM sp)
        SELECT doc_id, split, CAST(h % 4 AS INT) AS shard,
          CAST(row_number() OVER (PARTITION BY split, h % 4
            ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM h ORDER BY split, shard, pos""")),

    // The MULTIMODAL train export — pipeline_train_export extended to
    // a text+image corpus, composed from already-proven stages the way
    // the pieces are meant to stack:
    //   1. ALIGNMENT GATE (profile_align_audit's semantics as a
    //      filter): only docs whose embedding row exists survive —
    //      planted misalignment (vec_id%13 drops) makes it bite;
    //   2. per-source QUALITY GATE (top 70%);
    //   3. TEXT exact-dedup canon (min id per md5(text));
    //   4. IMAGE perceptual canon: connected components over the
    //      phash near-dup pairs (multimodal_phash_pairs' banding) with
    //      the maxBucket=16 hot-bucket cap — the synthetic gradient
    //      images are a LOW-ENTROPY corpus (whole eid ranges share a
    //      dHash), so the uncapped banded join is ~6M pairs at sf0.1
    //      and the CC collapses 90% of the corpus into one component;
    //      the cap excludes those degenerate buckets (the documented
    //      production mitigation for exactly this regime) and keeps
    //      the genuinely distinctive duplicate groups, including the
    //      planted b/b+7/b+8 families. Canon rule is FIRST-OCCURRENCE-
    //      WINS: any doc whose image near-duplicates a lower id's is
    //      cut (one distinct over the pair list — no iterative
    //      connected-components rounds, which measured 9 s of pure
    //      shuffle-iteration overhead here; the CC-exact variant
    //      remains dedup_clusters' composition) — a doc is dropped
    //      even when its text is unique, which is exactly what the
    //      text-only export misses. The oracle replays the cap: hot
    //      (b, v) counted over the UNPRUNED bands, anti-joined before
    //      candidate generation, bit-for-bit the phashPairs semantics;
    //   5. deterministic 95/5 split → per-split shuffle into 4 shards.
    // One WITH-stack oracle replays the whole chain (the phash CTEs
    // need WITH RECURSIVE for the component closure). Cost = the text
    // pipeline + one banded self-join + the star-contraction CC on the
    // tiny pair graph — nothing quadratic, nothing corpus-sized
    // driver-side.
    GQuery("pipeline_train_export_mm",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val emb = Tables(s, d, "embeddings")
          .filter(col("vec_id") % 13 =!= 0)
          .select(col("vec_id").as("doc_id"))
        val aligned = docs.join(emb, Seq("doc_id"), "left_semi")
        val scored = TextAnalysis.quality(aligned, "text")
          .withColumn("score_u",
            floor(col("quality_score") * 1e6).cast("long"))
        val gated = Sampling.qualityGate(scored, "doc_id", "source",
          col("score_u"), keepBps = 7000)
        val canon = gated.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val dd = gated.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
        val pairs = Multimodal.phashPairs(
          Multimodal.asPhashImageTable(docs), maxDist = 3, maxBucket = 16)
        val imgDrop = pairs.select(col("j").as("doc_id")).distinct()
        val ddmm = dd.join(imgDrop, Seq("doc_id"), "left_anti")
        val split = Sampling.hashSplit(ddmm, "doc_id", "msp",
          Seq("train" -> 9500, "valid" -> 500))
        Sampling.shuffleShards(split, "doc_id", "msh", numShards = 4,
            extraPartitionCols = Seq(col("split")))
          .select(col("doc_id"), col("split"), col("shard"), col("pos"))
          .orderBy(col("split"), col("shard"), col("pos"))
      },
      Some(s"""$phashBandsCte,
        phot AS (SELECT b, v FROM bands GROUP BY b, v HAVING count(*) > 16),
        ppruned AS (SELECT bands.* FROM bands ANTI JOIN phot USING (b, v)),
        pcand AS (
          SELECT i, j FROM (
            SELECT DISTINCT a.id AS i, a.h AS hi, b.id AS j, b.h AS hj
            FROM ppruned a JOIN ppruned b
              ON a.b = b.b AND a.v = b.v AND a.id < b.id)
          WHERE bit_count(xor(hi, hj)) <= 3),
        imgdrop AS (SELECT DISTINCT j AS doc_id FROM pcand),
        q AS (SELECT doc_id, source, text,
          length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents
          WHERE doc_id IN (SELECT vec_id FROM embeddings WHERE vec_id % 13 <> 0)),
        sc AS (SELECT doc_id, source, text,
          CAST(floor(
            (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) * 1e6) AS BIGINT) AS score_u
          FROM q),
        g AS (SELECT doc_id, source, text, score_u,
          count(*) OVER (PARTITION BY source) AS n,
          row_number() OVER (PARTITION BY source
            ORDER BY score_u DESC, doc_id) AS rn
          FROM sc),
        gated AS (SELECT doc_id, text FROM g
          WHERE rn <= (n * 7000 + 9999) // 10000),
        canon AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
        dd AS (SELECT gated.doc_id FROM gated SEMI JOIN canon USING (doc_id)),
        ddmm AS (SELECT doc_id FROM dd ANTI JOIN imgdrop USING (doc_id)),
        sp AS (SELECT doc_id,
          CASE WHEN ${duckHex32("'msp:' || doc_id")} % 10000 < 9500
            THEN 'train' ELSE 'valid' END AS split
          FROM ddmm),
        hh AS (SELECT doc_id, split,
          ${duckHex60("'msh:' || doc_id")} AS h FROM sp)
        SELECT doc_id, split, CAST(h % 4 AS INT) AS shard,
          CAST(row_number() OVER (PARTITION BY split, h % 4
            ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM hh ORDER BY split, shard, pos""")),

    // Contamination audit report (Dedup.contaminationReport): the
    // per-benchmark-entry view of decontamination — text_decontaminate
    // flags corpus docs to DROP; this reports which benchmark entries
    // are compromised and how badly (distinct 5-grams, how many leak
    // into the corpus, the ratio, distinct leaking corpus docs).
    // Benchmark = doc_id%7==0, the pipeline_curate convention.
    GQuery("text_contamination_report",
      (s, d) => Dedup.contaminationReport(Tables(s, d, "documents"),
          "doc_id", "text", n = 5, benchPred = _ % 7 === 0)
        .withColumnRenamed("bench", "bench_id")
        .orderBy(col("bench_id")),
      Some(s"""WITH atoks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        sh5 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS s
          FROM atoks,
            LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS i)),
        b AS (SELECT doc_id AS bench_id, s FROM sh5 WHERE doc_id % 7 = 0),
        c AS (SELECT doc_id AS cid, s FROM sh5 WHERE doc_id % 7 <> 0),
        cdf AS (SELECT s, count(*) AS nc FROM c GROUP BY 1),
        g AS (
          SELECT bench_id, CAST(count(*) AS INT) AS n_grams,
            CAST(sum(CASE WHEN cdf.s IS NOT NULL THEN 1 ELSE 0 END) AS INT)
              AS n_hit
          FROM b LEFT JOIN cdf USING (s) GROUP BY 1),
        dd AS (
          SELECT bench_id, CAST(count(*) AS INT) AS n_dirty_docs
          FROM (SELECT DISTINCT bench_id, cid FROM b JOIN c USING (s))
          GROUP BY 1)
        SELECT g.bench_id, n_grams, n_hit,
          CAST(floor(CAST(n_hit AS DOUBLE) / n_grams * 1e6) AS DOUBLE) / 1e6
            AS hit_ratio,
          COALESCE(dd.n_dirty_docs, 0) AS n_dirty_docs
        FROM g LEFT JOIN dd USING (bench_id)
        ORDER BY bench_id""")),

    // DSIR importance weighting (ops/Dsir.scala, Xie et al. 2023):
    // hashed unigram+bigram bucket models for target (doc_id%7==0,
    // the benchmark-ish seed) and raw (the rest); per-doc log-weight
    // = exact micro-nat integer sum of per-bucket floor'd log-ratios.
    // Oracle replays hashing, both Laplace-smoothed models, and the
    // sum bit-for-bit (ln() parity per the surprisal precedent).
    GQuery("sample_importance_weights",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dsir.importanceWeights(docs.filter(col("doc_id") % 7 =!= 0),
            docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
          .withColumnRenamed("doc", "doc_id")
          .select(col("doc_id"), col("n_feats"), col("logw"), col("mean_lr"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$dsirWeightsCte
        SELECT doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6 AS logw,
          CAST(floor(CAST(logw_u AS DOUBLE) / n_feats) AS BIGINT) AS mean_lr
        FROM w ORDER BY doc_id""")),

    // Incremental DSIR: a new ingest batch (%7≠0 ∧ %10==0) scored
    // against the PERSISTED model fitted without it — featurize the
    // batch, broadcast-join the 256-row log-ratio table, one partial
    // agg. Nothing rescans the fitted corpora; the model build is the
    // memoized offline job (dsirModelFor). The scoring-side economics
    // twin of dedup_incremental_indexed / dedup_semantic_incremental.
    GQuery("sample_importance_incremental",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dsir.scoreAgainstModel(s, dsirModelFor(s, d),
            docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 10 === 0),
            "doc_id", "text")
          .withColumnRenamed("doc", "doc_id")
          .select(col("doc_id"), col("n_feats"), col("logw"), col("mean_lr"))
          .orderBy(col("doc_id"))
      },
      Some(s"""${dsirCte("doc_id % 7 <> 0 AND doc_id % 10 <> 0",
          "f.doc_id % 7 <> 0 AND f.doc_id % 10 = 0")}
        SELECT doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6 AS logw,
          CAST(floor(CAST(logw_u AS DOUBLE) / n_feats) AS BIGINT) AS mean_lr
        FROM w ORDER BY doc_id""")),

    // The resampling half: Gumbel-top-100 over the same weights —
    // sampling ∝ w without replacement (Gumbel-top-k identity), the
    // paper's selection step with a seedless md5-derived draw. The
    // take plans as TakeOrderedAndProject (per-partition heads, no
    // global sort); oracle replays weight, draw, key and rank.
    GQuery("sample_importance_take",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        Dsir.importanceTake(
            Dsir.importanceWeights(docs.filter(col("doc_id") % 7 =!= 0),
              docs.filter(col("doc_id") % 7 === 0), "doc_id", "text"),
            n = 100)
          .withColumnRenamed("doc", "doc_id")
          .orderBy(col("rk"))
      },
      Some(s"""$dsirWeightsCte,
        keyed AS (
          SELECT doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6 AS logw,
            CAST(floor((CAST(logw_u AS DOUBLE) / 1e6
              + -ln(-ln(((${duckHex32("'dsirg:' || CAST(doc_id AS VARCHAR)")}
                  % 1000000) + 0.5) / 1e6))) * 1e6) AS BIGINT) AS key_u
          FROM w)
        SELECT doc_id, n_feats, logw,
          CAST(key_u AS DOUBLE) / 1e6 AS gumbel_key, rk FROM (
          SELECT *, CAST(row_number() OVER (
            ORDER BY key_u DESC NULLS LAST, doc_id) AS INT) AS rk
          FROM keyed)
        WHERE rk <= 100 ORDER BY rk""")),

    // End-to-end corpus curation — the flagship COMPOSITION: the
    // Gopher-style repetition gate, exact-dedup canonicalization, and
    // benchmark decontamination are each registered operators already;
    // this chains them the way a production curation run would and the
    // oracle replays the whole chain in one WITH stack. Corpus =
    // doc_id%7≠0; the %7==0 slice is the EXTERNAL benchmark — it gates
    // stage 3 but never reaches the output. Thresholds are
    // floor-micro-unit comparisons (the cross-engine contract; the
    // ratios themselves are bit-identical sequential folds both
    // engines, proven by text_repetition's hash-green row).
    GQuery("pipeline_curate",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val corpus = docs.filter(col("doc_id") % 7 =!= 0)
        val rep = TextAnalysis.repetition(corpus, "doc_id", "text")
        val kept = corpus.join(rep, "doc_id")
          .filter(floor(col("dup_trigram_ratio") * 1e6) <= 20000L &&
            floor(col("top_token_ratio") * 1e6) <= 120000L)
        val canon = kept.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val deduped = kept.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
        val dirty = Dedup.ngramOverlap(docs, "doc_id", "text", n = 5,
            benchPred = _ % 7 === 0)
          .select(col("doc").as("doc_id"))
        deduped.join(dirty, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH cor AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
        toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM cor),
        tri AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
            ELSE [] END AS tg
          FROM toks),
        trir AS (
          SELECT doc_id, CASE WHEN len(tg) > 0
            THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
            ELSE 0.0 END AS dup_trigram_ratio
          FROM tri),
        cnt AS (
          SELECT doc_id, t, count(*) AS k
          FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
        top AS (
          SELECT doc_id, max(k)::DOUBLE / sum(k) AS top_token_ratio
          FROM cnt GROUP BY doc_id),
        kept AS (
          SELECT c.doc_id, c.text, c.lang
          FROM cor c JOIN trir USING (doc_id) LEFT JOIN top USING (doc_id)
          WHERE CAST(floor(trir.dup_trigram_ratio * 1e6) AS BIGINT) <= 20000
            AND CAST(floor(COALESCE(top.top_token_ratio, 0.0) * 1e6) AS BIGINT)
                <= 120000),
        canon AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
        dd AS (SELECT kept.* FROM kept SEMI JOIN canon USING (doc_id)),
        atoks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        sh5 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS s
          FROM atoks,
            LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS i)),
        bench AS (SELECT DISTINCT s FROM sh5 WHERE doc_id % 7 = 0),
        dirty AS (
          SELECT DISTINCT doc_id FROM sh5 SEMI JOIN bench USING (s)
          WHERE doc_id % 7 <> 0)
        SELECT dd.doc_id, dd.lang,
          CAST(len(list_filter(string_split(dd.text, ' '), x -> x <> ''))
            AS INT) AS n_tokens
        FROM dd ANTI JOIN dirty USING (doc_id)
        ORDER BY doc_id""")),

    // Deletion propagation (right-to-be-forgotten) into a persisted
    // shingle index, through the READER-ISOLATED path (round-10:
    // Forget.fromShingleIndexViaRebuild — the victim-filtered fenced
    // rebuild, so concurrent probers only ever resolve a full version;
    // the in-place touched-partition rewrite remains the quiet-window
    // option, raced and proven in IndexLifecycleSpec). The oracle is
    // rebuild-without-ids LITERALLY now; it is unchanged from the
    // in-place era because the two paths' outputs provably coincide
    // for this family: a doc only contributes its own postings (n_sh
    // unchanged for survivors) and survivor dfs only DROP, so the
    // recomputed hot cap excludes nothing new.
    GQuery("forget_shingle_index",
      (s, d) => {
        // build→forget memoized per dataset dir (a forget is a
        // one-shot mutation — the same ids cannot be forgotten twice);
        // steady-state bench passes time the surviving-postings read,
        // the operator is timed once and spec-proven in LlmOpsSpec's
        // forget test. Temp dir registered with the shared shutdown
        // cleanup walk.
        ivfCleanupHook
        val idx = ivfIndexCache.computeIfAbsent(s"forget:$d", _ => {
          val corpus = Tables(s, d, "documents")
            .filter(col("doc_id") % 10 === 0)
          val p = java.nio.file.Files
            .createTempDirectory("graft_forget_idx").toString + "/index"
          // nBuckets 16 (not the 64 a full corpus uses): the fixture
          // indexes ~10% of documents, and bucket count is a pure layout
          // knob — 64 near-empty partition dirs cost file overhead per
          // bench pass without changing any posting
          Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, p,
            nBuckets = 16, maxDf = shingleMaxDf)
          val ids = corpus.filter(col("doc_id") % 20 === 0)
            .select("doc_id").collect().map(_.getLong(0)).toSeq
          val removed = Forget.fromShingleIndexViaRebuild(s, p, ids,
            nBuckets = 16, maxDf = shingleMaxDf)
          require(removed > 0L, "forget removed nothing — bad fixture")
          p
        })
        // viaRebuild converts the index to generational — resolve, never
        // read the root
        s.read.parquet(graft.sources.IndexLifecycle.resolveDir(s, idx))
          .select(col("doc"), col("s"), col("n_sh"))
          .orderBy(col("doc"), col("s"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents WHERE doc_id % 10 = 0),
        sh0 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
          FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS i)),
        hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > $shingleMaxDf),
        cf AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s)),
        nsh AS (SELECT doc_id, count(*) AS n FROM cf GROUP BY 1)
        SELECT cf.doc_id AS doc, cf.s AS s, CAST(nsh.n AS INT) AS n_sh
        FROM cf JOIN nsh USING (doc_id)
        WHERE cf.doc_id % 20 <> 0
        ORDER BY doc, s""")),

    // RTBF for the perceptual-hash index — the fourth and last index
    // family (shingle/IVF/cell/phash all now have deletion
    // propagation). Build→forget memoized per dataset dir (one-shot
    // mutation, same contract as forget_shingle_index); the oracle is
    // rebuild-without-ids over the closed-form pixel replay: survivors'
    // hashes are per-image facts, so a forget cannot move them.
    GQuery("forget_phash_index",
      (s, d) => {
        ivfCleanupHook
        val idx = ivfIndexCache.computeIfAbsent(s"forgetph:$d", _ => {
          val corpus = Multimodal.asPhashImageTable(
              Tables(s, d, "documents"))
            .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8)
          val p = java.nio.file.Files
            .createTempDirectory("graft_forget_phidx").toString + "/index"
          Multimodal.writePhashIndex(corpus, p, nBuckets = 16)
          val ids = corpus.filter(col("doc_id") % 20 === 0)
            .select("doc_id").collect().map(_.getLong(0)).toSeq
          val removed = Forget.fromPhashIndexViaRebuild(s, p, ids,
            nBuckets = 16)
          require(removed > 0L, "forget removed nothing — bad fixture")
          p
        })
        s.read.parquet(graft.sources.IndexLifecycle.resolveDir(s, idx))
          .select(col("id"), col("h"), col("b"), col("v"))
          .orderBy(col("id"), col("b"))
      },
      Some(s"""$phashBandsCte
        SELECT id, h, b, v FROM bands
        WHERE id % 10 <> 7 AND id % 10 <> 8 AND id % 20 <> 0
        ORDER BY id, b""")),

    // Streaming incremental dedup, end to end through Structured
    // Streaming (streaming/StreamingDedup foreachBatch loop): offline
    // base index over doc_id%10<>0, then two deterministic
    // micro-batches (%20==0, then %20==10) probe-then-append — batch 1
    // sees base ∪ batch 0. The run is memoized per dataset dir (the
    // stream is a fixture; per-trigger cost is benched by
    // dedup_incremental_indexed and spec-proven in CdcStreamSpec) and
    // the oracle replays both probes with the index-side hot list.
    // STREAMING CURATION — the flagship streaming composition: per
    // micro-batch, repetition gate → probe-dedup against everything
    // already ingested (offline corpus index + earlier batches'
    // appended survivors) → DSIR importance scoring against the
    // persisted model, all inside one foreachBatch
    // (StreamingDedup.attachCurate). Batch 1's output must reflect
    // batch 0's survivors both as dedup HISTORY and as absent from its
    // own rows. The oracle replays gates, the hot-list-governed
    // two-probe dedup, and the bucket-model scoring in one WITH stack.
    GQuery("streaming_curate",
      (s, d) => {
        val out = streamingCurateFor(s, d)
        s.read.parquet(out)
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(s"""WITH toksA AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        tri AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
            ELSE [] END AS tg
          FROM toksA WHERE doc_id % 20 = 0 OR doc_id % 20 = 10),
        trir AS (
          SELECT doc_id, CASE WHEN len(tg) > 0
            THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
            ELSE 0.0 END AS dtr
          FROM tri),
        cnt AS (
          SELECT doc_id, t, count(*) AS k
          FROM (SELECT doc_id, unnest(tk) AS t FROM toksA
                WHERE doc_id % 20 = 0 OR doc_id % 20 = 10)
          GROUP BY 1, 2),
        topr AS (SELECT doc_id, max(k)::DOUBLE / sum(k) AS ttr
                 FROM cnt GROUP BY 1),
        keptb AS (
          SELECT trir.doc_id FROM trir LEFT JOIN topr USING (doc_id)
          WHERE CAST(floor(trir.dtr * 1e6) AS BIGINT) <= 20000
            AND CAST(floor(COALESCE(topr.ttr, 0.0) * 1e6) AS BIGINT) <= 120000),
        sh0 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
          FROM toksA, LATERAL (SELECT unnest(generate_series(1,
            greatest(len(tk) - 2, 0))) AS i)),
        cor0 AS (SELECT * FROM sh0 WHERE doc_id % 10 <> 0),
        hot AS (SELECT s FROM cor0 GROUP BY s HAVING count(*) > $shingleMaxDf),
        cor AS (SELECT cor0.* FROM cor0 ANTI JOIN hot USING (s)),
        b0 AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s)
               SEMI JOIN keptb USING (doc_id) WHERE doc_id % 20 = 0),
        corn AS (SELECT doc_id, count(*) AS n FROM cor GROUP BY 1),
        b0n AS (SELECT doc_id, count(*) AS n FROM b0 GROUP BY 1),
        j0 AS (
          SELECT i FROM (
            SELECT a.doc_id AS i, c.doc_id AS j, count(*) AS common
            FROM b0 a JOIN cor c ON a.s = c.s GROUP BY 1, 2) p
          JOIN b0n ON b0n.doc_id = p.i JOIN corn ON corn.doc_id = p.j
          WHERE common::DOUBLE / (b0n.n + corn.n - common) >= 0.8),
        surv0 AS (
          SELECT doc_id FROM keptb ANTI JOIN
            (SELECT DISTINCT i AS doc_id FROM j0) USING (doc_id)
          WHERE doc_id % 20 = 0),
        hist AS (
          SELECT * FROM cor
          UNION ALL
          SELECT b0.* FROM b0 SEMI JOIN surv0 USING (doc_id)),
        hn AS (SELECT doc_id, count(*) AS n FROM hist GROUP BY 1),
        b1 AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s)
               SEMI JOIN keptb USING (doc_id) WHERE doc_id % 20 = 10),
        b1n AS (SELECT doc_id, count(*) AS n FROM b1 GROUP BY 1),
        j1 AS (
          SELECT i FROM (
            SELECT a.doc_id AS i, h.doc_id AS j, count(*) AS common
            FROM b1 a JOIN hist h ON a.s = h.s GROUP BY 1, 2) p
          JOIN b1n ON b1n.doc_id = p.i JOIN hn ON hn.doc_id = p.j
          WHERE common::DOUBLE / (b1n.n + hn.n - common) >= 0.8),
        surv1 AS (
          SELECT doc_id FROM keptb ANTI JOIN
            (SELECT DISTINCT i AS doc_id FROM j1) USING (doc_id)
          WHERE doc_id % 20 = 10),
        uni AS (SELECT doc_id, unnest(tk) AS g FROM toksA),
        bi AS (
          SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
          FROM toksA, LATERAL (SELECT unnest(generate_series(1,
            greatest(len(tk) - 1, 0))) AS i)),
        feats AS (
          SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        tf AS (SELECT bk, count(*) AS c FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0 GROUP BY 1),
        rf AS (SELECT bk, count(*) AS c FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0 GROUP BY 1),
        tt AS (SELECT count(*) AS n FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0),
        rt AS (SELECT count(*) AS n FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0),
        lr AS (
          SELECT sp.bk,
            CAST(floor(ln((COALESCE(tf.c, 0) + 1)::DOUBLE / (tt.n + 256)) * 1e6) AS BIGINT)
            - CAST(floor(ln((COALESCE(rf.c, 0) + 1)::DOUBLE / (rt.n + 256)) * 1e6) AS BIGINT)
              AS lr_u
          FROM range(256) sp(bk) LEFT JOIN tf USING (bk)
          LEFT JOIN rf USING (bk), tt, rt),
        w AS (
          SELECT f.doc_id, CAST(count(*) AS INT) AS n_feats,
            CAST(sum(lr.lr_u) AS BIGINT) AS logw_u
          FROM feats f JOIN lr USING (bk) GROUP BY 1)
        SELECT 0 AS batch, w.doc_id, n_feats,
          CAST(logw_u AS DOUBLE) / 1e6 AS logw
        FROM w SEMI JOIN surv0 USING (doc_id)
        UNION ALL
        SELECT 1, w.doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6
        FROM w SEMI JOIN surv1 USING (doc_id)
        ORDER BY batch, doc_id""")),

    // STREAMING MULTIMODAL CURATION — streaming_curate plus the IMAGE
    // canon (round-10): per micro-batch, repetition gate → text
    // near-dup probe against the shingle index → PERCEPTUAL image
    // probe against the phash index (a doc whose image duplicates an
    // already-curated image is cut even when its text is unique) →
    // DSIR scoring; BOTH indexes absorb the survivors so batch 1's
    // two canons see batch 0's curated docs
    // (StreamingDedup.attachCurateMm — the streaming square of
    // pipeline_train_export_mm's batch composition). The oracle
    // replays BOTH canons across both batches in one WITH stack: the
    // closed-form dHash/band pipeline (phashBandsCte), the
    // hot-list-governed two-probe text dedup, the image-history
    // growth (batch 1 probes base ∪ batch-0 survivors' bands), and
    // the bucket-model scoring. The phash fixture population is
    // chosen so the image canon provably bites (see
    // streamingCurateMmFor).
    GQuery("streaming_curate_mm",
      (s, d) => {
        val p = streamingCurateMmFor(s, d)
        s.read.parquet(s"$p/out")
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(s"""${phashBandsCteFor(1)},
        phcorp AS (
          SELECT * FROM bands WHERE id % 10 NOT IN (0, 8)
            AND (id % 10 <> 7 OR id % 40 = 27)),
        toksA AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        tri AS (
          SELECT doc_id, CASE WHEN len(tk) >= 3
            THEN list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
            ELSE [] END AS tg
          FROM toksA WHERE doc_id % 20 = 0 OR doc_id % 20 = 10),
        trir AS (
          SELECT doc_id, CASE WHEN len(tg) > 0
            THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
            ELSE 0.0 END AS dtr
          FROM tri),
        cnt AS (
          SELECT doc_id, t, count(*) AS k
          FROM (SELECT doc_id, unnest(tk) AS t FROM toksA
                WHERE doc_id % 20 = 0 OR doc_id % 20 = 10)
          GROUP BY 1, 2),
        topr AS (SELECT doc_id, max(k)::DOUBLE / sum(k) AS ttr
                 FROM cnt GROUP BY 1),
        keptb AS (
          SELECT trir.doc_id FROM trir LEFT JOIN topr USING (doc_id)
          WHERE CAST(floor(trir.dtr * 1e6) AS BIGINT) <= 20000
            AND CAST(floor(COALESCE(topr.ttr, 0.0) * 1e6) AS BIGINT) <= 120000),
        sh0 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
          FROM toksA, LATERAL (SELECT unnest(generate_series(1,
            greatest(len(tk) - 2, 0))) AS i)),
        cor0 AS (SELECT * FROM sh0 WHERE doc_id % 10 <> 0),
        hot AS (SELECT s FROM cor0 GROUP BY s HAVING count(*) > $shingleMaxDf),
        cor AS (SELECT cor0.* FROM cor0 ANTI JOIN hot USING (s)),
        b0 AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s)
               SEMI JOIN keptb USING (doc_id) WHERE doc_id % 20 = 0),
        corn AS (SELECT doc_id, count(*) AS n FROM cor GROUP BY 1),
        b0n AS (SELECT doc_id, count(*) AS n FROM b0 GROUP BY 1),
        j0 AS (
          SELECT i FROM (
            SELECT a.doc_id AS i, c.doc_id AS j, count(*) AS common
            FROM b0 a JOIN cor c ON a.s = c.s GROUP BY 1, 2) p
          JOIN b0n ON b0n.doc_id = p.i JOIN corn ON corn.doc_id = p.j
          WHERE common::DOUBLE / (b0n.n + corn.n - common) >= 0.8),
        imgd0 AS (
          SELECT DISTINCT q.id AS doc_id
          FROM phcorp c JOIN (SELECT * FROM bands WHERE id % 20 = 0) q
            ON c.b = q.b AND c.v = q.v
          WHERE bit_count(xor(c.h, q.h)) <= 1),
        surv0 AS (
          SELECT doc_id FROM keptb
          ANTI JOIN (SELECT DISTINCT i AS doc_id FROM j0) USING (doc_id)
          ANTI JOIN imgd0 USING (doc_id)
          WHERE doc_id % 20 = 0),
        hist AS (
          SELECT * FROM cor
          UNION ALL
          SELECT b0.* FROM b0 SEMI JOIN surv0 USING (doc_id)),
        hn AS (SELECT doc_id, count(*) AS n FROM hist GROUP BY 1),
        b1 AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s)
               SEMI JOIN keptb USING (doc_id) WHERE doc_id % 20 = 10),
        b1n AS (SELECT doc_id, count(*) AS n FROM b1 GROUP BY 1),
        j1 AS (
          SELECT i FROM (
            SELECT a.doc_id AS i, h.doc_id AS j, count(*) AS common
            FROM b1 a JOIN hist h ON a.s = h.s GROUP BY 1, 2) p
          JOIN b1n ON b1n.doc_id = p.i JOIN hn ON hn.doc_id = p.j
          WHERE common::DOUBLE / (b1n.n + hn.n - common) >= 0.8),
        ph1 AS (
          SELECT * FROM phcorp
          UNION ALL
          SELECT * FROM bands WHERE id IN (SELECT doc_id FROM surv0)),
        imgd1 AS (
          SELECT DISTINCT q.id AS doc_id
          FROM ph1 c JOIN (SELECT * FROM bands WHERE id % 20 = 10) q
            ON c.b = q.b AND c.v = q.v
          WHERE bit_count(xor(c.h, q.h)) <= 1),
        surv1 AS (
          SELECT doc_id FROM keptb
          ANTI JOIN (SELECT DISTINCT i AS doc_id FROM j1) USING (doc_id)
          ANTI JOIN imgd1 USING (doc_id)
          WHERE doc_id % 20 = 10),
        uni AS (SELECT doc_id, unnest(tk) AS g FROM toksA),
        bi AS (
          SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
          FROM toksA, LATERAL (SELECT unnest(generate_series(1,
            greatest(len(tk) - 1, 0))) AS i)),
        feats AS (
          SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        tf AS (SELECT bk, count(*) AS c FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0 GROUP BY 1),
        rf AS (SELECT bk, count(*) AS c FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0 GROUP BY 1),
        tt AS (SELECT count(*) AS n FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0),
        rt AS (SELECT count(*) AS n FROM feats
               WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0),
        lr AS (
          SELECT sp.bk,
            CAST(floor(ln((COALESCE(tf.c, 0) + 1)::DOUBLE / (tt.n + 256)) * 1e6) AS BIGINT)
            - CAST(floor(ln((COALESCE(rf.c, 0) + 1)::DOUBLE / (rt.n + 256)) * 1e6) AS BIGINT)
              AS lr_u
          FROM range(256) sp(bk) LEFT JOIN tf USING (bk)
          LEFT JOIN rf USING (bk), tt, rt),
        w AS (
          SELECT f.doc_id, CAST(count(*) AS INT) AS n_feats,
            CAST(sum(lr.lr_u) AS BIGINT) AS logw_u
          FROM feats f JOIN lr USING (bk) GROUP BY 1)
        SELECT 0 AS batch, w.doc_id, n_feats,
          CAST(logw_u AS DOUBLE) / 1e6 AS logw
        FROM w SEMI JOIN surv0 USING (doc_id)
        UNION ALL
        SELECT 1, w.doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6
        FROM w SEMI JOIN surv1 USING (doc_id)
        ORDER BY batch, doc_id""")),

    GQuery("streaming_dedup_pairs",
      (s, d) => {
        val pairs = streamingDedupPairsFor(s, d)
        s.read.parquet(pairs)
          .select(col("batch").cast("int").as("batch"), col("i"), col("j"),
            col("jaccard"))
          .orderBy(col("batch"), col("i"), col("j"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents),
        sh0 AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
          FROM toks, LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS i)),
        cor0 AS (SELECT * FROM sh0 WHERE doc_id % 10 <> 0),
        hot AS (SELECT s FROM cor0 GROUP BY s HAVING count(*) > $shingleMaxDf),
        cor AS (SELECT cor0.* FROM cor0 ANTI JOIN hot USING (s)),
        a AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s) WHERE doc_id % 20 = 0),
        b AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s) WHERE doc_id % 20 = 10),
        corn AS (SELECT doc_id, count(*) AS n FROM cor GROUP BY 1),
        an AS (SELECT doc_id, count(*) AS n FROM a GROUP BY 1),
        bn AS (SELECT doc_id, count(*) AS n FROM b GROUP BY 1),
        p0 AS (
          SELECT a.doc_id AS i, cor.doc_id AS j, count(*) AS common
          FROM a JOIN cor ON a.s = cor.s GROUP BY 1, 2),
        j0 AS (
          SELECT i, j, common::DOUBLE / (an.n + corn.n - common) AS jc
          FROM p0 JOIN an ON an.doc_id = i JOIN corn ON corn.doc_id = j),
        hist AS (
          SELECT * FROM cor UNION ALL SELECT * FROM a),
        hn AS (SELECT doc_id, count(*) AS n FROM hist GROUP BY 1),
        p1 AS (
          SELECT b.doc_id AS i, hist.doc_id AS j, count(*) AS common
          FROM b JOIN hist ON b.s = hist.s GROUP BY 1, 2),
        j1 AS (
          SELECT i, j, common::DOUBLE / (bn.n + hn.n - common) AS jc
          FROM p1 JOIN bn ON bn.doc_id = i JOIN hn ON hn.doc_id = j)
        SELECT CAST(0 AS INT) AS batch, i, j,
          CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS jaccard
        FROM j0 WHERE jc >= 0.8
        UNION ALL
        SELECT CAST(1 AS INT), i, j,
          CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6
        FROM j1 WHERE jc >= 0.8
        ORDER BY batch, i, j"""))
  )
}
