package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Shared constants, DuckDB SQL fragments and build-once temp fixtures
  * for the LLM-pipeline driver registry (split out of LlmQueries,
  * round 10). Everything here is `private[ops]`-scoped via the object.
  */
private[ops] object LlmShared {

  /** Document-frequency cap for shingle postings — mirrored between the
    * Spark side (Dedup.invertedIndex maxDf broadcast anti-join) and the
    * oracle's hot/ANTI JOIN CTE. 5 is active on the sf0.01 corpus (max
    * df there is 7) while keeping every genuine near-dup pair.
    */
  val shingleMaxDf = 5

  /** DuckDB rendering of Dedup.md5Hash32 / the md5-derived 32-bit token
    * hash: first 8 hex chars of md5($e) as a BIGINT via the per-char
    * polynomial (DuckDB has no conv()).
    */
  def duckHex32(e: String): String =
    "CAST(list_sum(list_transform(range(8), k -> " +
      s"CAST(strpos('0123456789abcdef', md5($e)[1+k]) - 1 AS BIGINT) " +
      "* (1::BIGINT << CAST(4*(7-k) AS INT)))) AS BIGINT)"

  /** Sampling.hashOrder60's DuckDB rendering: md5 hex chars 1-8 and
    * 9-16 as two 32-bit words fused hi·2²⁸ + (lo mod 2²⁸).
    */
  def duckHex60(e: String): String = {
    def word(off: Int) =
      "CAST(list_sum(list_transform(range(8), k -> " +
        s"CAST(strpos('0123456789abcdef', md5($e)[$off+k]) - 1 AS BIGINT) " +
        "* (1::BIGINT << CAST(4*(7-k) AS INT)))) AS BIGINT)"
    s"(${word(1)} * 268435456 + ${word(9)} % 268435456)"
  }

  // All build-once fixtures below are memoized through
  // graft.util.TempFixtures (round-10 migration): one shared cache with
  // shutdown cleanup, and a THROWING build neither caches a half-built
  // path nor leaks its temp dir — the contract the old per-file
  // ConcurrentHashMap + cleanup-hook copies only approximated.

  /** One persisted shingle index per dataset dir per JVM (the corpus
    * side of incremental dedup, built by an "offline job" once): the
    * registered query times the PROBE path, which is what runs per
    * ingest.
    */
  def shingleIndexFor(datasetDir: String,
                      corpus: org.apache.spark.sql.DataFrame): String =
    graft.util.TempFixtures.dir(s"shingle:$datasetDir") { idx =>
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
    }

  /** The generational shingle index BOTH dedup_jaccard_at and the
    * pinned train export probe: corpus %10≠0 at v2 ([base]), the
    * %20==0 slice appended after the pin (v3). Memoized once per
    * dataset dir.
    */
  def jaccardAtIndexFor(s: org.apache.spark.sql.SparkSession,
                        datasetDir: String): String =
    graft.util.TempFixtures.dir(s"jacat:$datasetDir") { p =>
      val docs = Tables(s, datasetDir, "documents")
      Dedup.writeShingleIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, p, maxDf = shingleMaxDf)
      // convert publishes v1 (flat content), rebuild publishes v2
      // (fresh base dir) — the version the probes pin
      Dedup.rebuildShingleIndex(s, p)
      Dedup.appendToShingleIndex(s, p,
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 3, ingestTag = "b0") // v3: [base, b0]
    }

  /** The pinned train export's image-canon index: corpus %10≠0 images
    * banded at maxDist=1 (the canon-fixture banding — the synthetic
    * gradients are low-entropy, hamming≤3 coincidences between
    * unrelated eids would starve any survivors-of-the-canon output),
    * generational at v2 = [base]. Memoized once per dataset dir.
    */
  def exportPhashIndexFor(s: org.apache.spark.sql.SparkSession,
                          datasetDir: String): String =
    graft.util.TempFixtures.dir(s"exphash:$datasetDir") { p =>
      val imgs = Multimodal.asPhashImageTable(Tables(s, datasetDir, "documents"))
      // corpus excludes the %20∈{7,8} planted partners: every %10==0
      // batch image has an exact copy at +7 and a tweak at +8, so a
      // corpus with ALL partners present drops the ENTIRE batch (the
      // canon starves to zero output — measured). Keeping only the
      // %20∈{17,18} half makes the image canon bite on exactly the
      // %20==10 batch half while the %20==0 half survives it.
      Multimodal.writePhashIndex(imgs.filter(col("doc_id") % 10 =!= 0 &&
          col("doc_id") % 20 =!= 7 && col("doc_id") % 20 =!= 8),
        p, maxDist = 1)
      Multimodal.rebuildPhashIndex(s, p) // v1 convert, v2 fresh base
    }

  /** The unified-export-manifest fixture (pipeline_train_export_replay):
    * builds PRIVATE copies of the export inputs — a generational batch
    * table (g1 = the %10==0 slice) and the text/image canon indexes
    * (each rebuilt once, pinned at v2 = [base]) — commits ONE export
    * manifest over all three via [[TrainExport.commit]], then mutates
    * EVERY input with both an append and a reader-grace-deferred
    * forget, so a replay that resolved any input to CURRENT state
    * would read a different population (the %10==5 table rows, the
    * %20==0 text segment, the %20==7 planted image partners) and
    * hash-mismatch. Returns the committed export dir; the registered
    * query replays from the manifest alone. Indexes are private, not
    * the shared jacat/exphash fixtures: this fixture FORGETS, and
    * pinned fixtures must never share an index with a forgetting one.
    */
  /** The data contract the standard export commits under: the shape
    * invariants of the StandardRecipe output a trainer depends on.
    * Shared with the pipeline_train_export_contract audit oracle.
    */
  def trainExportContract: Seq[Validate.Check] = Seq(
    Validate.NotNull("doc_id"),
    Validate.Unique(Seq("doc_id")),
    Validate.InSet("split", Seq("train", "valid")),
    Validate.InRange("shard", 0.0, 3.0),
    Validate.InRange("pos", 0.0, 1e9))

  def trainExportReplayFor(s: org.apache.spark.sql.SparkSession,
                           datasetDir: String): String =
    graft.util.TempFixtures.dir(s"exreplay:$datasetDir") { p =>
      // defers every physical scrub far past this JVM's reads; pruning
      // only runs during the mutations below, so nothing expires later
      val grace = 600000L
      val docs = Tables(s, datasetDir, "documents")
      val imgs = Multimodal.asPhashImageTable(docs)
      graft.sources.Compaction.writeGen(
        docs.filter(col("doc_id") % 10 === 0), s"$p/docs") // g1: the pin
      Dedup.writeShingleIndex(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, s"$p/text", maxDf = shingleMaxDf)
      Dedup.rebuildShingleIndex(s, s"$p/text") // v1 convert, v2 = [base]
      Multimodal.writePhashIndex(imgs.filter(col("doc_id") % 10 =!= 0 &&
          col("doc_id") % 20 =!= 7 && col("doc_id") % 20 =!= 8),
        s"$p/img", maxDist = 1)
      Multimodal.rebuildPhashIndex(s, s"$p/img") // v2 = [base]
      TrainExport.commit(s, s"$p/export", TrainExport.StandardRecipe,
        params = Map("keepBps" -> "7000", "n" -> "3", "threshold" -> "0.8",
          "maxDist" -> "1", "trainBps" -> "9500", "numShards" -> "4",
          "splitSalt" -> "rsp", "shardSalt" -> "rsh"),
        tables = Map("docs" -> s"$p/docs"),
        indexes = Map("text" -> s"$p/text", "image" -> s"$p/img"),
        // the export's data contract: gates this commit, rides the
        // manifest, and is what pipeline_train_export_contract audits
        contract = trainExportContract)
      // mutate EVERY input — append AND forget — after the commit
      graft.sources.Compaction.writeGen(
        docs.filter(col("doc_id") % 10 === 0 || col("doc_id") % 10 === 5),
        s"$p/docs", readerGraceMs = grace) // g2: appended rows
      graft.sources.Compaction.forgetRows(s, s"$p/docs",
        col("doc_id") % 40 === 0, readerGraceMs = grace) // g3: forgotten
      Dedup.appendToShingleIndex(s, s"$p/text",
        docs.filter(col("doc_id") % 20 === 0), "doc_id", "text", n = 3,
        ingestTag = "b0") // v3
      Forget.fromShingleIndexViaRebuild(s, s"$p/text", Seq(3L, 13L, 23L),
        readerGraceMs = grace) // v4
      Multimodal.appendToPhashIndex(s, s"$p/img",
        imgs.filter(col("doc_id") % 20 === 7), "b0", maxDist = 1) // v3
      Forget.fromPhashIndexViaRebuild(s, s"$p/img", Seq(11L, 31L),
        readerGraceMs = grace) // v4
    } + "/export"

  /** The EMBEDDING-side export fixture (pipeline_train_export_embed):
    * generational vectors table (g1 = the %10==0 slice), SemDedup cell
    * index and det-IVF index each over the %10≠0 corpus (centroidEvery
    * 49 — the %50 init selects zero ids in this slice), each rebuilt
    * once so the pin is v2 = [base]. Commits the embed recipe over all
    * three, then mutates EVERY input after the commit: g2 appends the
    * %10==5 rows, and both indexes absorb the %20==0 vectors — a
    * subset of the batch itself, so an unpinned replay would
    * cos-1.0 self-drop the canon AND rank self into the ANN top-k,
    * hash-mismatching loudly either way.
    */
  def trainExportEmbedFor(s: org.apache.spark.sql.SparkSession,
                          datasetDir: String): String =
    graft.util.TempFixtures.dir(s"exembed:$datasetDir") { p =>
      val grace = 600000L
      val emb = Tables(s, datasetDir, "embeddings")
      graft.sources.Compaction.writeGen(
        emb.filter(col("vec_id") % 10 === 0), s"$p/vecs") // g1: the pin
      SemDedup.writeCellIndex(emb.filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", centroidEvery = 49, s"$p/cells")
      SemDedup.rebuildCellIndex(s, s"$p/cells", centroidEvery = 49)
      Similarity.ivfWriteIndexDet(emb.filter(col("vec_id") % 10 =!= 0),
        "vec_id", "embedding", centroidEvery = 49, indexPath = s"$p/ann")
      Similarity.rebuildIvfIndexDet(s, s"$p/ann") // v1 convert, v2 base
      TrainExport.commit(s, s"$p/export", TrainExport.EmbedRecipe,
        params = Map("threshold" -> "0.4", "k" -> "10", "nprobe" -> "4"),
        tables = Map("vecs" -> s"$p/vecs"),
        indexes = Map("cells" -> s"$p/cells", "ann" -> s"$p/ann"))
      // mutate EVERY input after the commit
      graft.sources.Compaction.writeGen(
        emb.filter(col("vec_id") % 10 === 0 || col("vec_id") % 10 === 5),
        s"$p/vecs", readerGraceMs = grace) // g2
      SemDedup.appendToCellIndex(s, s"$p/cells",
        emb.filter(col("vec_id") % 20 === 0),
        "vec_id", "embedding", ingestTag = "b0") // v3
      Similarity.ivfAppendToIndex(s, s"$p/ann",
        emb.filter(col("vec_id") % 20 === 0),
        "vec_id", "embedding", ingestTag = "b0") // v3
    } + "/export"

  /** The DuckDB replay of the two-batch streaming curation run (gate →
    * text canon with history growth → DSIR scoring) — shared by
    * `streaming_curate` (the live streamed output) and
    * `streaming_curate_export` (the drained run re-derived from pins
    * by TrainExport.replay: identical populations by construction, so
    * identical oracle).
    */
  val streamingCurateOracleSql: String = s"""WITH toksA AS (
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
    ORDER BY batch, doc_id"""

  /** The DuckDB replay of jaccardAgainstIndex over corpus %10≠0 /
    * batch %10==0 with the index-side df-cap applied to BOTH sides —
    * shared by `dedup_incremental_indexed` (live probe of the base-only
    * index) and `dedup_jaccard_at` (probe pinned to the pre-append
    * version of an index that has since absorbed more segments): both
    * reads see exactly the %10≠0 population, which is the point of the
    * pin.
    */
  val jaccardIndexedCtes: String =
    s"""toks AS (
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
          FROM pairs JOIN bcnt ca ON ca.doc_id = i JOIN ccnt cb ON cb.doc_id = j)"""

  val jaccardIndexedOracleSql: String =
    s"""WITH $jaccardIndexedCtes
        SELECT i, j, CAST(CAST(floor(jc * 1e6) AS BIGINT) AS DOUBLE) / 1e6 AS jaccard
        FROM jac WHERE jc >= 0.8 ORDER BY i, j"""

  /** One full StreamingDedup run per dataset dir per JVM: offline base
    * index (doc_id%10≠0), then two deterministic MemoryStream
    * micro-batches (%20==0, %20==10) through the foreachBatch
    * probe-then-append loop. Memoized like the shingle/IVF indexes —
    * the stream is a fixture; per-trigger economics are benched by
    * `dedup_incremental_indexed` and raced/replayed in CdcStreamSpec.
    * Returns the pairs output directory.
    */
  def streamingDedupPairsFor(s: org.apache.spark.sql.SparkSession,
                             datasetDir: String): String =
    graft.util.TempFixtures.dir(s"sdedup:$datasetDir") { root =>
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
    } + "/pairs"

  /** Streaming-curation fixture: offline shingle index + DSIR model
    * over the %10≠0 corpus, then two MemoryStream batches (%20==0,
    * %20==10) through [[graft.streaming.StreamingDedup.attachCurate]].
    * Memoized per dataset dir — the registered query times the curated
    * OUTPUT read; each stage's per-batch cost is benched by its own
    * query (text_repetition, dedup_incremental_indexed,
    * sample_importance_incremental).
    */
  def streamingCurateFor(s: org.apache.spark.sql.SparkSession,
                         datasetDir: String): String =
    graft.util.TempFixtures.dir(s"scurate:$datasetDir") { root =>
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
    } + "/out"

  /** streaming_curate with the PII scrub composed in (r14 verdict #1):
    * the same two-batch attachCurate fixture, except (a) every third
    * batch doc carries a planted distinct email span and (b) the loop
    * runs with `redactRules = Redact.StandardRules` — so the
    * repetition gate, the dedup shingles, the index appends, and the
    * DSIR features are all computed on SCRUBBED text and no raw span
    * ever reaches the survivors, the index, or the scores. The corpus
    * index and model stay built on the clean offline corpus — PII
    * arrives with the stream, the realistic shape. Returns the curated
    * output dir.
    */
  def streamingCurateRedactedFor(s: org.apache.spark.sql.SparkSession,
                                 datasetDir: String): String =
    graft.util.TempFixtures.dir(s"scuratered:$datasetDir") { root =>
      val idx = root + "/index"
      val model = root + "/model"
      val out = root + "/out"
      val docs = Tables(s, datasetDir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      Dsir.writeModel(corpus.filter(col("doc_id") % 7 =!= 0),
        corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text", model)
      // the stream's input carries PII: a distinct email span planted
      // on every third batch doc (the oracle replays plant + scrub)
      val plantedB = docs.withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com now"))).otherwise(lit(""))))
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.attachCurate(
          input.toDS().toDF("doc_id", "text"), "doc_id", "text",
          idx, model, out, n = 3, threshold = 0.8,
          redactRules = Redact.StandardRules)
        .option("checkpointLocation", root + "/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect — see
        // streamingDedupPairsFor's note
        def slice(m: Int) = plantedB.filter(col("doc_id") % 20 === m)
          .select("doc_id", "text").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
    } + "/out"

  /** The DuckDB replay of the REDACTED streaming curation: the
    * [[streamingCurateOracleSql]] stack with the batch token source
    * split out — corpus CTEs (index shingles, hot list, DSIR model)
    * tokenize the clean corpus text, batch CTEs (gate ratios, probe
    * shingles, per-doc features) tokenize the PLANTED-then-SCRUBBED
    * batch text (the exact [[Redact.StandardRules]] chain in RE2) —
    * proving scrub-before-gate end to end: both engines derive the
    * whole scrub → gate → cross-batch dedup → DSIR chain from the
    * data.
    */
  lazy val streamingCurateRedactedOracleSql: String = curateRedactedSql("")

  /** The scrubbed-curation replay, parameterized by an extra batch
    * admission predicate — `streaming_curate_redacted` uses the empty
    * filter, `streaming_ingest` injects the validation sheet's cut
    * (`AND n_chars BETWEEN 0 AND 500`): one SQL builder, so the
    * composed pipeline's oracle can never drift from the stage's.
    */
  private def curateRedactedSql(batchFilter: String): String = {
    val plantExpr = """text || CASE WHEN doc_id % 3 = 0
        THEN ' contact user' || doc_id || '@example.com now'
        ELSE '' END"""
    s"""WITH bsrc AS (
      SELECT doc_id, ${Redact.scrubSql(plantExpr)} AS text
      FROM documents
      WHERE (doc_id % 20 = 0 OR doc_id % 20 = 10)$batchFilter),
    toksC AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents),
    toksB AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM bsrc),
    tri AS (
      SELECT doc_id, CASE WHEN len(tk) >= 3
        THEN list_transform(range(1, len(tk) - 1),
               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        ELSE [] END AS tg
      FROM toksB),
    trir AS (
      SELECT doc_id, CASE WHEN len(tg) > 0
        THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
        ELSE 0.0 END AS dtr
      FROM tri),
    cnt AS (
      SELECT doc_id, t, count(*) AS k
      FROM (SELECT doc_id, unnest(tk) AS t FROM toksB)
      GROUP BY 1, 2),
    topr AS (SELECT doc_id, max(k)::DOUBLE / sum(k) AS ttr
             FROM cnt GROUP BY 1),
    keptb AS (
      SELECT trir.doc_id FROM trir LEFT JOIN topr USING (doc_id)
      WHERE CAST(floor(trir.dtr * 1e6) AS BIGINT) <= 20000
        AND CAST(floor(COALESCE(topr.ttr, 0.0) * 1e6) AS BIGINT) <= 120000),
    shC AS (
      SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
      FROM toksC, LATERAL (SELECT unnest(generate_series(1,
        greatest(len(tk) - 2, 0))) AS i)),
    shB AS (
      SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
      FROM toksB, LATERAL (SELECT unnest(generate_series(1,
        greatest(len(tk) - 2, 0))) AS i)),
    cor0 AS (SELECT * FROM shC WHERE doc_id % 10 <> 0),
    hot AS (SELECT s FROM cor0 GROUP BY s HAVING count(*) > $shingleMaxDf),
    cor AS (SELECT cor0.* FROM cor0 ANTI JOIN hot USING (s)),
    b0 AS (SELECT shB.* FROM shB ANTI JOIN hot USING (s)
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
    b1 AS (SELECT shB.* FROM shB ANTI JOIN hot USING (s)
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
    uniC AS (SELECT doc_id, unnest(tk) AS g FROM toksC),
    biC AS (
      SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
      FROM toksC, LATERAL (SELECT unnest(generate_series(1,
        greatest(len(tk) - 1, 0))) AS i)),
    featsC AS (
      SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
      FROM (SELECT * FROM uniC UNION ALL SELECT * FROM biC)),
    tf AS (SELECT bk, count(*) AS c FROM featsC
           WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0 GROUP BY 1),
    rf AS (SELECT bk, count(*) AS c FROM featsC
           WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0 GROUP BY 1),
    tt AS (SELECT count(*) AS n FROM featsC
           WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0),
    rt AS (SELECT count(*) AS n FROM featsC
           WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0),
    lr AS (
      SELECT sp.bk,
        CAST(floor(ln((COALESCE(tf.c, 0) + 1)::DOUBLE / (tt.n + 256)) * 1e6) AS BIGINT)
        - CAST(floor(ln((COALESCE(rf.c, 0) + 1)::DOUBLE / (rt.n + 256)) * 1e6) AS BIGINT)
          AS lr_u
      FROM range(256) sp(bk) LEFT JOIN tf USING (bk)
      LEFT JOIN rf USING (bk), tt, rt),
    uniB AS (SELECT doc_id, unnest(tk) AS g FROM toksB),
    biB AS (
      SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
      FROM toksB, LATERAL (SELECT unnest(generate_series(1,
        greatest(len(tk) - 1, 0))) AS i)),
    featsB AS (
      SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
      FROM (SELECT * FROM uniB UNION ALL SELECT * FROM biB)),
    w AS (
      SELECT f.doc_id, CAST(count(*) AS INT) AS n_feats,
        CAST(sum(lr.lr_u) AS BIGINT) AS logw_u
      FROM featsB f JOIN lr USING (bk) GROUP BY 1)
    SELECT 0 AS batch, w.doc_id, n_feats,
      CAST(logw_u AS DOUBLE) / 1e6 AS logw
    FROM w SEMI JOIN surv0 USING (doc_id)
    UNION ALL
    SELECT 1, w.doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6
    FROM w SEMI JOIN surv1 USING (doc_id)
    ORDER BY batch, doc_id"""
  }

  /** The streaming_ingest oracle: the scrubbed-curation replay over
    * the ADMITTED batch only (the validation sheet's n_chars cut).
    */
  lazy val streamingIngestOracleSql: String =
    curateRedactedSql(" AND n_chars BETWEEN 0 AND 500")

  /** The ONE-CALL INGEST fixture
    * ([[graft.streaming.StreamingDedup.attachIngest]]): the
    * streamingCurateRedactedFor setup with an admission sheet in
    * front — the stream carries (doc_id, text, n_chars), the sheet's
    * InRange(n_chars, 0, 500) really bites on the synthetic corpus
    * (lengths tail past 500), quarantined rows land per batch, and
    * only admitted rows are scrubbed/gated/deduped/scored. Returns
    * the fixture root (out/, quarantine/, report/ under it).
    */
  def streamingIngestFor(s: org.apache.spark.sql.SparkSession,
                         datasetDir: String): String =
    graft.util.TempFixtures.dir(s"singest:$datasetDir") { root =>
      val idx = root + "/index"
      val docs = Tables(s, datasetDir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      Dsir.writeModel(corpus.filter(col("doc_id") % 7 =!= 0),
        corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text",
        root + "/model")
      val plantedB = docs.withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com now"))).otherwise(lit(""))))
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String, Long)]
      val q = graft.streaming.StreamingDedup.attachIngest(
          input.toDS().toDF("doc_id", "text", "n_chars"),
          "doc_id", "text",
          checks = Seq(Validate.InRange("n_chars", 0.0, 500.0),
            Validate.Unique(Seq("doc_id"))),
          redactRules = Redact.StandardRules,
          indexPath = idx, modelPath = root + "/model",
          outDir = root + "/out", quarantineDir = root + "/quarantine",
          reportDir = root + "/report", n = 3, threshold = 0.8)
        .option("checkpointLocation", root + "/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect — see
        // streamingDedupPairsFor's note
        def slice(m: Int) = plantedB.filter(col("doc_id") % 20 === m)
          .select("doc_id", "text", "n_chars").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
    }

  /** The ONE-CALL MULTIMODAL INGEST fixture
    * ([[graft.streaming.StreamingDedup.attachIngestMm]], r15 verdict
    * #4): the streamingCurateMmFor setup (offline shingle index,
    * phash index over the canon-bites population, DSIR model) with an
    * admission sheet in front and the PII scrub composed in — the
    * stream carries (doc_id, text, n_chars), the sheet's
    * InRange(n_chars, 0, 500) really bites, quarantined rows land per
    * batch BEFORE the scrub or either canon sees them, planted emails
    * are scrubbed before the gate, and the image canon still cuts the
    * perceptual duplicates of already-curated images. Returns the
    * fixture root (out/, quarantine/, report/ under it).
    */
  def streamingIngestMmFor(s: org.apache.spark.sql.SparkSession,
                           datasetDir: String): String =
    graft.util.TempFixtures.dir(s"singestmm:$datasetDir") { root =>
      val idx = s"$root/shingle"
      val ph = s"$root/phash"
      val model = s"$root/model"
      val docs = Tables(s, datasetDir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      // the canon-bites population — see streamingCurateMmFor's
      // predicate comment (exact copies kept only for id ≡ 27 mod 40)
      val phPop = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 10 =!= 8 &&
        (col("doc_id") % 10 =!= 7 || col("doc_id") % 40 === 27))
      Multimodal.writePhashIndex(Multimodal.asPhashImageTable(phPop), ph,
        maxDist = 1, nBuckets = 16)
      Dsir.writeModel(corpus.filter(col("doc_id") % 7 =!= 0),
        corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text", model)
      val plantedB = docs.withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com now"))).otherwise(lit(""))))
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String, Long)]
      val q = graft.streaming.StreamingDedup.attachIngestMm(
          input.toDS().toDF("doc_id", "text", "n_chars"),
          "doc_id", "text",
          images = b => Multimodal.asPhashImageTable(b),
          checks = Seq(Validate.InRange("n_chars", 0.0, 500.0),
            Validate.Unique(Seq("doc_id"))),
          redactRules = Redact.StandardRules,
          indexPath = idx, phashIndexPath = ph, modelPath = model,
          outDir = s"$root/out", quarantineDir = s"$root/quarantine",
          reportDir = s"$root/report", n = 3, threshold = 0.8,
          maxDist = 1, phashBuckets = 16)
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect — see
        // streamingDedupPairsFor's note
        def slice(m: Int) = plantedB.filter(col("doc_id") % 20 === m)
          .select("doc_id", "text", "n_chars").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
    }

  /** The streaming MULTIMODAL curation replay, parameterized by an
    * admission predicate and an optional plant+scrub on the BATCH
    * text: `streaming_curate_mm` uses `("", scrub = false)` — raw
    * batch text, no extra cut — and `streaming_ingest_mm` injects the
    * validation sheet's cut (`AND n_chars BETWEEN 0 AND 500`) and the
    * planted-PII scrub. ONE builder, so the composed MM pipeline's
    * oracle can never drift from the stage's (the
    * [[curateRedactedSql]] discipline, applied to the MM stack):
    * corpus CTEs (index shingles, hot list, DSIR model, phash bands)
    * always derive from the clean corpus; batch CTEs (gate ratios,
    * probe shingles, per-doc features) derive from `bsrc` — the
    * admitted, optionally scrubbed batch slice.
    */
  private[ops] def curateMmSql(batchFilter: String, scrub: Boolean): String = {
    val batchText =
      if (scrub) Redact.scrubSql("""text || CASE WHEN doc_id % 3 = 0
          THEN ' contact user' || doc_id || '@example.com now'
          ELSE '' END""")
      else "text"
    s"""${phashBandsCteFor(1)},
      phcorp AS (
        SELECT * FROM bands WHERE id % 10 NOT IN (0, 8)
          AND (id % 10 <> 7 OR id % 40 = 27)),
      bsrc AS (
        SELECT doc_id, $batchText AS text
        FROM documents
        WHERE (doc_id % 20 = 0 OR doc_id % 20 = 10)$batchFilter),
      toksC AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents),
      toksB AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM bsrc),
      tri AS (
        SELECT doc_id, CASE WHEN len(tk) >= 3
          THEN list_transform(range(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
          ELSE [] END AS tg
        FROM toksB),
      trir AS (
        SELECT doc_id, CASE WHEN len(tg) > 0
          THEN 1.0 - len(list_distinct(tg))::DOUBLE / len(tg)
          ELSE 0.0 END AS dtr
        FROM tri),
      cnt AS (
        SELECT doc_id, t, count(*) AS k
        FROM (SELECT doc_id, unnest(tk) AS t FROM toksB)
        GROUP BY 1, 2),
      topr AS (SELECT doc_id, max(k)::DOUBLE / sum(k) AS ttr
               FROM cnt GROUP BY 1),
      keptb AS (
        SELECT trir.doc_id FROM trir LEFT JOIN topr USING (doc_id)
        WHERE CAST(floor(trir.dtr * 1e6) AS BIGINT) <= 20000
          AND CAST(floor(COALESCE(topr.ttr, 0.0) * 1e6) AS BIGINT) <= 120000),
      shC AS (
        SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        FROM toksC, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(tk) - 2, 0))) AS i)),
      shB AS (
        SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        FROM toksB, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(tk) - 2, 0))) AS i)),
      cor0 AS (SELECT * FROM shC WHERE doc_id % 10 <> 0),
      hot AS (SELECT s FROM cor0 GROUP BY s HAVING count(*) > $shingleMaxDf),
      cor AS (SELECT cor0.* FROM cor0 ANTI JOIN hot USING (s)),
      b0 AS (SELECT shB.* FROM shB ANTI JOIN hot USING (s)
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
      b1 AS (SELECT shB.* FROM shB ANTI JOIN hot USING (s)
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
      uniC AS (SELECT doc_id, unnest(tk) AS g FROM toksC),
      biC AS (
        SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
        FROM toksC, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(tk) - 1, 0))) AS i)),
      featsC AS (
        SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
        FROM (SELECT * FROM uniC UNION ALL SELECT * FROM biC)),
      tf AS (SELECT bk, count(*) AS c FROM featsC
             WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0 GROUP BY 1),
      rf AS (SELECT bk, count(*) AS c FROM featsC
             WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0 GROUP BY 1),
      tt AS (SELECT count(*) AS n FROM featsC
             WHERE doc_id % 10 <> 0 AND doc_id % 7 = 0),
      rt AS (SELECT count(*) AS n FROM featsC
             WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 0),
      lr AS (
        SELECT sp.bk,
          CAST(floor(ln((COALESCE(tf.c, 0) + 1)::DOUBLE / (tt.n + 256)) * 1e6) AS BIGINT)
          - CAST(floor(ln((COALESCE(rf.c, 0) + 1)::DOUBLE / (rt.n + 256)) * 1e6) AS BIGINT)
            AS lr_u
        FROM range(256) sp(bk) LEFT JOIN tf USING (bk)
        LEFT JOIN rf USING (bk), tt, rt),
      uniB AS (SELECT doc_id, unnest(tk) AS g FROM toksB),
      biB AS (
        SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
        FROM toksB, LATERAL (SELECT unnest(generate_series(1,
          greatest(len(tk) - 1, 0))) AS i)),
      featsB AS (
        SELECT doc_id, (${duckHex32("'dsir:' || g")}) % 256 AS bk
        FROM (SELECT * FROM uniB UNION ALL SELECT * FROM biB)),
      w AS (
        SELECT f.doc_id, CAST(count(*) AS INT) AS n_feats,
          CAST(sum(lr.lr_u) AS BIGINT) AS logw_u
        FROM featsB f JOIN lr USING (bk) GROUP BY 1)
      SELECT 0 AS batch, w.doc_id, n_feats,
        CAST(logw_u AS DOUBLE) / 1e6 AS logw
      FROM w SEMI JOIN surv0 USING (doc_id)
      UNION ALL
      SELECT 1, w.doc_id, n_feats, CAST(logw_u AS DOUBLE) / 1e6
      FROM w SEMI JOIN surv1 USING (doc_id)
      ORDER BY batch, doc_id"""
  }

  /** The DRAIN-EXPORT fixture (streaming_curate_export): the
    * streamingCurateFor run made exportable — the shingle index is
    * rebuilt to generational BEFORE the stream (so per-batch versions
    * exist) and the loop runs with in-loop compaction OFF
    * (maxSegments = 0, the commitStreamDrain requirement), then at
    * drain time [[TrainExport.commitStreamDrain]] snapshots the
    * streamed input as a generational table, pins one index version
    * per batch (the corpus each trigger probed) plus the
    * content-fingerprinted DSIR model, and commits the export. Every
    * input is mutated AFTER the commit (another generation, another
    * ingest segment) — the established trap: an unpinned replay would
    * read a different corpus and hash-mismatch. Returns the export dir.
    */
  def streamingCurateExportFor(s: org.apache.spark.sql.SparkSession,
                               datasetDir: String): String =
    graft.util.TempFixtures.dir(s"scurexp:$datasetDir") { root =>
      val idx = root + "/index"
      val model = root + "/model"
      val out = root + "/out"
      val docs = Tables(s, datasetDir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
        maxDf = shingleMaxDf)
      Dedup.rebuildShingleIndex(s, idx) // v1 convert, v2 = [base]
      Dsir.writeModel(corpus.filter(col("doc_id") % 7 =!= 0),
        corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text", model)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.attachCurate(
          input.toDS().toDF("doc_id", "text"), "doc_id", "text",
          idx, model, out, n = 3, threshold = 0.8,
          exportable = true) // forces in-loop compaction OFF at attach
                             // time — per-batch pins need the segment
                             // chain intact (r13 verdict #3)
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
      // drain: commit the pinned export of exactly what streamed
      val streamed = docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"), col("text")).withColumn("batch", lit(0))
        .unionByName(docs.filter(col("doc_id") % 20 === 10)
          .select(col("doc_id"), col("text")).withColumn("batch", lit(1)))
      TrainExport.commitStreamDrain(s, s"$root/export", streamed,
        s"$root/docs", idx, model, batchTags = Seq("b0", "b1"),
        n = 3, threshold = 0.8)
      // mutate every input AFTER the commit (grace defers scrubs past
      // this JVM's reads): new table generation, new ingest segment —
      // the appended %20==5 docs would perturb an unpinned probe
      graft.sources.Compaction.writeGen(
        streamed.unionByName(docs.filter(col("doc_id") % 20 === 5)
          .select(col("doc_id"), col("text")).withColumn("batch", lit(2))),
        s"$root/docs", readerGraceMs = 600000L)
      Dedup.appendToShingleIndex(s, idx,
        docs.filter(col("doc_id") % 20 === 5), "doc_id", "text", n = 3,
        ingestTag = "b2")
    } + "/export"

  /** Streaming MULTIMODAL curation fixture — the attachCurate fixture
    * plus the phash image canon ([[graft.streaming.StreamingDedup
    * .attachCurateMm]]): offline shingle index + DSIR model over the
    * %10≠0 corpus, an offline PHASH index over a corpus slice chosen so
    * the image canon visibly bites (see the predicate comment), then
    * the same two MemoryStream batches. Memoized per dataset dir via
    * TempFixtures (throwing builds neither cache nor leak).
    */
  def streamingCurateMmFor(s: org.apache.spark.sql.SparkSession,
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
  def dedupClustersFor(s: org.apache.spark.sql.SparkSession,
                       datasetDir: String): String =
    graft.util.TempFixtures.dir(s"clusters:$datasetDir") { p =>
      val docs = Tables(s, datasetDir, "documents")
      Cluster.dedupClusters(
          Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
            threshold = 0.8, maxDf = shingleMaxDf).select("i", "j"))
        .write.mode("overwrite").parquet(p)
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
  def incCcFixtureFor(s: org.apache.spark.sql.SparkSession,
                      datasetDir: String): String =
    graft.util.TempFixtures.dir(s"inccc:$datasetDir") { root =>
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
    }

  /** Shared DuckDB replay of asPhashImageTable + dhash56 —
    * `bands(id, h, b, v)` regenerated entirely from the closed-form
    * synthetic pixels (eid remap + the one-pixel tweak) — parameterized
    * by the banding
    * (`maxDist + 1` bands of `56 / (maxDist + 1)` bits — the pigeonhole
    * contract [[graft.ops.Multimodal.phashBandsOf]] implements).
    */
  def phashBandsCteFor(maxDist: Int): String = {
    val nBands = maxDist + 1
    val bandBits = 56 / nBands
    phashBandsCteRaw
      .replace("BANDBITS", bandBits.toString)
      .replace("BANDMASK", ((1L << bandBits) - 1).toString)
      .replace("NBANDS", nBands.toString)
  }

  val phashBandsCteRaw =
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

  val phashBandsCte = phashBandsCteFor(3)

  /** One persisted phash index per dataset dir per JVM — the offline
    * image-index build, same memoize-and-cleanup story as the
    * shingle/cell/IVF indexes: the registered query times the PROBE.
    */
  def phashIndexFor(s: org.apache.spark.sql.SparkSession,
                    datasetDir: String): String =
    graft.util.TempFixtures.dir(s"phash:$datasetDir") { idx =>
      Multimodal.writePhashIndex(
        Multimodal.asPhashImageTable(Tables(s, datasetDir, "documents"))
          .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8),
        idx)
    }

  def ivfIndexFor(datasetDir: String,
                  emb: org.apache.spark.sql.DataFrame): String =
    graft.util.TempFixtures.dir(s"ivf:$datasetDir") { idx =>
      Similarity.ivfWriteIndex(emb, "vec_id", "embedding", idx, maxFit = 500L)
    }

  val shingleCte =
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
  def dsirCte(rawPred: String, scorePred: String) =
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

  val dsirWeightsCte =
    dsirCte("doc_id % 7 <> 0", "f.doc_id % 7 <> 0")

  /** One persisted DSIR model per dataset dir per JVM (the offline fit
    * over target=%7==0 / already-ingested raw=%7≠0∧%10≠0) — same
    * memoize-and-cleanup story as the shingle/cell indexes: the
    * registered query times the per-batch SCORING path, which is what
    * runs per ingest at 100 TB.
    */
  def dsirModelFor(s: org.apache.spark.sql.SparkSession,
                   datasetDir: String): String =
    graft.util.TempFixtures.dir(s"dsir:$datasetDir") { p =>
      val docs = Tables(s, datasetDir, "documents")
      Dsir.writeModel(
        docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", p)
    }

  val sqlCos =
    """list_sum(list_transform(list_zip(q.embedding, v.embedding),
      |   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      | / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |  * sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
      .stripMargin

  val sqlCosAb = sqlCos.replace("q.embedding", "a.embedding")
    .replace("v.embedding", "b.embedding")
}
