package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** End-to-end curation/export compositions, batch
  * and streaming, text-only and multimodal.
  *
  * Split out of LlmQueries (round 10); all shared SQL fragments and
  * memoized fixtures live in [[LlmShared]].
  */
object LlmPipelineQueries {

  import LlmShared._

  val queries: Seq[GQuery] = Seq(

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

    // The REPRODUCIBLE training export — the capstone of the round-10
    // version-pinning work: the full multimodal export recipe with
    // both canon stages probing PERSISTED indexes PINNED at manifest
    // v2, so re-running the export later — after ingest appended more
    // segments to both indexes (the text index really does carry a
    // post-pin b0 segment here) — replays the exact same shard files.
    // Stages over the %10==0 batch: per-source quality gate (top 70%)
    // → text near-dup canon against the pinned shingle index (jaccard
    // ≥ 0.8, index-side hot cap both sides) → perceptual image canon
    // against the pinned phash index (maxDist=1 banding — the
    // canon-fixture setting for the low-entropy synthetic gradients)
    // → deterministic 95/5 split → per-split shuffle into 4 shards
    // with dense positions. Funnel at sf0.01: 50 batch docs → 36 past
    // the gate → 6 text-dropped, 46 image-dropped → 4 exported: the
    // synthetic gradient images are LOW-ENTROPY (unrelated eids share
    // dHashes even at hamming ≤ 1), so the image canon is this
    // aggressive BY CONSTRUCTION of the test corpus — the honest
    // output, replayed exactly. The oracle replays the ENTIRE chain — both
    // banded joins, the cap, the gate, the split and the shard
    // positions — in one WITH stack; the pinned reads are what make
    // that replay well-defined while the indexes keep growing.
    GQuery("pipeline_train_export_at",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val batch = docs.filter(col("doc_id") % 10 === 0)
        val tIdx = jaccardAtIndexFor(s, d)
        val pIdx = exportPhashIndexFor(s, d)
        val scored = TextAnalysis.quality(batch, "text")
          .withColumn("score_u",
            floor(col("quality_score") * 1e6).cast("long"))
        val gated = Sampling.qualityGate(scored, "doc_id", "source",
          col("score_u"), keepBps = 7000)
        val textDrop = Dedup.jaccardAgainstIndexAt(s, tIdx, version = 2L,
            batch, "doc_id", "text", n = 3, threshold = 0.8)
          .select(col("i").as("doc_id")).distinct()
        val imgDrop = Multimodal.phashAgainstIndexAt(s, pIdx, version = 2L,
            Multimodal.asPhashImageTable(batch), maxDist = 1)
          .select(col("j").as("doc_id")).distinct()
        val kept = gated.join(textDrop, Seq("doc_id"), "left_anti")
          .join(imgDrop, Seq("doc_id"), "left_anti")
        val split = Sampling.hashSplit(kept, "doc_id", "esp",
          Seq("train" -> 9500, "valid" -> 500))
        Sampling.shuffleShards(split, "doc_id", "esh", numShards = 4,
            extraPartitionCols = Seq(col("split")))
          .select(col("doc_id"), col("split"), col("shard"), col("pos"))
          .orderBy(col("split"), col("shard"), col("pos"))
      },
      Some(s"""${phashBandsCteFor(1)},
        pcorp AS (SELECT * FROM bands
          WHERE id % 10 <> 0 AND id % 20 <> 7 AND id % 20 <> 8),
        pbat AS (SELECT * FROM bands WHERE id % 10 = 0),
        pcand AS (
          SELECT DISTINCT c.id AS i, c.h AS hi, q.id AS j, q.h AS hj
          FROM pcorp c JOIN pbat q ON c.b = q.b AND c.v = q.v),
        pdrop AS (SELECT DISTINCT j AS doc_id FROM pcand
          WHERE bit_count(xor(hi, hj)) <= 1),
        $jaccardIndexedCtes,
        tdrop AS (SELECT DISTINCT i AS doc_id FROM jac WHERE jc >= 0.8),
        q AS (SELECT doc_id, source, text,
          length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents WHERE doc_id % 10 = 0),
        sc AS (SELECT doc_id, source,
          CAST(floor(
            (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) * 1e6) AS BIGINT) AS score_u
          FROM q),
        g AS (SELECT doc_id, score_u,
          count(*) OVER (PARTITION BY source) AS n,
          row_number() OVER (PARTITION BY source
            ORDER BY score_u DESC, doc_id) AS rn
          FROM sc),
        gated AS (SELECT doc_id FROM g
          WHERE rn <= (n * 7000 + 9999) // 10000),
        kept AS (SELECT doc_id FROM gated
          ANTI JOIN tdrop USING (doc_id)
          ANTI JOIN pdrop USING (doc_id)),
        sp AS (SELECT doc_id,
          CASE WHEN ${duckHex32("'esp:' || doc_id")} % 10000 < 9500
            THEN 'train' ELSE 'valid' END AS split
          FROM kept),
        hh AS (SELECT doc_id, split,
          ${duckHex60("'esh:' || doc_id")} AS h FROM sp)
        SELECT doc_id, split, CAST(h % 4 AS INT) AS shard,
          CAST(row_number() OVER (PARTITION BY split, h % 4
            ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM hh ORDER BY split, shard, pos""")),

    // The UNIFIED EXPORT MANIFEST (round 12) — one atomically-committed
    // artifact pinning EVERY input of a training export (table
    // generation, both index manifest versions, params-sidecar
    // fingerprints, recipe id + scalar params, result row-hash), plus
    // the replay API that re-runs the recipe from the manifest ALONE.
    // The fixture commits the export, then appends to AND forgets from
    // every input (scrubs deferred by reader grace — the documented
    // logical-now/physical-later RTBF contract): a replay resolving any
    // input to current state would see the %10==5 table rows, the
    // %20==0 text segment, or the %20==7 planted image partners (which
    // would canon-drop the whole %20==0 batch half) and hash-mismatch.
    // TrainExport.replay itself verifies the replayed rows' fingerprint
    // against the committed one before returning; the oracle then
    // replays the entire pinned recipe closed-form — the same proven
    // WITH stack as pipeline_train_export_at (identical pinned
    // populations by construction), under this export's own split/shard
    // salts. Timed path = the replay: metadata validation + the pinned
    // recipe, nothing corpus-sized on the driver.
    GQuery("pipeline_train_export_replay",
      (s, d) => {
        val ex = trainExportReplayFor(s, d)
        TrainExport.replay(s, ex)
          .orderBy(col("split"), col("shard"), col("pos"))
      },
      Some(s"""${phashBandsCteFor(1)},
        pcorp AS (SELECT * FROM bands
          WHERE id % 10 <> 0 AND id % 20 <> 7 AND id % 20 <> 8),
        pbat AS (SELECT * FROM bands WHERE id % 10 = 0),
        pcand AS (
          SELECT DISTINCT c.id AS i, c.h AS hi, q.id AS j, q.h AS hj
          FROM pcorp c JOIN pbat q ON c.b = q.b AND c.v = q.v),
        pdrop AS (SELECT DISTINCT j AS doc_id FROM pcand
          WHERE bit_count(xor(hi, hj)) <= 1),
        $jaccardIndexedCtes,
        tdrop AS (SELECT DISTINCT i AS doc_id FROM jac WHERE jc >= 0.8),
        q AS (SELECT doc_id, source, text,
          length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents WHERE doc_id % 10 = 0),
        sc AS (SELECT doc_id, source,
          CAST(floor(
            (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) * 1e6) AS BIGINT) AS score_u
          FROM q),
        g AS (SELECT doc_id, score_u,
          count(*) OVER (PARTITION BY source) AS n,
          row_number() OVER (PARTITION BY source
            ORDER BY score_u DESC, doc_id) AS rn
          FROM sc),
        gated AS (SELECT doc_id FROM g
          WHERE rn <= (n * 7000 + 9999) // 10000),
        kept AS (SELECT doc_id FROM gated
          ANTI JOIN tdrop USING (doc_id)
          ANTI JOIN pdrop USING (doc_id)),
        sp AS (SELECT doc_id,
          CASE WHEN ${duckHex32("'rsp:' || doc_id")} % 10000 < 9500
            THEN 'train' ELSE 'valid' END AS split
          FROM kept),
        hh AS (SELECT doc_id, split,
          ${duckHex60("'rsh:' || doc_id")} AS h FROM sp)
        SELECT doc_id, split, CAST(h % 4 AS INT) AS shard,
          CAST(row_number() OVER (PARTITION BY split, h % 4
            ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM hh ORDER BY split, shard, pos""")),

    // The export's DATA CONTRACT audited (round 13): the replay
    // fixture commits under LlmShared.trainExportContract — a
    // violating output would have ABORTED the commit (spec-pinned in
    // TrainExportSpec) — the sheet rides the manifest
    // (contract.NNN lines), and TrainExport.auditContract re-checks
    // the SHIPPED data dir against it with no recipe execution and no
    // pins touched: the integrity audit a consumer runs before
    // training on an artifact it did not produce. The oracle
    // re-derives the committed output closed-form (the replay stack)
    // and recomputes every report row's counts over it.
    GQuery("pipeline_train_export_contract",
      (s, d) => {
        val ex = trainExportReplayFor(s, d)
        TrainExport.auditContract(s, ex).orderBy(col("check_name"))
      },
      Some(s"""${phashBandsCteFor(1)},
        pcorp AS (SELECT * FROM bands
          WHERE id % 10 <> 0 AND id % 20 <> 7 AND id % 20 <> 8),
        pbat AS (SELECT * FROM bands WHERE id % 10 = 0),
        pcand AS (
          SELECT DISTINCT c.id AS i, c.h AS hi, q.id AS j, q.h AS hj
          FROM pcorp c JOIN pbat q ON c.b = q.b AND c.v = q.v),
        pdrop AS (SELECT DISTINCT j AS doc_id FROM pcand
          WHERE bit_count(xor(hi, hj)) <= 1),
        $jaccardIndexedCtes,
        tdrop AS (SELECT DISTINCT i AS doc_id FROM jac WHERE jc >= 0.8),
        q AS (SELECT doc_id, source, text,
          length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents WHERE doc_id % 10 = 0),
        sc AS (SELECT doc_id, source,
          CAST(floor(
            (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) * 1e6) AS BIGINT) AS score_u
          FROM q),
        g AS (SELECT doc_id, score_u,
          count(*) OVER (PARTITION BY source) AS n,
          row_number() OVER (PARTITION BY source
            ORDER BY score_u DESC, doc_id) AS rn
          FROM sc),
        gated AS (SELECT doc_id FROM g
          WHERE rn <= (n * 7000 + 9999) // 10000),
        kept AS (SELECT doc_id FROM gated
          ANTI JOIN tdrop USING (doc_id)
          ANTI JOIN pdrop USING (doc_id)),
        sp AS (SELECT doc_id,
          CASE WHEN ${duckHex32("'rsp:' || doc_id")} % 10000 < 9500
            THEN 'train' ELSE 'valid' END AS split
          FROM kept),
        hh AS (SELECT doc_id, split,
          ${duckHex60("'rsh:' || doc_id")} AS h FROM sp),
        outx AS (SELECT doc_id, split, CAST(h % 4 AS INT) AS shard,
          CAST(row_number() OVER (PARTITION BY split, h % 4
            ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
          FROM hh),
        rep AS (
          SELECT 'in_range:pos' AS check_name, 'in_range' AS kind,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN pos IS NOT NULL
                       AND (pos < 0.0 OR pos > 1000000000.0)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM outx
          UNION ALL
          SELECT 'in_range:shard', 'in_range', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN shard IS NOT NULL
                       AND (shard < 0.0 OR shard > 3.0)
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM outx
          UNION ALL
          SELECT 'in_set:split', 'in_set', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN split IS NOT NULL
                       AND split NOT IN ('train','valid')
                       THEN 1 ELSE 0 END) AS BIGINT)
            FROM outx
          UNION ALL
          SELECT 'not_null:doc_id', 'not_null', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM outx
          UNION ALL
          SELECT 'unique:doc_id', 'unique',
                 CAST(coalesce(sum(c), 0) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM outx GROUP BY doc_id) gg)
        SELECT check_name, kind, n_rows, n_violations,
               CAST(floor(n_violations * 1000000.0 / n_rows) AS BIGINT) AS violation_u,
               CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        FROM rep ORDER BY check_name""")),

    // The EMBEDDING-side export manifest, replayed (VERDICT r12 #1's
    // capstone): TrainExport.EmbedRecipe — semantic canon against the
    // PINNED cell index (SemDedup.semanticAgainstIndexAt) + ANN top-k
    // of the survivors against the PINNED det-IVF index
    // (Similarity.ivfProbeIndexDetAt) — committed over a generational
    // vectors table and both embedding-family indexes, every input
    // mutated after the commit (fixture scaladoc: an unpinned replay
    // self-drops the canon and self-ranks the ANN). The oracle replays
    // the whole pinned recipe: the shared deterministic quantizer (the
    // cell and IVF assignments coincide — same centroids, same
    // floor-micro-d2 argmin, same id tiebreak), the cos-threshold drop
    // set, and the d2-probed cosine-ranked top-10.
    GQuery("pipeline_train_export_embed",
      (s, d) => {
        val ex = trainExportEmbedFor(s, d)
        TrainExport.replay(s, ex)
          .orderBy(col("qid"), col("rn"))
      },
      Some {
        val d2vc = """list_sum(list_transform(list_zip(v.embedding, c.embedding), p ->
            (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
            * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
        val d2qc = d2vc.replace("v.embedding", "q.embedding")
        val cosxy = """list_sum(list_transform(list_zip(x.embedding, y.embedding),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(x.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))
           * sqrt(list_sum(list_transform(y.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))))"""
        s"""WITH cor AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
          bat AS (SELECT * FROM embeddings WHERE vec_id % 10 = 0),
          cents AS (SELECT vec_id AS cell, embedding FROM cor
                    WHERE vec_id % 49 = 0),
          ca AS (
            SELECT vec_id, cell FROM (
              SELECT v.vec_id, c.cell,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY CAST(floor($d2vc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.cell) AS rn
              FROM cor v, cents c) t WHERE rn = 1),
          ba AS (
            SELECT vec_id, cell FROM (
              SELECT v.vec_id, c.cell,
                row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY CAST(floor($d2vc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.cell) AS rn
              FROM bat v, cents c) t WHERE rn = 1),
          dropped AS (
            SELECT DISTINCT ba.vec_id
            FROM ba JOIN ca ON ba.cell = ca.cell
            JOIN embeddings x ON x.vec_id = ba.vec_id
            JOIN embeddings y ON y.vec_id = ca.vec_id
            WHERE CAST(floor(($cosxy) * 1e6) AS BIGINT) >= 400000),
          kept AS (SELECT bat.* FROM bat ANTI JOIN dropped USING (vec_id)),
          p AS (
            SELECT qid, list FROM (
              SELECT q.vec_id AS qid, c.cell AS list,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY CAST(floor($d2qc * 1e6) AS BIGINT) ASC NULLS LAST,
                           c.cell) AS rn
              FROM kept q, cents c) t WHERE rn <= 4),
          sc AS (
            SELECT p.qid, ca.vec_id AS nid,
              CAST(floor(($cosxy) * 1e6) AS BIGINT) AS score_u
            FROM p JOIN ca ON ca.cell = p.list
            JOIN embeddings x ON x.vec_id = p.qid
            JOIN embeddings y ON y.vec_id = ca.vec_id
            WHERE ca.vec_id <> p.qid)
          SELECT qid, nid, CAST(score_u AS DOUBLE) / 1e6 AS score, rn FROM (
            SELECT qid, nid, score_u,
              CAST(row_number() OVER (PARTITION BY qid
                ORDER BY score_u DESC NULLS LAST, nid) AS INT) AS rn
            FROM sc)
          WHERE rn <= 10 ORDER BY qid, rn"""
      }),

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
      Some(streamingCurateOracleSql)),

    // STREAMING CURATION + PII SCRUB (r14 verdict #1) — the flagship
    // loop with Redact.StandardRules composed in BEFORE the repetition
    // gate: every third batch doc carries a planted distinct email
    // span, and the gate ratios, dedup shingles, index appends, and
    // DSIR features are all computed on the SCRUBBED text (the corpus
    // index/model stay clean-offline). The oracle replays plant +
    // scrub (the exact RE2 regex chain) + gate + hot-list-governed
    // cross-batch dedup + bucket-model scoring in one WITH stack —
    // batch token CTEs over the scrubbed text, corpus CTEs over the
    // clean text. The scrub's cross-batch dedup materiality (two form
    // letters differing only in their PII span dedup ONLY after the
    // scrub canonicalizes it) is pinned by CdcStreamSpec.
    GQuery("streaming_curate_redacted",
      (s, d) => {
        val out = streamingCurateRedactedFor(s, d)
        s.read.parquet(out)
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(streamingCurateRedactedOracleSql)),

    // THE ONE-CALL PRODUCTION INGEST (StreamingDedup.attachIngest):
    // admission gate -> PII scrub -> curate, composed inside ONE
    // foreachBatch so all five artifacts (quarantine, validation
    // report, curated output, index postings, checkpoint) share one
    // batchId-keyed idempotence unit. The sheet's n_chars cut really
    // bites (the corpus length distribution tails past 500), the
    // scrub really bites (planted emails), the dedup crosses batches.
    // Oracle = the scrubbed-curation replay restricted to the
    // ADMITTED batch — one parameterized SQL builder shared with
    // streaming_curate_redacted, so the composed pipeline's oracle
    // cannot drift from the stage's.
    GQuery("streaming_ingest",
      (s, d) => {
        val root = streamingIngestFor(s, d)
        s.read.parquet(root + "/out")
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(streamingIngestOracleSql)),

    // The ingest's QUARANTINE feed: rows the admission sheet rejected,
    // per batch with reasons — proving malformed rows route out BEFORE
    // the scrub/index/scorer ever see them.
    GQuery("streaming_ingest_quarantine",
      (s, d) => {
        val root = streamingIngestFor(s, d)
        s.read.parquet(root + "/quarantine")
          .select(col("batch").cast("int").as("batch"), col("doc_id"),
            col("n_chars"), col("reasons"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some("""SELECT CAST(CASE WHEN doc_id % 20 = 0 THEN 0 ELSE 1 END AS INT)
                 AS batch,
               doc_id, n_chars, 'in_range:n_chars' AS reasons
        FROM documents
        WHERE (doc_id % 20 = 0 OR doc_id % 20 = 10)
          AND (n_chars < 0 OR n_chars > 500)
        ORDER BY batch, doc_id""")),

    // The streaming run's DRAIN EXPORT, replayed (VERDICT r12 #5): the
    // streaming_curate loop run with the chain intact, then
    // TrainExport.commitStreamDrain at drain time — a generational
    // snapshot of the streamed input, ONE pinned index version per
    // batch (exactly the corpus that batch's trigger probed, via the
    // new per-batch indexVersions pins), and the content-fingerprinted
    // DSIR model. The registered query replays the export from its
    // manifest alone after every input was mutated; the oracle is the
    // SAME WITH stack as streaming_curate — the replay re-derives the
    // streamed computation bit-for-bit, which is the whole claim.
    GQuery("streaming_curate_export",
      (s, d) => {
        val ex = streamingCurateExportFor(s, d)
        TrainExport.replay(s, ex)
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(streamingCurateOracleSql)),

    // The drain export's COMMIT half, split out (r15 verdict #6): the
    // row above times the REPLAY of the committed export; this one
    // times committing a fresh drain export over the same drained run
    // — generational input snapshot, per-batch index-version pins,
    // result fingerprint, manifest CAS, shipped data — into its own
    // temp root each invocation (the memoized fixture is never
    // mutated). Both halves are linear in drained batch count by
    // design; with them separated, BenchDiff localizes drift to the
    // half that moved instead of flagging one 2×-sized audit row.
    GQuery("streaming_curate_export_commit",
      (s, d) => {
        val root = streamingCurateExportFor(s, d).stripSuffix("/export")
        val docs = Tables(s, d, "documents")
        val streamed = docs.filter(col("doc_id") % 20 === 0)
          .select(col("doc_id"), col("text")).withColumn("batch", lit(0))
          .unionByName(docs.filter(col("doc_id") % 20 === 10)
            .select(col("doc_id"), col("text")).withColumn("batch", lit(1)))
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_scexp_commit").toString
        TrainExport.commitStreamDrain(s, tmp + "/export", streamed,
          tmp + "/docs", root + "/index", root + "/model",
          batchTags = Seq("b0", "b1"), n = 3, threshold = 0.8)
        s.read.parquet(tmp + "/export/data")
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(streamingCurateOracleSql)),

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
      Some(curateMmSql("", scrub = false))),

    // THE ONE-CALL MULTIMODAL INGEST (StreamingDedup.attachIngestMm,
    // r15 verdict #4): admission gate -> PII scrub -> text canon ->
    // IMAGE canon -> DSIR, composed inside ONE foreachBatch — six
    // artifacts (quarantine, report feed, curated output, text
    // postings, dHash bands, checkpoint) share one batchId-keyed
    // idempotence unit. The sheet's n_chars cut bites, the scrub
    // bites (planted emails), both canons bite (cross-batch text
    // dups + pre-existing perceptual image duplicates). Oracle = the
    // SAME parameterized MM builder as streaming_curate_mm with the
    // admission filter and the plant+scrub injected — the composed
    // pipeline's oracle cannot drift from the stage's.
    GQuery("streaming_ingest_mm",
      (s, d) => {
        val root = streamingIngestMmFor(s, d)
        s.read.parquet(root + "/out")
          .select(col("batch").cast("int").as("batch"),
            col("doc").as("doc_id"), col("n_feats"), col("logw"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some(curateMmSql(" AND n_chars BETWEEN 0 AND 500", scrub = true))),

    // The MM ingest's QUARANTINE feed: rows the admission sheet
    // rejected, per batch with reasons — malformed rows never reach
    // the scrub, either index, or the scorer.
    GQuery("streaming_ingest_mm_quarantine",
      (s, d) => {
        val root = streamingIngestMmFor(s, d)
        s.read.parquet(root + "/quarantine")
          .select(col("batch").cast("int").as("batch"), col("doc_id"),
            col("n_chars"), col("reasons"))
          .orderBy(col("batch"), col("doc_id"))
      },
      Some("""SELECT CAST(CASE WHEN doc_id % 20 = 0 THEN 0 ELSE 1 END AS INT)
                 AS batch,
               doc_id, n_chars, 'in_range:n_chars' AS reasons
        FROM documents
        WHERE (doc_id % 20 = 0 OR doc_id % 20 = 10)
          AND (n_chars < 0 OR n_chars > 500)
        ORDER BY batch, doc_id"""))
  )
}
