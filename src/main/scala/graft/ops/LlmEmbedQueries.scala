package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Embedding-space operators over the `embeddings` table:
  * embedding hygiene, exact/LSH near-dup, similarity search (brute,
  * int8, LSH, IVF, PQ, IVF-PQ) and the persisted IVF index.
  *
  * Split out of LlmQueries (round 10); all shared SQL fragments and
  * memoized fixtures live in [[LlmShared]].
  */
object LlmEmbedQueries {

  import LlmShared._

  val queries: Seq[GQuery] = Seq(

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

    // ANN QUALITY SELF-EVAL: recall@10 of the deterministic IVF config
    // against the exact brute-force top-k, per query — the number a
    // production deployment monitors to know its quantizer/nprobe still
    // hold as the corpus drifts (at 100 TB you run this over a sampled
    // query set on a schedule; an ANN config without a recall probe is
    // unfalsifiable). Both sides are deterministic, so the oracle
    // replays the ENTIRE evaluation — quantize→probe→rank, the exact
    // ranking, and the per-query intersection — and the recall numbers
    // themselves are hash-checked, not eyeballed.
    GQuery("sim_ann_recall",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val qs = emb.filter(col("vec_id") % 100 === 0)
        val ann = Similarity.ivfTopKDet(emb, qs, "vec_id", "embedding",
          k = 10, centroidEvery = 50, nprobe = 4).select("qid", "nid")
        val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding",
          k = 10).select("qid", "nid")
        val hits = exact.join(ann, Seq("qid", "nid"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("hits"))
        qs.select(col("vec_id").as("qid"))
          .join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"),
            (coalesce(col("hits"), lit(0L)).cast("double") / 10.0).as("recall"))
          .orderBy(col("qid"))
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
          annk AS (
            SELECT qid, nid FROM (
              SELECT qid, nid,
                row_number() OVER (PARTITION BY qid
                  ORDER BY score_u DESC NULLS LAST, nid) AS rn
              FROM (
                SELECT p.qid, a.nid,
                  CAST(floor((${sqlCos.replace("q.embedding", "x.embedding")
                    .replace("v.embedding", "y.embedding")}) * 1e6) AS BIGINT) AS score_u
                FROM p JOIN a USING (list)
                  JOIN embeddings x ON x.vec_id = p.qid
                  JOIN embeddings y ON y.vec_id = a.nid
                WHERE a.nid <> p.qid) s0) s1
            WHERE rn <= 10),
          exk AS (
            SELECT qid, nid FROM (
              SELECT q.vec_id AS qid, v.vec_id AS nid,
                row_number() OVER (PARTITION BY q.vec_id
                  ORDER BY CAST(floor($sqlCos * 1e6) AS BIGINT) DESC NULLS LAST,
                           v.vec_id) AS rn
              FROM embeddings q, embeddings v
              WHERE q.vec_id % 100 = 0 AND v.vec_id <> q.vec_id) e0
            WHERE rn <= 10),
          hits AS (
            SELECT qid, count(*) AS hits FROM (
              SELECT qid, nid FROM exk INTERSECT SELECT qid, nid FROM annk) i0
            GROUP BY qid)
          SELECT q.vec_id AS qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
            CAST(coalesce(h.hits, 0) AS DOUBLE) / 10.0 AS recall
          FROM embeddings q LEFT JOIN hits h ON h.qid = q.vec_id
          WHERE q.vec_id % 100 = 0 ORDER BY qid"""
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
        val idx = graft.util.TempFixtures.dir(s"ivfdetapp:$d") { p =>
          Similarity.ivfWriteIndexDet(emb.filter(col("vec_id") % 10 =!= 0),
            "vec_id", "embedding", centroidEvery = 49, indexPath = p)
          Similarity.ivfAppendToIndex(s, p,
            emb.filter(col("vec_id") % 20 === 0),
            "vec_id", "embedding", ingestTag = "b0")
        }
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

    // Probe PINNED to a manifest version (the ANN-retrieval family's
    // reproducible-export read, same doctrine as dedup_jaccard_at /
    // search_bm25_at): the same det index as sim_ann_ivf_det_append but
    // generational (rebuild → v2 = [base]) with the %20==0 vectors
    // appended AFTER the pin (v3). The probe pins v2, so the searched
    // corpus is the PRE-append %10≠0 population — a listing-based read
    // would ALSO rank the appended %20==0 vectors into the top-k and
    // hash-mismatch loudly. The oracle is the det_append oracle with
    // pop restricted to the base corpus. Closes the TrainExport
    // pinnability gap for ANN retrieval (VERDICT r12 #1).
    GQuery("sim_ann_ivf_at",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val idx = graft.util.TempFixtures.dir(s"ivfdetat:$d") { p =>
          Similarity.ivfWriteIndexDet(emb.filter(col("vec_id") % 10 =!= 0),
            "vec_id", "embedding", centroidEvery = 49, indexPath = p)
          // convert publishes v1 (flat content), rebuild publishes v2
          // (fresh base dir) — the version the probe pins
          Similarity.rebuildIvfIndexDet(s, p)
          Similarity.ivfAppendToIndex(s, p,
            emb.filter(col("vec_id") % 20 === 0),
            "vec_id", "embedding", ingestTag = "b0") // v3: [base, b0]
        }
        Similarity.ivfProbeIndexDetAt(s, idx, version = 2L,
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
            SELECT * FROM embeddings WHERE vec_id % 10 <> 0),
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
      })
  )
}
