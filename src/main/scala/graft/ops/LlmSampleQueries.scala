package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Training-batch construction: packing, splits,
  * mixtures, negatives, budgets, shards, gates, DSIR importance
  * resampling, plus PageRank.
  *
  * Split out of LlmQueries (round 10); all shared SQL fragments and
  * memoized fixtures live in [[LlmShared]].
  */
object LlmSampleQueries {

  import LlmShared._

  val queries: Seq[GQuery] = Seq(

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
        WHERE rk <= 100 ORDER BY rk"""))
  )
}
