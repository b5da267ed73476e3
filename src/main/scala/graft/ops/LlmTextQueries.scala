package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Text analysis: stats, quality, language id,
  * fingerprints, surprisal LMs, repetition gates, decontamination,
  * PII redaction.
  *
  * Split out of LlmQueries (round 10); all shared SQL fragments and
  * memoized fixtures live in [[LlmShared]].
  */
object LlmTextQueries {

  import LlmShared._

  val queries: Seq[GQuery] = Seq(

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
        ORDER BY bench_id"""))
  )
}
