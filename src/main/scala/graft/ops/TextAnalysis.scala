package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §2B north-star
  * ops): quality stats, regex tokenization, document fingerprinting,
  * n-gram/stopword language ID. All pure column expressions — map-only,
  * codegen'd, no shuffle except where an aggregate is requested.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped.
    *
    * Round 17: the original `filter(split(text, " "), t => t =!= "")`
    * rendering is an ArrayFilter HOF — CodegenFallback, interpreted per
    * element, and a whole-stage-codegen break in every tokenizing query
    * (guide §4). [[graft.functions.TextKernels]] computes the identical
    * array in one codegen'd byte scan (TextKernelsSpec pins equivalence
    * property-wise; the 30+ token/shingle oracle rows pin it end-to-end).
    */
  def tokens(text: Column): Column =
    graft.functions.TextKernels.whitespaceTokens(text)

  /** Quality/statistics columns for a text column. */
  def stats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_bytes", octet_length(t))
      .withColumn("n_chars_m", length(t))
      .withColumn("token_cnt", size(tokens(t)))
      .withColumn("uniq_tokens", size(array_distinct(tokens(t))))
      .withColumn("avg_token_len",
        length(regexp_replace(t, " ", "")).cast("double") / size(tokens(t)))
      .withColumn("type_token_ratio",
        size(array_distinct(tokens(t))).cast("double") / size(tokens(t)))
  }

  /** Quality-scoring columns: punctuation / digit / stopword ratios plus
    * a composite [0,1] score. All map-only per-row arithmetic (IEEE ops
    * are bit-deterministic per row, so the oracle can reproduce them
    * exactly — no partition-order dependence like float aggregates).
    * The score multiplies three independent quality signals: low
    * punctuation, low digit density, and enough tokens to be prose.
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val chars = length(t).cast("double")
    val toks = size(tokens(t)).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[^a-zA-Z0-9 ]", "")))
      .cast("double")
    val digits = (length(t) - length(regexp_replace(t, "[0-9]", "")))
      .cast("double")
    val stops = langHits(t, langStopwords.head._2).cast("double")
    // Empty text / zero tokens would divide 0.0/0.0 → NaN (doubles dodge
    // the ANSI zero check, which only covers integral/decimal); pin the
    // empty-doc result to 0.0 and mirror the same CASE in the oracle.
    def safe(num: Column, den: Column): Column =
      when(den > 0, num / den).otherwise(lit(0.0))
    df
      .withColumn("punct_ratio", safe(punct, chars))
      .withColumn("digit_ratio", safe(digits, chars))
      .withColumn("stopword_ratio", safe(stops, toks))
      .withColumn("quality_score",
        (lit(1.0) - safe(punct, chars)) * (lit(1.0) - safe(digits, chars)) *
          least(lit(1.0), toks / lit(20.0)))
  }

  /** Rabin–Karp rolling fingerprint over the token stream: Horner's rule
    * `h := (h * B + xxhash64(token)) mod 2³¹` — explicit modular
    * arithmetic because ANSI mode (Spark 4 default) makes wrap-around
    * multiply an error. Intermediate values stay ≤ 2³¹·B < 2⁶³, so the
    * chain never overflows. Order-SENSITIVE (unlike [[fingerprint]]), so
    * reordered near-dups hash apart while identical prose hashes
    * together. Map-only; the `aggregate` HOF is interpreted but runs once
    * per document, not per pair. No DuckDB oracle (xxhash64 is
    * Spark-specific) — pinned by property specs instead.
    */
  val rollingBase = 1000003L
  val rollingMod = 1L << 31
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) =>
        pmod(acc * lit(rollingBase) + pmod(xxhash64(t), lit(rollingMod)),
          lit(rollingMod)))

  /** Oracle-portable [[rollingHash]] variant: token hash = first 8 hex
    * chars of md5 (both engines have md5; xxhash64 is Spark-only), same
    * Horner chain mod 2³¹ — so the order-sensitive fingerprint itself is
    * hash-checkable against DuckDB, not just property-tested. Use
    * [[rollingHash]] in production pipelines (xxhash64 is codegen'd and
    * ~an order of magnitude cheaper than md5 per token).
    */
  def rollingHashPortable(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) =>
        pmod(acc * lit(rollingBase) +
          pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"),
            lit(rollingMod)),
          lit(rollingMod)))

  /** BPE-ish regex token count: alpha runs, digit runs, single symbols.
    * The pattern is RE2-and-Java-regex compatible on purpose.
    */
  val tokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(tokenPattern), lit(0)))

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token set — catches shuffled/duplicated-word near-dups that an
    * exact hash misses, at hash-join cost.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Corpus-statistical quality score: average unigram surprisal
    * (negative log probability) of a document's tokens under the
    * corpus's own unigram distribution — the classic cheap
    * language-model filter (gibberish/OCR noise scores high, common
    * prose low).
    *
    * Scale design: the pipeline is (1) per-(doc, token) counts — a
    * partial-agg'd groupBy, so a stop-token's postings never land in
    * one task; (2) corpus df per token — same partial-agg pattern;
    * (3) a join on token (hot tokens stream through the probe side and
    * AQE skew-splits if needed) + a 1-row broadcast of the total; (4) a
    * per-doc sum. Determinism: each token's surprisal is floor-quantized
    * to micro-nat BIGINTs and integer-summed — exact and commutative, so
    * partition order can't perturb the result and the DuckDB oracle
    * reproduces it bit-for-bit (raw double sums would be
    * iteration-order-dependent).
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
    // Two-scan shape: the model table (corpus token frequencies) is a
    // partial-agg'd groupBy DIRECTLY off the explode — map-side combine
    // reduces each task to its distinct tokens, so the shuffle is
    // vocabulary-sized, not corpus-sized. The scoring pass re-runs the
    // explode (a scan is cheaper than a corpus-sized shuffle; the
    // earlier perDoc(doc,t) + persist rendering shuffled ~every
    // occurrence and paid a columnar cache build for a table the model
    // pass reads once — measured 2.2 s vs ~1 s for this form at sf0.1).
    // The occurrence⋈freq join broadcasts while the vocab fits and AQE
    // size-adapts to a shuffle join at 100 TB vocabularies.
    val freq = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    toks.join(freq, "t").crossJoin(broadcast(total))
      // fixed-point micro-nats via floor, NOT round/decimal-cast: Spark
      // rounds a double's shortest decimal rendering while DuckDB rounds
      // the binary value, so round() disagrees at half boundaries;
      // floor(x*1e6) is a step function both engines evaluate on the
      // identical IEEE double
      .withColumn("nlp_u",
        floor(-log(col("cnt").cast("double") / col("total")) * 1e6).cast("long"))
      .groupBy("doc")
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        // integer sum is exact/commutative; one final IEEE division
        (sum(col("nlp_u")).cast("double") /
          (count(lit(1)) * lit(1e6))).as("surprisal"))
  }

  /** Bigram-LM surprisal — the second-order refinement of
    * [[unigramSurprisal]]: average −log p(tₙ | tₙ₋₁) under the corpus's
    * own bigram model (p = bigram count / context count, contexts from
    * the same bigram stream so probabilities sum to 1 per context).
    * Catches word-salad documents whose unigram mix looks fine but
    * whose transitions are improbable.
    *
    * Same scale shape as the unigram scorer: corpus bigram/context
    * counts are partial-agg'd groupBys straight off the explode (no hot
    * pair can skew a partition — counts combine map-side), the model
    * join is tiny-on-tiny, and the per-transition surprisal is
    * floor-quantized to micro-nats and integer-summed — bit-
    * reproducible by the oracle.
    * Documents with fewer than two tokens have no transitions and drop
    * out (mirrored in the oracle).
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    // adjacent pairs via slice + arrays_zip — codegen'd end to end. The
    // first rendering (transform(sequence(1, n-1), i -> struct(
    // element_at(tk,i), element_at(tk,i+1)))) was the suite's slowest
    // stage: higher-order functions are CodegenFallback (interpreted),
    // and outside whole-stage codegen there is no common-subexpression
    // elimination, so the tokenize re-ran per element_at — measured
    // 2.3–3.5 s for the explode ALONE at sf0.1 vs ~0.2 s zipped.
    // The slice length is clamped to >= 0: n = 1 → zero-length slices →
    // empty zip → explode drops the doc (as the old size<2 guard did),
    // but n = 0 (text tokenizing to nothing) would make n - 1 NEGATIVE
    // and Spark's slice throws INVALID_PARAMETER_VALUE.LENGTH at
    // runtime instead of yielding an empty array.
    val n = size(tk)
    val m = greatest(n - 1, lit(0))
    val bigrams = df
      .select(col(idCol).as("doc"),
        explode(arrays_zip(slice(tk, lit(1), m).as("t1"),
          slice(tk, lit(2), m).as("t2"))).as("b"))
      .select(col("doc"), col("b.t1").as("t1"), col("b.t2").as("t2"))
    // Two-scan shape (same rationale as unigramSurprisal): the bigram
    // model is partial-agg'd straight off the explode (shuffle ∝
    // distinct bigram TYPES, not occurrences), the context counts and
    // per-bigram −log p are derived model-on-model (tiny), and the
    // scoring pass re-runs the explode and joins occurrences to the
    // finished model — ONE corpus-sized join key, zero corpus-sized
    // shuffles. The earlier perDoc(doc,t1,t2) + persist rendering
    // shuffled every occurrence TWICE (groupBy key, then join key) and
    // paid a columnar cache build; per-doc bigram counts barely dedup
    // occurrences (256k distinct / 266k occurrences at sf0.1), so the
    // reduction never paid for its shuffle. Summing nlp_u per
    // OCCURRENCE is the same integer sum as k·nlp_u per distinct pair.
    val c2 = bigrams.groupBy("t1", "t2").agg(count(lit(1)).as("cnt2"))
    val c1 = c2.groupBy("t1").agg(sum("cnt2").as("cnt1"))
    val model = c2.join(c1, "t1")
      .withColumn("nlp_u",
        floor(-log(col("cnt2").cast("double") / col("cnt1")) * 1e6).cast("long"))
      .select("t1", "t2", "nlp_u")
    bigrams.join(model, Seq("t1", "t2"))
      .groupBy("doc")
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        (sum(col("nlp_u")).cast("double") /
          (count(lit(1)) * lit(1e6))).as("surprisal2"))
  }

  /** Gopher-style repetition signals (the Rae et al. repetition filters
    * every pretraining pipeline applies): `dup_trigram_ratio` = fraction
    * of a document's trigrams that are repeats of an earlier trigram,
    * `top_token_ratio` = share of the document taken by its single most
    * frequent token. Template spam and boilerplate score high on both;
    * prose scores low.
    *
    * The trigram ratio is map-only (per-row array ops); the top-token
    * ratio is one partial-agg'd (doc, token) count + per-doc max — both
    * shuffles key on the doc id, so no token, however common, can skew a
    * partition (counts combine map-side).
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    // trigram strings via the codegen'd k=3 kgram kernel (r17 — the
    // previous transform(arrays_zip(slice×3)) form's lambda was a
    // CodegenFallback HOF; TokenNgrams is byte-identical, incl. the
    // sub-3-token → empty-array clamp, TextKernelsSpec). A null text
    // yields tri = null here where the old when() yielded [], but the
    // only consumer distinguishes via size(tri) > 0, and size(null) is
    // -1 (legacy sizeOfNull) or NULL (ANSI default) — BOTH fail the
    // > 0 test and take the same otherwise-branch as size([]) = 0.
    val tri = SpanDedup.kgrams(toks, 3)
    val triRatio = when(size(tri) > 0,
        lit(1.0) - size(array_distinct(tri)).cast("double") / size(tri))
      .otherwise(lit(0.0))
    val perTok = df
      .select(col(idCol).as("__id"), explode(toks).as("t"))
      .groupBy("__id", "t").agg(count(lit(1)).as("k"))
      .groupBy("__id")
      .agg((max(col("k")).cast("double") / sum(col("k"))).as("top_token_ratio"))
    df.select(col(idCol), triRatio.as("dup_trigram_ratio"))
      .join(perTok, col(idCol) === col("__id"), "left")
      .withColumn("top_token_ratio", coalesce(col("top_token_ratio"), lit(0.0)))
      .drop("__id")
  }

  /** PII redaction patterns — deliberately written in the common subset
    * of Java regex and RE2 (character classes + bounded repetition, no
    * lookaround) so the DuckDB oracle applies the IDENTICAL patterns.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipPattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val longNumPattern = "[0-9]{6,}"

  /** Redact emails, IPv4 addresses and long digit runs (account-number
    * shaped) from `textCol`, adding match counts per class and the
    * redacted text. Order matters and is part of the contract: emails
    * first (their local parts contain digits), then IPs, then bare digit
    * runs. Pure map-side `regexp_replace` — codegen'd, no shuffle, the
    * shape a 100 TB scrub pass must have.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_emails", size(regexp_extract_all(t, lit(emailPattern), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(ipPattern), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, emailPattern, "<EMAIL>"),
            ipPattern, "<IP>"),
          longNumPattern, "<NUM>"))
  }

  /** Stopword-hit language ID: score each candidate language by how many
    * tokens hit its stopword list; argmax wins, first-listed wins ties.
    * (The classic cheap heuristic; on synthetic single-vocab corpora it
    * degenerates gracefully to the tie order.)
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est", "un"),
    "es" -> Seq("el", "la", "y", "es", "un"))

  def langHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(w => w: Any): _*)))

  def langId(text: Column): Column = {
    val scored = langStopwords.map { case (lang, words) =>
      (lang, langHits(text, words))
    }
    // argmax with deterministic tie order = list order
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.reverse.foldLeft(lit(langStopwords.head._1)) { case (acc, (lang, hits)) =>
      when(hits === best, lit(lang)).otherwise(acc)
    }
  }
}
