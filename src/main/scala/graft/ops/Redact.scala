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

  /** [[apply]] plus a `pii_hits` BIGINT column (total matches across
    * all rules in the ORIGINAL text) — the routing signal: a
    * quarantine-heavy deployment routes rows past a hit threshold to
    * review instead of silently scrubbing them. Still map-only.
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

  /** The redaction export recipe: scrub the pinned docs table with
    * [[StandardRules]] — committed under [[noPiiContract]] it is the
    * scrub-then-prove pipeline in one call (see
    * `pipeline_redacted_export`).
    */
  val RedactRecipe = "redact_export_v1"

  TrainExport.registerRecipe(RedactRecipe) { (s, in, p) =>
    apply(in.table("docs").select("doc_id", "text"), "text")
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
    * text.
    */
  private def scrubSql(c: String): String =
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
        FROM p ORDER BY doc_id"""))
  )
}
