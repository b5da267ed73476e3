package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Duplicated-SPAN detection — the substring-level dedup of Lee et al.
  * 2022 ("Deduplicating Training Data Makes Language Models Better"):
  * document-level dedup (exact / MinHash / SimHash, [[Dedup]]) misses
  * boilerplate REGIONS repeated inside otherwise-distinct documents
  * (license headers, navigation chrome, templated intros), which is
  * where most real-corpus duplication lives. The reference
  * (a CDC demo) has nothing like it; north-star §2B scope.
  *
  * Pipeline (every stage an equi-join / partial agg — no pair joins):
  *   1. per-position k-gram fingerprints — codegen'd zipped-slice
  *     construction ([[TextAnalysis.bigramSurprisal]]'s pattern
  *     generalized to k shifted slices), md5-hashed so the shuffle key
  *     is 32 bytes however long the span text is;
  *   2. corpus span counts — ONE partial-agg'd groupBy on the hash
  *     (map-side combine; a boilerplate span's million occurrences
  *     arrive as one partial count per task, the df-cap argument);
  *   3. coverage — fingerprints equi-join the duplicated-hash set
  *     (AQE: broadcast while it fits, shuffle join at scale), then
  *     per-doc interval merge via ONE window: sorted dup positions
  *     p_i each cover min(k, p_{i+1} − p_i) tokens, the last covers k.
  *
  * Determinism: positions and counts are integers; md5 is identical in
  * both engines; the only ordering contract is the (n_occ DESC, hash)
  * top-k tie-break — all exactly replayable by the DuckDB oracle.
  */
object SpanDedup {

  /** All k-grams of a token array as "w1 w2 … wk" strings, one per
    * start position — k shifted slices zipped element-wise, codegen'd
    * end to end (NOT transform(sequence)/element_at — interpreted and
    * re-evaluates the tokenize per element; see bigramSurprisal).
    */
  def kgrams(tk: Column, k: Int): Column = {
    // clamp: a doc shorter than k has no k-gram, and ANSI slice() throws
    // on a negative length rather than returning empty
    val m = greatest(size(tk) - (k - 1), lit(0))
    val zipped = arrays_zip((1 to k).map(j => slice(tk, lit(j), m).as(s"w$j")): _*)
    transform(zipped, s => concat_ws(" ", (1 to k).map(j => s(s"w$j")): _*))
  }

  /** (doc, pos, h): md5 fingerprint of the k-gram starting at each
    * token position (0-based). Docs shorter than k tokens emit nothing.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        posexplode(kgrams(TextAnalysis.tokens(col(textCol)), k))
          .as(Seq("pos", "gram")))
      .select(col("doc"), col("pos"), md5(col("gram")).as("h"))

  /** Spans occurring ≥ `minOcc` times corpus-wide (within- OR cross-
    * document — both are training-data duplication): (h, n_occ,
    * n_docs). One partial-agg'd groupBy on the 32-byte hash.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, minOcc: Int = 2): DataFrame =
    fingerprints(docs, idCol, textCol, k)
      .groupBy("h")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc")).as("n_docs"))
      .filter(col("n_occ") >= minOcc)

  /** Per-document duplicated-span coverage: n_tokens, number of
    * positions starting a duplicated k-gram, tokens covered by the
    * union of those [pos, pos+k) intervals (ONE lead() window per doc
    * — overlapping spans merge by construction), and the covered
    * fraction — the Lee-et-al. removal signal. Documents with no
    * duplicated span (or < k tokens) report zero via the left join.
    */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String,
                   k: Int, minOcc: Int = 2): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k)
    val dup = duplicatedSpans(docs, idCol, textCol, k, minOcc).select("h")
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val perDoc = fp.join(dup, "h")
      .withColumn("cov",
        least(lit(k), coalesce(lead(col("pos"), 1).over(w) - col("pos"), lit(k))))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_dup_positions"),
        sum(col("cov")).as("covered_tokens"))
    docs
      .select(col(idCol).as("doc"),
        size(TextAnalysis.tokens(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc"), col("n_tokens"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("covered_tokens"), lit(0L)).cast("double") /
            col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  private val K = 8

  /** DuckDB k-gram stream shared by both oracles: token list → one row
    * per start position (1-based list slicing; emitted pos is 0-based
    * to match posexplode).
    */
  private def oracleGramCte(k: Int): String =
    s"""tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
        FROM documents),
      fp AS (
        SELECT doc_id, CAST(p.i - 1 AS INT) AS pos,
          md5(array_to_string(l[p.i:p.i + ${k - 1}], ' ')) AS h
        FROM tok, LATERAL (SELECT unnest(range(1, len(l) - ${k - 2})) AS i) p
        WHERE len(l) >= $k)"""

  val queries: Seq[GQuery] = Seq(

    // Top duplicated spans corpus-wide — the report a cleanup pass
    // starts from. The gram text itself stays out of the shuffle (the
    // hash is the key); the top-20 rendering re-joins nothing because
    // the hash IS the span identity here.
    GQuery("dedup_span_topk",
      (s, d) => duplicatedSpans(Tables(s, d, "documents"),
          "doc_id", "text", K)
        .orderBy(col("n_occ").desc, col("h"))
        .limit(20),
      Some(s"""WITH ${oracleGramCte(K)}
        SELECT h, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        FROM fp GROUP BY h
        HAVING count(*) >= 2
        ORDER BY n_occ DESC NULLS LAST, h LIMIT 20""")),

    // Per-document coverage — the actual removal signal (docs above a
    // dup_ratio threshold get their spans cut or are dropped).
    GQuery("dedup_span_coverage",
      (s, d) => spanCoverage(Tables(s, d, "documents"),
          "doc_id", "text", K)
        .orderBy(col("doc")),
      Some(s"""WITH ${oracleGramCte(K)},
        dup AS (
          SELECT h FROM fp GROUP BY h HAVING count(*) >= 2),
        cov AS (
          SELECT doc_id,
            count(*) AS n_dup_positions,
            CAST(sum(c) AS BIGINT) AS covered_tokens
          FROM (
            SELECT doc_id, least($K,
              coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos,
                $K)) AS c
            FROM fp JOIN dup USING (h))
          GROUP BY doc_id)
        SELECT doc_id AS doc,
          CAST(len(l) AS INT) AS n_tokens,
          coalesce(n_dup_positions, 0) AS n_dup_positions,
          coalesce(covered_tokens, 0) AS covered_tokens,
          CASE WHEN len(l) > 0
            THEN CAST(coalesce(covered_tokens, 0) AS DOUBLE) / len(l)
            ELSE 0.0 END AS dup_ratio
        FROM tok LEFT JOIN cov USING (doc_id)
        ORDER BY doc""")))
}
