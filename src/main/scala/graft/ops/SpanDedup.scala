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
    * start position.
    *
    * History: r2–r4 was transform(sequence)/element_at (interpreted,
    * re-evaluated the tokenize per element); r5 switched to k shifted
    * slices zipped element-wise — but arrays_zip/transform are
    * HigherOrderFunctions, i.e. CodegenFallback: still interpreted AND
    * a whole-stage-codegen break around the shingling stage of every
    * dedup/span query (r17 JFR: ZipWith.eval/ConcatWs.eval in the top
    * executor frames). Round 17 moves the loop into the codegen'd
    * [[graft.functions.TextKernels.tokenNgrams]] — identical output
    * (TextKernelsSpec property-checks it against the zipped-slices
    * form, including the <k-token clamp and null propagation).
    */
  def kgrams(tk: Column, k: Int): Column =
    graft.functions.TextKernels.tokenNgrams(tk, k)

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

  /** The ACTION half of Lee et al. — rewrite every document with each
    * duplicated span occurrence REMOVED except one corpus-wide
    * canonical copy (the globally smallest (doc, pos), so the choice
    * is deterministic and partition-order-free): [[spanCoverage]] says
    * where duplication lives; this produces the deduplicated corpus a
    * training run actually consumes, preserving exactly one copy of
    * each boilerplate region instead of dropping whole documents.
    *
    * Semantics (replayed exactly by the DuckDB oracle):
    *  - a k-gram start is REMOVABLE when its hash occurs ≥ `minOcc`
    *    times corpus-wide and it is not the canonical occurrence;
    *  - a token survives iff NO removable start covers it (the union
    *    of [pos, pos+k) intervals) — a canonical span's tokens can
    *    still fall to an OVERLAPPING removable span, which keeps the
    *    rule one-pass and order-free;
    *  - surviving tokens re-join with single spaces, so the output
    *    text is whitespace-normalized like every text op here (an
    *    untouched document comes back token-identical, not
    *    byte-identical, when its raw text had irregular spacing).
    *
    * Scale shape: fingerprints (map-only zipped-slice explode) → one
    * partial-agg'd groupBy on the 32-byte hash → one min(struct) agg
    * for canonicals → the removable set fans out k rows per removable
    * START (k small, set bounded by duplication, not corpus) → one
    * (doc, position) anti-join → per-doc ordered reassembly via
    * sort_array(collect_list), bounded by document length. No pair
    * joins, nothing corpus-sized on the driver.
    *
    * Returns `(doc, text, n_tokens_kept)` — `doc` from `idCol` (ids
    * must be unique), `text` rewritten. A fully-boilerplate document
    * comes back as the empty string with 0 kept tokens — route those
    * to a drop list downstream if empty docs are unwanted.
    */
  def rewriteWithoutSpans(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, minOcc: Int = 2): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k)
    val dup = duplicatedSpans(docs, idCol, textCol, k, minOcc).select("h")
    val dupFp = fp.join(dup, "h")
    // canonical occurrence per span: the tuple min — a map-side
    // partial-aggregating struct-min (the KMeansStep argmin pattern),
    // never a window over the expansion
    val canon = dupFp.groupBy("h")
      .agg(min(struct(col("doc"), col("pos"))).as("c"))
      .select(col("h"), col("c.doc").as("cdoc"), col("c.pos").as("cpos"))
    val removable = dupFp.join(canon, "h")
      .filter(!(col("doc") === col("cdoc") && col("pos") === col("cpos")))
      .select("doc", "pos")
    val covered = removable
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val rebuilt = toks.join(covered, Seq("doc", "pos"), "left_anti")
      .groupBy("doc")
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s("tok")), " ").as("__rw"),
        count(lit(1)).as("n_tokens_kept"))
    docs.select(col(idCol).as("doc"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("__rw"), lit("")).as("text"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
  }

  // ------------------------------------------------- persisted index

  /** The span-fingerprint index — the one text op that still rescanned
    * the whole corpus per run, made incremental on the
    * [[graft.sources.IndexLifecycle]] contract (the sixth family).
    * Storage unit is the per-(doc, span) occurrence count `(doc, h,
    * cnt)`, partitioned `ingest=<tag>/bucket=<pmod(hash, nBuckets)>`:
    *  - counts are ASSOCIATIVE, so a probe's corpus-wide span total is
    *    one partial-agg'd sum across segments — appending a batch is
    *    appending its partial counts, never a read-modify-write;
    *  - the doc key keeps deletion propagation exact
    *    ([[Forget.fromSpanIndex]]): dropping a doc's rows subtracts
    *    its contribution from every total, which a per-span running
    *    count could never do;
    *  - a batch's touched buckets prune the probe scan at the
    *    partition level (the IVF-probe pattern; the bucket hash is
    *    layout-only and never rendered, so xxhash64 is fine even
    *    though `h` itself stays md5 for oracle replay).
    */
  private def bucketOf(h: Column, nBuckets: Int): Column =
    pmod(xxhash64(h), lit(nBuckets)).cast("int")

  private def spanParamsSidecar(dir: String) = s"$dir/_graft_span_params"

  /** k and nBuckets are INDEX CONTRACT (the phash params doctrine): a
    * probe with a different k fingerprints grams the stored counts
    * cannot meet (every span reads as novel — silent total loss), and
    * a different bucket count prunes the wrong partitions. The build
    * persists both; append/probe/rebuild validate and fail loudly.
    */
  private def writeSpanParams(spark: org.apache.spark.sql.SparkSession,
                              dir: String, k: Int, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((k, nBuckets)).toDF("k", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(spanParamsSidecar(dir))
  }

  private def requireSpanParams(spark: org.apache.spark.sql.SparkSession,
                                dir: String, k: Int, nBuckets: Int): Unit = {
    val r = spark.read.parquet(spanParamsSidecar(dir)).head()
    val (ik, nb) = (r.getInt(0), r.getInt(1))
    require(ik == k && nb == nBuckets,
      s"span index at $dir was built with k=$ik, nBuckets=$nb — caller " +
        s"passed k=$k, nBuckets=$nBuckets; a mismatched gram size or " +
        "bucketing would silently lose duplicated spans")
  }

  def writeSpanIndex(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, indexPath: String, nBuckets: Int = 16): Unit = {
    fingerprints(docs, idCol, textCol, k)
      .groupBy(col("doc"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", bucketOf(col("h"), nBuckets))
      .withColumn("ingest", lit("base"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("ingest", "bucket")
      .parquet(indexPath)
    writeSpanParams(docs.sparkSession, indexPath, k, nBuckets)
  }

  /** Append a batch's per-(doc, span) counts under `ingest=<tag>` —
    * batchId-keyed, replay-idempotent via the sealed-segment contract.
    * Doc ids must be new to the index (the same each-doc-in-exactly-
    * one-segment contract every family's append carries).
    */
  def appendToSpanIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, batch: DataFrame,
                        idCol: String, textCol: String, k: Int,
                        ingestTag: String, nBuckets: Int = 16): Unit =
    graft.sources.IndexLifecycle.appendSegment(spark, indexPath, ingestTag) {
      (dir, tmp) =>
        requireSpanParams(spark, dir, k, nBuckets)
        fingerprints(batch, idCol, textCol, k)
          .groupBy(col("doc"), col("h"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("bucket", bucketOf(col("h"), nBuckets))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    }

  /** Fenced segment-merge rebuild: per-(doc, span) rows are already
    * the atomic storage unit, so the rebuild just collapses the
    * segment tree to `ingest=base` (distinct() guards a doc replayed
    * under two tags, the phash discipline).
    */
  def rebuildSpanIndex(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String,
                       orphanGraceMs: Long =
                         graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                       readerGraceMs: Long = 0L): Unit =
    graft.sources.IndexLifecycle.rebuild(spark, indexPath,
      orphanGraceMs, readerGraceMs)(spanRebuildClosure(spark))

  /** [[graft.sources.IndexLifecycle.maybeRebuild]] with this family's
    * build body; every param comes from the index's own sidecar. Pass
    * the same `readerGraceMs` discipline as your explicit rebuilds.
    * Returns true iff a rebuild ran.
    */
  def maybeRebuildSpanIndex(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, maxSegments: Int,
                            orphanGraceMs: Long =
                              graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                            readerGraceMs: Long = 0L): Boolean =
    graft.sources.IndexLifecycle.maybeRebuild(spark, indexPath,
      maxSegments, orphanGraceMs, readerGraceMs)(spanRebuildClosure(spark))

  /** Build body shared with [[Forget.fromSpanIndexViaRebuild]]. */
  private[graft] def spanRebuildClosure(
      spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, String, String) => Unit =
    (src, srcDir, dst) => {
      // both params come from the SOURCE dir's sidecar: k is immutable
      // across rebuilds (the stored counts ARE k-gram counts) and
      // nBuckets pins the layout probes prune by — rebuild call sites
      // can no longer silently retune either (writeSpanIndex is the
      // retune path)
      val r = spark.read.parquet(spanParamsSidecar(srcDir)).head()
      val (k, nBuckets) = (r.getAs[Int]("k"), r.getAs[Int]("n_buckets"))
      src.select(col("doc"), col("h"), col("cnt")).distinct()
        .withColumn("bucket", bucketOf(col("h"), nBuckets))
        .withColumn("ingest", lit("base"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("ingest", "bucket")
        .parquet(dst)
      writeSpanParams(spark, dst, k, nBuckets)
    }

  /** [[spanCoverage]] for a NEW batch against the PERSISTED corpus
    * index: span totals = the batch's own counts + the bucket-pruned
    * index counts, duplication threshold applied to the COMBINED
    * total (a span seen once historically and once in the batch is a
    * duplicate, exactly as the one-shot pass over corpus ∪ batch
    * would report), then the per-doc interval-merge window over the
    * batch's positions only. Per-trigger cost ∝ batch + touched index
    * partitions — the corpus text is never rescanned.
    */
  def coverageAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, batch: DataFrame,
                           idCol: String, textCol: String, k: Int,
                           minOcc: Int = 2, nBuckets: Int = 16,
                           excludeIngest: Option[String] = None): DataFrame =
    coverageProbe(spark,
      graft.sources.IndexLifecycle.resolveDir(spark, indexPath),
      segments = None, batch, idCol, textCol, k, minOcc, nBuckets,
      excludeIngest)

  /** [[coverageAgainstIndex]] PINNED to a retained manifest version —
    * the reproducible-export read for the span family, the same
    * contract as [[Dedup.jaccardAgainstIndexAt]]: historical span
    * counts come from version `v`'s recorded segment set only, so the
    * coverage report replays exactly even while appends keep landing.
    * Fails loudly outside the retention window; forgotten rows stay
    * forgotten (a forget scrubs retired dirs).
    */
  def coverageAgainstIndexAt(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String, version: Long,
                             batch: DataFrame,
                             idCol: String, textCol: String, k: Int,
                             minOcc: Int = 2,
                             nBuckets: Int = 16): DataFrame = {
    import org.apache.hadoop.fs.Path
    val m = graft.sources.IndexLifecycle.manifestAt(spark, indexPath, version)
    coverageProbe(spark, new Path(new Path(indexPath), m.dir).toString,
      segments = Some(m.segments), batch, idCol, textCol, k, minOcc,
      nBuckets, excludeIngest = None)
  }

  private def coverageProbe(spark: org.apache.spark.sql.SparkSession,
                            dir: String, segments: Option[Seq[String]],
                            batch: DataFrame,
                            idCol: String, textCol: String, k: Int,
                            minOcc: Int, nBuckets: Int,
                            excludeIngest: Option[String]): DataFrame = {
    requireSpanParams(spark, dir, k, nBuckets)
    // the batch fingerprint frame feeds the touched-bucket collect, the
    // batch-side counts AND the coverage window — one persist, caller-swept
    val fp = graft.util.Caches.own(
      fingerprints(batch, idCol, textCol, k)
        .withColumn("bucket", bucketOf(col("h"), nBuckets)))
    val touched = fp.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val idxAll = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched: _*))
    val idx0 = segments.fold(idxAll)(segs =>
      idxAll.filter(col("ingest").isin(segs: _*)))
    // segment filter = cheap replay prune; the doc-id anti-join closes
    // the rebuild-absorbed-the-tag case (see Dedup.jaccardAgainstIndex):
    // without it a replayed batch's own absorbed counts double into
    // n_occ against its live batch-side counts
    val idx = excludeIngest.fold(idx0) { t =>
      idx0.filter(col("ingest") =!= lit(t))
        .join(batch.select(col(idCol).as("doc")).distinct(),
          Seq("doc"), "left_anti")
    }
    val batchCnt = fp.groupBy("h").agg(count(lit(1)).as("cnt"))
    val dup = idx.select(col("h"), col("cnt"))
      .unionByName(batchCnt)
      .groupBy("h").agg(sum(col("cnt")).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
      .select("h")
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val perDoc = fp.join(dup, "h")
      .withColumn("cov",
        least(lit(k), coalesce(lead(col("pos"), 1).over(w) - col("pos"), lit(k))))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_dup_positions"),
        sum(col("cov")).as("covered_tokens"))
    batch
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
  private def oracleGramCte(k: Int, where: String = ""): String =
    s"""tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
        FROM documents $where),
      fp AS (
        SELECT doc_id, CAST(p.i - 1 AS INT) AS pos,
          md5(array_to_string(l[p.i:p.i + ${k - 1}], ' ')) AS h
        FROM tok, LATERAL (SELECT unnest(range(1, len(l) - ${k - 2})) AS i) p
        WHERE len(l) >= $k)"""

  /** The REWRITE replay, closed-form: plant, gram, dup set, tuple-min
    * canonicals, interval union, ordered reassembly — shared by the
    * standalone `dedup_span_rewrite` row and the export-recipe row
    * `pipeline_span_rewrite_export`, so the operator's oracle and the
    * recipe's cannot drift (the curateMmSql discipline).
    */
  private lazy val spanRewriteOracleSql: String = s"""WITH p AS (
          SELECT doc_id, text || CASE WHEN doc_id % 5 = 0
            THEN ' zlic0 zlic1 zlic2 zlic3 zlic4 zlic5 zlic6 zlic7' ||
                 ' zlic8 zlic9'
            ELSE '' END AS text
          FROM documents),
        tok AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
          FROM p),
        fp AS (
          SELECT doc_id, CAST(q.i - 1 AS INT) AS pos,
            md5(array_to_string(l[q.i:q.i + ${K - 1}], ' ')) AS h
          FROM tok, LATERAL (SELECT unnest(range(1, len(l) - ${K - 2})) AS i) q
          WHERE len(l) >= $K),
        dup AS (SELECT h FROM fp GROUP BY h HAVING count(*) >= 2),
        dfp AS (SELECT fp.* FROM fp SEMI JOIN dup USING (h)),
        canon AS (
          SELECT h, doc_id AS cdoc, pos AS cpos FROM (
            SELECT h, doc_id, pos,
              row_number() OVER (PARTITION BY h
                ORDER BY doc_id, pos) AS rn
            FROM dfp) WHERE rn = 1),
        removable AS (
          SELECT d.doc_id, d.pos FROM dfp d JOIN canon c ON d.h = c.h
          WHERE NOT (d.doc_id = c.cdoc AND d.pos = c.cpos)),
        covered AS (
          SELECT DISTINCT doc_id, pos + g.i AS pos
          FROM removable, LATERAL (SELECT unnest(range(0, $K)) AS i) g),
        toks AS (
          SELECT doc_id, CAST(q.i - 1 AS INT) AS pos, l[q.i] AS tok
          FROM tok, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) q),
        kept AS (
          SELECT toks.* FROM toks ANTI JOIN covered USING (doc_id, pos)),
        rw AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
            CAST(count(*) AS BIGINT) AS n_tokens_kept
          FROM kept GROUP BY doc_id)
        SELECT p.doc_id AS doc, md5(coalesce(rw.text, '')) AS text_md5,
          coalesce(rw.n_tokens_kept, 0) AS n_tokens_kept
        FROM p LEFT JOIN rw USING (doc_id)
        ORDER BY doc"""

  /** The span-rewrite EXPORT RECIPE (r15 verdict #2): the ACTION half
    * of Lee et al. as a reproducible training-data export —
    * [[rewriteWithoutSpans]] over the pinned `docs` table, `k` and
    * `min_occ` pinned in the manifest params (a replay with different
    * grams would be a different corpus, so they ride the same
    * provenance record as the recipe version). What a training run
    * consumes when whole-doc dropping is too blunt: every boilerplate
    * region survives exactly once corpus-wide.
    */
  val SpanRewriteRecipe = "span_rewrite_v1"

  TrainExport.registerRecipe(SpanRewriteRecipe) { (s, in, p) =>
    val k = p.getOrElse("k", sys.error(
      s"$SpanRewriteRecipe needs param 'k' (gram length)")).toInt
    val minOcc = p.getOrElse("min_occ", "2").toInt
    rewriteWithoutSpans(in.table("docs"), "doc_id", "text", k, minOcc)
  }

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
        ORDER BY doc""")),

    // The REWRITE — Lee et al.'s removal applied, not just measured:
    // every 5th doc carries a planted 10-token boilerplate suffix, so
    // its interior 8-grams are duplicated corpus-wide; the rewrite
    // must strip the whole suffix from every planted doc EXCEPT the
    // canonical occurrence's (plus whatever natural duplication the
    // synthetic corpus carries — the oracle re-derives ALL of it
    // closed-form: plant, gram, dup set, tuple-min canonicals,
    // interval union, ordered reassembly). text_md5 hash-compares the
    // REBUILT TEXT itself — replacement parity, not just counts.
    GQuery("dedup_span_rewrite",
      (s, d) => {
        val planted = Tables(s, d, "documents").withColumn("text",
          concat(col("text"), when(col("doc_id") % 5 === 0,
            lit(" zlic0 zlic1 zlic2 zlic3 zlic4 zlic5 zlic6 zlic7" +
              " zlic8 zlic9")).otherwise(lit(""))))
        rewriteWithoutSpans(planted, "doc_id", "text", K)
          .select(col("doc"), md5(col("text")).as("text_md5"),
            col("n_tokens_kept"))
          .orderBy(col("doc"))
      },
      Some(spanRewriteOracleSql)),

    // The rewrite as a COMMITTED, REPLAYABLE export (r15 verdict #2):
    // the same planted corpus published as a generational table, the
    // recipe committed over it with (k, min_occ) pinned in the
    // manifest params, and the registered query REPLAYING the export
    // from its manifest alone — same closed-form oracle as the
    // standalone row, so recipe output == operator output is proven
    // by construction, not by a second SQL stack.
    GQuery("pipeline_span_rewrite_export",
      (s, d) => {
        val ex = graft.util.TempFixtures.dir(s"spanrwexp:$d") { root =>
          graft.sources.Compaction.writeGen(
            Tables(s, d, "documents").select("doc_id", "text")
              .withColumn("text", concat(col("text"),
                when(col("doc_id") % 5 === 0,
                  lit(" zlic0 zlic1 zlic2 zlic3 zlic4 zlic5 zlic6" +
                    " zlic7 zlic8 zlic9")).otherwise(lit("")))),
            root + "/docs")
          TrainExport.commit(s, root + "/export", SpanRewriteRecipe,
            params = Map("k" -> K.toString, "min_occ" -> "2"),
            tables = Map("docs" -> (root + "/docs")),
            indexes = Map.empty)
        } + "/export"
        TrainExport.replay(s, ex)
          .select(col("doc"), md5(col("text")).as("text_md5"),
            col("n_tokens_kept"))
          .orderBy(col("doc"))
      },
      Some(spanRewriteOracleSql)),

    // Incremental span coverage against the PERSISTED fingerprint
    // index: base counts over doc_id%10≠0, one appended segment
    // (%20==0, batchId-keyed, replay-idempotent), then the %20==10
    // batch reports its Lee-et-al. coverage against the COMBINED span
    // totals (historical + its own) without rescanning any corpus
    // text. The oracle replays the one-shot pass over the union
    // population with coverage restricted to the batch — identical by
    // construction (counts are associative), which is the point: the
    // index changes the cost model, not one covered token. Fixture
    // memoized per dataset dir; the query times the probe.
    GQuery("dedup_span_incremental",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val idx = graft.util.TempFixtures.dir(s"spanidx:$d") { p =>
          writeSpanIndex(docs.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", K, p)
          appendToSpanIndex(s, p, docs.filter(col("doc_id") % 20 === 0),
            "doc_id", "text", K, ingestTag = "b0")
        }
        coverageAgainstIndex(s, idx,
            docs.filter(col("doc_id") % 20 === 10), "doc_id", "text", K)
          .orderBy(col("doc"))
      },
      Some(s"""WITH ${oracleGramCte(K,
          "WHERE doc_id % 10 <> 0 OR doc_id % 20 = 0 OR doc_id % 20 = 10")},
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
            FROM fp JOIN dup USING (h)
            WHERE doc_id % 20 = 10)
          GROUP BY doc_id)
        SELECT doc_id AS doc,
          CAST(len(l) AS INT) AS n_tokens,
          coalesce(n_dup_positions, 0) AS n_dup_positions,
          coalesce(covered_tokens, 0) AS covered_tokens,
          CASE WHEN len(l) > 0
            THEN CAST(coalesce(covered_tokens, 0) AS DOUBLE) / len(l)
            ELSE 0.0 END AS dup_ratio
        FROM tok LEFT JOIN cov USING (doc_id)
        WHERE doc_id % 20 = 10
        ORDER BY doc""")),

    // Span coverage PINNED to a manifest version (the
    // reproducible-export read, same doctrine as search_bm25_at /
    // dedup_jaccard_at): base = %10≠0 spans, rebuild publishes v2
    // ([base]), then the PROBE BATCH ITSELF (%20==10) is appended
    // (v3). The probe pins v2, so historical counts come from the
    // pre-append corpus only — a listing-based read would count the
    // batch's own appended spans a second time, pushing every batch
    // span to n_occ ≥ 2 (the whole doc reads as duplicated) and
    // hash-mismatching loudly. The pin is what the oracle verifies.
    GQuery("dedup_span_at",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val idx = graft.util.TempFixtures.dir(s"spanat:$d") { p =>
          writeSpanIndex(docs.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", K, p)
          // convert publishes v1 (flat content), rebuild v2 (fresh base)
          rebuildSpanIndex(s, p)
          appendToSpanIndex(s, p, docs.filter(col("doc_id") % 20 === 10),
            "doc_id", "text", K, ingestTag = "b0") // v3: [base, b0]
        }
        coverageAgainstIndexAt(s, idx, version = 2L,
            docs.filter(col("doc_id") % 20 === 10), "doc_id", "text", K)
          .orderBy(col("doc"))
      },
      Some(s"""WITH ${oracleGramCte(K,
          "WHERE doc_id % 10 <> 0 OR doc_id % 20 = 10")},
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
            FROM fp JOIN dup USING (h)
            WHERE doc_id % 20 = 10)
          GROUP BY doc_id)
        SELECT doc_id AS doc,
          CAST(len(l) AS INT) AS n_tokens,
          coalesce(n_dup_positions, 0) AS n_dup_positions,
          coalesce(covered_tokens, 0) AS covered_tokens,
          CASE WHEN len(l) > 0
            THEN CAST(coalesce(covered_tokens, 0) AS DOUBLE) / len(l)
            ELSE 0.0 END AS dup_ratio
        FROM tok LEFT JOIN cov USING (doc_id)
        WHERE doc_id % 20 = 10
        ORDER BY doc""")),

    // RTBF for the span index — rebuild-without-ids, fully replayable
    // because the stored fingerprint IS md5 and the per-(doc, span)
    // count is closed-form: after forgetting the %20==0 docs of a
    // %10==0 sub-corpus, the surviving rows must be byte-identical to
    // the survivors' own recomputed fingerprint counts (a doc only
    // ever contributed its own rows — the reason (doc, h, cnt) is the
    // storage unit). Build→forget memoized (one-shot mutation).
    GQuery("forget_span_index",
      (s, d) => {
        val idx = graft.util.TempFixtures.dir(s"spanforget:$d") { p =>
          val corpus = Tables(s, d, "documents")
            .filter(col("doc_id") % 10 === 0)
          writeSpanIndex(corpus, "doc_id", "text", K, p)
          val ids = corpus.filter(col("doc_id") % 20 === 0)
            .select("doc_id").collect().map(_.getLong(0)).toSeq
          // round-10: the reader-isolated path (victim-filtered fenced
          // rebuild). Oracle unchanged: (doc, h, cnt) rows are per-doc
          // facts, so in-place and via-rebuild deletions coincide.
          val removed = graft.ops.Forget.fromSpanIndexViaRebuild(s, p, ids)
          require(removed > 0L, "forget removed nothing — bad fixture")
        }
        val dir = graft.sources.IndexLifecycle.resolveDir(s, idx)
        s.read.parquet(dir)
          .select(col("doc"), col("h"), col("cnt"))
          .orderBy(col("doc"), col("h"))
      },
      Some(s"""WITH ${oracleGramCte(K, "WHERE doc_id % 10 = 0")}
        SELECT doc_id AS doc, h, CAST(count(*) AS BIGINT) AS cnt
        FROM fp WHERE doc_id % 20 <> 0
        GROUP BY doc_id, h ORDER BY doc, h""")))
}
