package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{GQuery, Tables}

/** Keyword retrieval over a document corpus: BM25 top-k ranking — the
  * lexical-search half of a training-data / RAG pipeline (the dense half
  * is [[Similarity]]). The reference has no search surface at all; this
  * is north-star §2B scope.
  *
  * Scale design (the 100 TB shape):
  *   - per-doc lengths and corpus constants (N, average length) are
  *     map-only passes — size(tokens) plus a 1-row broadcast; no
  *     corpus-sized shuffle anywhere.
  *   - postings are filtered to the query terms BEFORE the explode, so
  *     the only index shuffle is ∝ the hit lists, not the corpus; the
  *     per-(doc, term) counts still combine map-side, so a stop term in
  *     a query cannot skew a partition.
  *   - the query set is tiny and broadcasts onto the postings — the only
  *     data-sized join keys on (doc), never on pairs.
  *   - a standing corpus index for repeated query batches is the
  *     [[termStats]]/[[mergeTermStats]] path (build once, MERGE per
  *     ingest batch), not a per-call rebuild.
  *
  * Determinism (oracle contract): per-(query, doc, term) partial scores
  * are computed in one fixed IEEE expression shape (identical
  * parenthesization in the DuckDB oracle), floor-quantized to micro
  * units, and summed as BIGINT — exact and commutative, so partition
  * order cannot perturb ranks. See TextAnalysis.unigramSurprisal for the
  * same fixed-point pattern.
  */
object Search {

  val k1 = 1.2
  val b = 0.75

  /** The project's one canonical tokenization — the BM25 index MUST
    * split exactly like the quality/surprisal filters over the same
    * corpus.
    */
  private def toks(text: Column): Column = TextAnalysis.tokens(text)

  /** BM25 scores for a literal query set; returns the top `k` docs per
    * query as (qid, doc_id, rn, score_u, score). `score_u` is the exact
    * micro-unit BIGINT the ranking is defined over; `score` is its
    * double rendering.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, String)], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // Ad-hoc literal queries never need the FULL inverted index (the
    // r4 rendering built and persisted per-(doc, term) tf for the whole
    // corpus — a corpus-sized shuffle plus a columnar cache build, and
    // the bench's warm 1.55 s was really the next call free-riding on
    // the previous call's cache):
    //   - per-doc length is a map-only size(tokens) — no explode, no
    //     shuffle;
    //   - postings are filtered to QUERY TERMS before the explode, so
    //     the only index shuffle is ∝ the hit lists, not the corpus.
    // The long-lived-index production path (build once, reuse across
    // query batches) remains termStats/mergeTermStats below.
    val qtermSet = qidTerms(queries).map(_._2).distinct
    val docLen = docs
      .select(col(idCol).as("doc_id"), size(toks(col(textCol))).as("len"))
      // mirror the tf-derived domain: docs with ≥ 1 token (the oracle's
      // doclen comes from tf and never sees empty docs)
      .filter(col("len") > 0)
    val stats = docLen.agg(count(lit(1)).as("n"),
      (sum(col("len")).cast("double") / count(lit(1))).as("avglen"))
    // vocabulary cut AFTER the explode, not as an array-filter HOF
    // before it: `filter(arr, lambda)` is a CodegenFallback
    // HigherOrderFunction — interpreted per element and a whole-stage
    // break around the hottest map stage (r17's TextKernels finding;
    // this site was the one surviving interpreted HOF on a >0.5 s row,
    // plans/r17/text_bm25_topk_after.txt:67). `explode` + an
    // `isInCollection` Filter is the same row set (order-preserving,
    // per-element filter commutes with explode) in one codegen span;
    // the cut still happens BEFORE the groupBy exchange, so shuffle
    // bytes are unchanged.
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("t"))
      .filter(col("t").isInCollection(qtermSet))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("t").agg(count(lit(1)).as("dft"))

    val qterms = qidTerms(queries).toDF("qid", "t")

    // one fixed IEEE expression shape — mirrored verbatim in the oracle
    val idf = log(((col("n") - col("dft")) + lit(0.5)) / (col("dft") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len") / col("avglen"))))
    val partial = floor(idf * tfn * lit(1e6)).cast("long")

    val scored = tf
      .join(broadcast(qterms), "t")
      .join(broadcast(dft), "t")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score_u", partial)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("score_u")).as("score_u"))

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("rn"),
        col("score_u"), (col("score_u").cast("double") / 1e6).as("score"))
      .orderBy(col("qid"), col("rn"))
  }

  /** DuckDB oracle for [[bm25TopK]] — generated from the same query set
    * so the two sides cannot drift. Expression shapes are verbatim
    * copies of the Spark columns above.
    */
  def bm25OracleSql(queries: Seq[(Int, String)], k: Int,
                    where: String = ""): String = {
    val qvals = qidTerms(queries)
      .map { case (qid, t) => s"($qid, '${t.replace("'", "''")}')" } // SQL-escape
      .mkString(", ")
    s"""WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        FROM documents $where),
      tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
      doclen AS (SELECT doc_id, sum(tf) AS len FROM tf GROUP BY doc_id),
      stats AS (SELECT count(*) AS n, CAST(sum(len) AS DOUBLE) / count(*) AS avglen FROM doclen),
      dft AS (SELECT t, count(*) AS dft FROM tf GROUP BY t),
      q(qid, t) AS (VALUES $qvals),
      scored AS (
        SELECT q.qid, tf.doc_id,
          CAST(sum(CAST(floor(
            ln(((n - dft) + 0.5) / (dft + 0.5) + 1.0)
            * ((tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * (len / avglen))))
            * 1e6) AS BIGINT)) AS BIGINT) AS score_u
        FROM tf
        JOIN q USING (t) JOIN dft USING (t)
        JOIN doclen USING (doc_id), stats
        GROUP BY q.qid, tf.doc_id),
      ranked AS (
        SELECT qid, doc_id,
          CAST(row_number() OVER (PARTITION BY qid
            ORDER BY score_u DESC NULLS LAST, doc_id) AS INT) AS rn,
          score_u
        FROM scored)
      SELECT qid, doc_id, rn, score_u, CAST(score_u AS DOUBLE) / 1e6 AS score
      FROM ranked WHERE rn <= $k ORDER BY qid, rn"""
  }

  /** Per-term index statistics (document frequency + total term
    * frequency) for one batch of documents — the mergeable unit of
    * incremental index maintenance.
    */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      .groupBy("t").agg(count(lit(1)).as("dft"), sum(col("tf")).as("tf_total"))

  /** Merge a batch's term stats into an existing index: counts ADD
    * (documents are append-only in an ingest pipeline, so a term's df
    * and tf contributions from disjoint batches are independent). This
    * is the index-side analogue of Materialize.maintainAggregate — at
    * scale the merged table is a stored partial aggregate updated per
    * ingest batch (foreachBatch MERGE), never a corpus rebuild; cost is
    * ∝ the batch, not the corpus.
    */
  def mergeTermStats(index: DataFrame, batch: DataFrame): DataFrame =
    index.unionByName(batch)
      .groupBy("t")
      .agg(sum(col("dft")).as("dft"), sum(col("tf_total")).as("tf_total"))

  // -------------------------------------------------- persisted index

  /** The persisted BM25 postings index — the retrieval op joins the
    * [[graft.sources.IndexLifecycle]] contract as the seventh family
    * (shingle, cell, IVF, phash, variants, spans, postings): the
    * search-engine economics where the corpus is tokenized ONCE by an
    * offline build and every query batch touches only its own terms'
    * postings.
    *
    * Layout: `ingest=<tag>/bucket=pmod(xxhash64(term), nBuckets)` with
    * columns (doc_id, t, tf, len) — the doc length rides denormalized
    * on each posting row so scoring never joins a second corpus-sized
    * table. Each segment carries a `_graft_seg_stats` sidecar inside
    * its directory (docs, sum_len): document sets are disjoint across
    * segments by the append contract, so the corpus constants N and
    * avgdl are exact SUMS of per-segment stats — bounded driver-side
    * reads, never a corpus scan per query. A probe pushes its query
    * terms' buckets as a partition filter: the scan is ∝ the touched
    * buckets' postings, the IVF-probe pattern applied to text
    * retrieval.
    *
    * Forget ([[Forget.fromBm25Index]]) removes a doc's posting rows
    * exactly; the per-segment stats are NOT decremented (corpus
    * constants, the hot-list/centroid policy) — N and avgdl drift by
    * the forgotten fraction until the periodic rebuild refreshes them,
    * shifting every score identically and no ranking materially.
    */
  private def bm25ParamsSidecar(dir: String) = s"$dir/_graft_bm25_params"
  private def segStatsDir(segDir: String) = s"$segDir/_graft_seg_stats"

  private def writeBm25Params(spark: org.apache.spark.sql.SparkSession,
                              dir: String, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq(Tuple1(nBuckets)).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(bm25ParamsSidecar(dir))
  }

  private def requireBm25Params(spark: org.apache.spark.sql.SparkSession,
                                dir: String, nBuckets: Int): Unit = {
    val nb = spark.read.parquet(bm25ParamsSidecar(dir)).head().getInt(0)
    require(nb == nBuckets,
      s"bm25 index at $dir was built with nBuckets=$nb — caller passed " +
        s"$nBuckets; mismatched bucketing would silently miss postings")
  }

  /** One batch's posting rows (doc_id, t, tf, len, bucket) — len is
    * the sum of the doc's tfs, matching the oracle's doclen-from-tf
    * derivation (empty docs emit nothing on either side).
    */
  private def postingRows(docs: DataFrame, idCol: String, textCol: String,
                          nBuckets: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    tf.withColumn("len",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(nBuckets)).cast("int"))
  }

  /** One (qid, term) pair per distinct query term — THE query
    * expansion, shared by the one-shot scorer, the index probe, and
    * (as its VALUES list) the generated oracle: the probe/oracle
    * equivalence depends on all sides splitting queries identically.
    */
  private def qidTerms(queries: Seq[(Int, String)]): Seq[(Int, String)] =
    queries.flatMap { case (qid, q) =>
      q.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }

  private def writeSegStats(spark: org.apache.spark.sql.SparkSession,
                            rows: DataFrame, segDir: String): Unit =
    rows.select(col("doc_id"), col("len")).distinct()
      // coalesce: an all-empty-docs build still emits one stats row
      // (docs=0, sum_len would be NULL) — a NULL would NPE every later
      // probe's stats fold, permanently poisoning the index
      .agg(count(lit(1)).as("docs"),
        coalesce(sum(col("len")), lit(0L)).as("sum_len"))
      .coalesce(1).write.mode("overwrite").parquet(segStatsDir(segDir))

  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
                     indexPath: String, nBuckets: Int = 16): Unit = {
    val spark = docs.sparkSession
    val rows = graft.util.Caches.own(
      postingRows(docs, idCol, textCol, nBuckets))
    rows
      .withColumn("ingest", lit("base"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("ingest", "bucket")
      .parquet(indexPath)
    writeSegStats(spark, rows, s"$indexPath/ingest=base")
    writeBm25Params(spark, indexPath, nBuckets)
  }

  /** Append one ingest batch's postings under `ingest=<tag>` —
    * batchId-keyed, replay-idempotent (sealed-segment contract). Doc
    * ids must be new to the index: the per-segment stats sum exactly
    * because document sets are disjoint, the same
    * each-doc-in-exactly-one-segment contract every family carries.
    */
  def appendToBm25Index(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, batch: DataFrame,
                        idCol: String, textCol: String,
                        ingestTag: String, nBuckets: Int = 16): Unit =
    graft.sources.IndexLifecycle.appendSegment(spark, indexPath, ingestTag) {
      (dir, tmp) =>
        requireBm25Params(spark, dir, nBuckets)
        val rows = graft.util.Caches.own(
          postingRows(batch, idCol, textCol, nBuckets))
        rows
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        // the stats sidecar rides INSIDE the temp dir through the
        // atomic segment rename — stats and postings commit together
        writeSegStats(spark, rows, tmp)
    }

  /** Fenced segment-merge rebuild: postings collapse to base
    * (distinct() guards a doc replayed under two tags) and the corpus
    * stats are recomputed fresh over the union — the forget drift
    * window closes here, the hot-list refresh policy.
    */
  def rebuildBm25Index(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String,
                       orphanGraceMs: Long =
                         graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                       readerGraceMs: Long = 0L): Unit =
    graft.sources.IndexLifecycle.rebuild(spark, indexPath,
      orphanGraceMs, readerGraceMs)(bm25RebuildClosure(spark))

  /** [[graft.sources.IndexLifecycle.maybeRebuild]] with this family's
    * build body; the layout comes from the index's own params sidecar.
    * Pass the same `readerGraceMs` discipline as your explicit
    * rebuilds. Returns true iff a rebuild ran.
    */
  def maybeRebuildBm25Index(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String, maxSegments: Int,
                            orphanGraceMs: Long =
                              graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                            readerGraceMs: Long = 0L): Boolean =
    graft.sources.IndexLifecycle.maybeRebuild(spark, indexPath,
      maxSegments, orphanGraceMs, readerGraceMs)(bm25RebuildClosure(spark))

  /** Build body shared with [[Forget.fromBm25IndexViaRebuild]] — which
    * is also where the in-place forget's documented stats drift closes
    * WITH the deletion instead of at the next maintenance rebuild: the
    * segment stats are recomputed from the filtered postings.
    */
  private[graft] def bm25RebuildClosure(
      spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, String, String) => Unit =
    (src, srcDir, dst) => {
      // the layout comes from the SOURCE dir's sidecar — rebuild call
      // sites can no longer silently rebucket (writeBm25Index is the
      // retune path)
      val nBuckets = spark.read.parquet(bm25ParamsSidecar(srcDir))
        .head().getAs[Int]("n_buckets")
      val rows = graft.util.Caches.own(
        src.select(col("doc_id"), col("t"), col("tf"), col("len"))
          .distinct()
          .withColumn("bucket",
            pmod(xxhash64(col("t")), lit(nBuckets)).cast("int")))
      rows
        .withColumn("ingest", lit("base"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("ingest", "bucket")
        .parquet(dst)
      writeSegStats(spark, rows, s"$dst/ingest=base")
      writeBm25Params(spark, dst, nBuckets)
    }

  /** BM25 top-k against the PERSISTED index: the query set's term
    * buckets prune the scan at the partition level, dft comes from the
    * touched postings (one doc per segment ⇒ a count IS the df), the
    * corpus constants sum from the per-segment stats sidecars (bounded
    * driver reads), and the scoring expression is byte-identical to
    * [[bm25TopK]] — so the result equals the one-shot pass over the
    * indexed population at per-query cost ∝ hit lists, never corpus.
    *
    * `excludeIngest`: a streaming ingest loop's replayed trigger skips
    * its own segment (rows AND stats), the standard at-least-once
    * window closure. Note [[graft.streaming.StreamingDedup.attachBm25]]
    * deliberately does NOT pass it — it appends FIRST so standing
    * queries see the batch, and a replay that finds its tag absorbed by
    * a rebuild re-probes the identical corpus (retrieval has no
    * self-match hazard; the dedup families' id-level closure is about
    * pair semantics, not reachability).
    */
  def bm25AgainstIndex(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, queries: Seq[(Int, String)],
                       k: Int, nBuckets: Int = 16,
                       excludeIngest: Option[String] = None): DataFrame = {
    import org.apache.hadoop.fs.Path
    val dir = graft.sources.IndexLifecycle.resolveDir(spark, indexPath)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = graft.sources.IndexLifecycle
      .segmentsOf(fs, new Path(dir))
      .filterNot(excludeIngest.contains)
    bm25ProbeSegments(spark, dir, segs, queries, k, nBuckets)
  }

  /** [[bm25AgainstIndex]] PINNED to a retained manifest version — the
    * reproducible-export read: the probe targets version `v`'s data dir
    * restricted to the segment set its marker recorded
    * ([[graft.sources.IndexLifecycle.manifestAt]]), so re-running the
    * same standing queries against the same version returns the same
    * snapshot even while appends keep landing (appends mutate the
    * SHARED dir; the pinned segment list is what keeps later batches
    * out). Corpus stats sum over the pinned segments only, so scores
    * are the ones the live probe returned when `v` was current. Fails
    * loudly outside the retention window; forgotten rows stay
    * forgotten (RTBF reaches historical reads — see the lifecycle
    * class doc).
    */
  def bm25AgainstIndexAt(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, version: Long,
                         queries: Seq[(Int, String)],
                         k: Int, nBuckets: Int = 16): DataFrame = {
    import org.apache.hadoop.fs.Path
    val m = graft.sources.IndexLifecycle.manifestAt(spark, indexPath, version)
    val dir = new Path(new Path(indexPath), m.dir).toString
    bm25ProbeSegments(spark, dir, m.segments, queries, k, nBuckets)
  }

  private def bm25ProbeSegments(spark: org.apache.spark.sql.SparkSession,
                                dir: String, segs: Seq[String],
                                queries: Seq[(Int, String)],
                                k: Int, nBuckets: Int): DataFrame = {
    import spark.implicits._
    requireBm25Params(spark, dir, nBuckets)
    val qterms = qidTerms(queries)
      .toDF("qid", "t")
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(nBuckets)).cast("int"))
    val touched = qterms.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    require(segs.nonEmpty, s"bm25 index at $dir holds no segments")
    // ONE job over every segment's stats file — a per-segment
    // sequential head() loop would pay linear driver-side scheduling
    // on exactly the many-ingest-batches path this index targets
    val statsRow = spark.read
      .parquet(segs.map(t => segStatsDir(s"$dir/ingest=$t")): _*)
      .agg(sum(col("docs")), sum(col("sum_len"))).head()
    val (n, sumLen) = (statsRow.getLong(0), statsRow.getLong(1))
    require(n > 0, s"bm25 index at $dir holds no documents")
    val avglen = sumLen.toDouble / n
    // the probed segment set is explicit (current minus excluded for
    // the live probe; the marker's pinned list for probes-at-version) —
    // `ingest` is the first partition level, so this prunes directories
    // exactly like the bucket filter
    val posts = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched: _*) &&
        col("ingest").isin(segs: _*))
    // the hit frame feeds BOTH the dft aggregate and the scoring join —
    // own the persist so the bucket scan runs once (the coverage/link
    // probe discipline); swept by the caller's harness
    val hits = graft.util.Caches.own(
      posts.join(broadcast(qterms.select("qid", "t")), "t"))
    // one doc lives in exactly one segment ⇒ count per term = df
    val dft = hits.select(col("t"), col("doc_id")).distinct()
      .groupBy("t").agg(count(lit(1)).as("dft"))
    val idf = log(((lit(n) - col("dft")) + lit(0.5)) / (col("dft") + lit(0.5)) + lit(1.0))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("len") / lit(avglen))))
    val scored = hits
      .join(broadcast(dft), "t")
      .withColumn("score_u", floor(idf * tfn * lit(1e6)).cast("long"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("score_u")).as("score_u"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("rn"),
        col("score_u"), (col("score_u").cast("double") / 1e6).as("score"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Per-document top-k keywords by tf-idf — the document→vocabulary
    * direction ([[bm25TopK]] is query→document retrieval): the tags a
    * curation pipeline uses to label and slice a corpus by topic.
    * idf = ln((N+1)/(df_t+1)) floor-quantized to micro-nats (the
    * surprisal ln-parity precedent: both engines divide the same exact
    * integers as doubles, then libm-ln the identical IEEE value), so
    * score_u = tf·idf_u stays an exact BIGINT and the per-doc ranking
    * (desc, then term) is engine-exact.
    *
    * Scale shape: per-(doc, term) tf and per-term df are partial-agg'd
    * groupBys straight off the explode (map-side combine keeps hot
    * terms from skewing a partition); the tf⋈df join broadcasts while
    * the vocabulary fits and AQE shuffles beyond that; the 1-row doc
    * count broadcasts; top-k is one window per doc over its DISTINCT
    * terms — bounded by document length, never vocabulary.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("t").agg(count(lit(1)).as("dft"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_u").desc, col("t"))
    tf.join(dft, "t").crossJoin(broadcast(nDocs))
      .withColumn("idf_u",
        floor(log((col("n_docs") + 1).cast("double") /
          (col("dft") + 1).cast("double")) * 1e6).cast("long"))
      .withColumn("score_u", col("tf") * col("idf_u"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("t").as("term"), col("tf"),
        col("score_u"), col("rn"))
  }

  /** The registered query set — corpus-vocabulary terms so every query
    * has real hit lists (the documents table is synthetic prose over a
    * fixed word list, TESTDATA.md).
    */
  val registeredQueries: Seq[(Int, String)] = Seq(
    1 -> "spark window agg",
    2 -> "slow query scan",
    3 -> "customer join table")

  val queries: Seq[GQuery] = Seq(
    GQuery("text_bm25_topk",
      (s, d) => bm25TopK(Tables(s, d, "documents"), "doc_id", "text",
        registeredQueries, 10),
      Some(bm25OracleSql(registeredQueries, 10))),

    // BM25 against the PERSISTED postings index (build over doc_id
    // %10≠0, one appended %20==0 ingest segment, the standard
    // incremental-fixture split): term buckets pruned at the partition
    // level, dft from the touched postings, corpus constants summed
    // from the per-segment stats sidecars. The oracle is the SAME
    // generated BM25 replay restricted to the indexed population —
    // identical ranking math by construction; the index changes the
    // cost model (per-query work ∝ hit lists), not one score. Fixture
    // memoized per dataset dir; the query times the probe.
    GQuery("search_bm25_incremental",
      (s, d) => {
        val idx = graft.util.TempFixtures.dir(s"bm25idx:$d") { p =>
          val docs = Tables(s, d, "documents")
          writeBm25Index(docs.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", p)
          appendToBm25Index(s, p, docs.filter(col("doc_id") % 20 === 0),
            "doc_id", "text", ingestTag = "b0")
        }
        bm25AgainstIndex(s, idx, registeredQueries, 10)
      },
      Some(bm25OracleSql(registeredQueries, 10,
        "WHERE doc_id % 10 <> 0 OR doc_id % 20 = 0"))),

    // Probe PINNED to a manifest version (round-10): the same index as
    // search_bm25_incremental but generational (rebuild → v2 = [base])
    // with the %20==0 batch appended AFTER (v3 = [base, b0]); the
    // registered probe pins v2, so its corpus is the PRE-append
    // population even though the append mutated the same data dir the
    // pinned read resolves. The oracle is the BM25 replay restricted
    // to the base population — a probe that read the dir's current
    // listing instead of the marker's pinned segment set would score
    // b0's documents too and hash-mismatch. This is the reproducible
    // training-export read: "the snapshot as of version v", replayable
    // until retention prunes v.
    GQuery("search_bm25_at",
      (s, d) => {
        val idx = graft.util.TempFixtures.dir(s"bm25at:$d") { p =>
          val docs = Tables(s, d, "documents")
          writeBm25Index(docs.filter(col("doc_id") % 10 =!= 0),
            "doc_id", "text", p)
          // convert publishes v1 (flat content), rebuild publishes v2
          // (fresh base dir) — the version the probe pins
          rebuildBm25Index(s, p)
          appendToBm25Index(s, p, docs.filter(col("doc_id") % 20 === 0),
            "doc_id", "text", ingestTag = "b0") // v3: [base, b0]
        }
        bm25AgainstIndexAt(s, idx, version = 2L, registeredQueries, 10)
      },
      Some(bm25OracleSql(registeredQueries, 10, "WHERE doc_id % 10 <> 0"))),

    // Deletion propagation (RTBF) into the persisted BM25 postings
    // index through the reader-isolated path (round-12 — the last of
    // the six forget-bearing index families to get an oracle row;
    // byte-level erasure is additionally proven in SearchSpec's
    // victim-text scan). Forget ≡ rebuild-without-ids: the closure
    // recomputes dft, doc count and avgdl from the SURVIVING postings
    // (df only drops, survivors' tf/len are per-doc and untouched), so
    // the post-forget probe provably equals the generated BM25 replay
    // over the surviving population — which is exactly the oracle.
    GQuery("forget_bm25_index",
      (s, d) => {
        val idx = graft.util.TempFixtures.dir(s"bm25forget:$d") { p =>
          val corpus = Tables(s, d, "documents")
            .filter(col("doc_id") % 10 === 0)
          writeBm25Index(corpus, "doc_id", "text", p, nBuckets = 16)
          val ids = corpus.filter(col("doc_id") % 20 === 0)
            .select("doc_id").collect().map(_.getLong(0)).toSeq
          val removed = graft.ops.Forget.fromBm25IndexViaRebuild(s, p, ids)
          require(removed > 0L, "forget removed nothing — bad fixture")
        }
        bm25AgainstIndex(s, idx, registeredQueries, 10)
      },
      Some(bm25OracleSql(registeredQueries, 10, "WHERE doc_id % 20 = 10"))),

    // Misra-Gries heavy hitters in the exact regime: capacity 64 ≥ the
    // corpus's 31-token vocabulary, so no counter is ever evicted and
    // the sketch provably equals the exact token counts (which is what
    // lets a stream-order-dependent summary sit under a hash oracle).
    // The approximate regime is guarantee-tested in SearchSpec.
    GQuery("text_top_terms",
      (s, d) => {
        val mg = udaf(graft.functions.MisraGries(64))
        Tables(s, d, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
          .agg(mg(col("t")).as("m"))
          .select(explode(col("m")))
          .select(col("key").as("term"), col("value").as("cnt"))
          .orderBy(col("cnt").desc, col("term"))
          .limit(20)
      },
      Some("""SELECT t AS term, count(*) AS cnt FROM (
          SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
          FROM documents)
        GROUP BY t ORDER BY cnt DESC NULLS LAST, t LIMIT 20""")),

    // Group-wise heavy hitters: one Misra-Gries summary per language
    // (sketches build map-side per group and merge), top 5 terms each.
    // Exact regime again (capacity ≥ vocabulary), so the DuckDB twin is
    // the plain per-group count — at real scale the same query runs
    // with capacity ≪ vocabulary and bounded state per group.
    GQuery("text_top_terms_by_lang",
      (s, d) => {
        val mg = udaf(graft.functions.MisraGries(64))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("cnt").desc, col("term"))
        Tables(s, d, "documents")
          .select(col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("t"))
          .groupBy(col("lang")).agg(mg(col("t")).as("m"))
          .select(col("lang"), explode(col("m")))
          .select(col("lang"), col("key").as("term"), col("value").as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy(col("lang"), col("rn"))
      },
      Some("""SELECT lang, term, cnt, rn FROM (
          SELECT lang, t AS term, count(*) AS cnt,
            CAST(row_number() OVER (PARTITION BY lang
              ORDER BY count(*) DESC NULLS LAST, t) AS INT) AS rn
          FROM (
            SELECT lang,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
            FROM documents)
          GROUP BY lang, t)
        WHERE rn <= 5 ORDER BY lang, rn""")),

    // Incremental index maintenance: the corpus arrives in three
    // disjoint ingest batches; each batch's term stats merge into the
    // running index by count addition. The oracle is the ONE-SHOT index
    // over the full corpus — proving merge ≡ rebuild, the property that
    // lets a 100 TB index absorb a per-batch MERGE instead of a rescan.
    GQuery("search_incremental_index",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val batches = (0 until 3).map(r =>
          termStats(docs.filter(pmod(col("doc_id"), lit(3)) === r),
            "doc_id", "text"))
        batches.reduce(mergeTermStats)
          .orderBy(col("t"))
      },
      Some("""SELECT t, count(*) AS dft, CAST(sum(tf) AS BIGINT) AS tf_total
        FROM (
          SELECT doc_id, t, count(*) AS tf FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
            FROM documents)
          GROUP BY doc_id, t)
        GROUP BY t ORDER BY t""")),

    // Per-doc top-5 keywords by tf-idf (micro-nat idf, exact BIGINT
    // score). ln parity per the surprisal precedent; ranking ties break
    // on the term so both engines agree.
    GQuery("text_tfidf_topk",
      (s, d) => tfidfTopK(Tables(s, d, "documents"), "doc_id", "text", 5)
        .orderBy(col("doc_id"), col("rn")),
      Some("""WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
          FROM documents),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY doc_id, t),
        dft AS (SELECT t, count(*) AS dft FROM tf GROUP BY t),
        n AS (SELECT count(*) AS n_docs FROM documents),
        sc AS (
          SELECT doc_id, t AS term, tf,
            tf * CAST(floor(ln((n_docs + 1)::DOUBLE / (dft + 1)::DOUBLE)
              * 1e6) AS BIGINT) AS score_u
          FROM tf JOIN dft USING (t), n),
        r AS (
          SELECT doc_id, term, tf, score_u,
            CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_u DESC NULLS LAST, term) AS INT) AS rn
          FROM sc)
        SELECT doc_id, term, tf, score_u, rn FROM r
        WHERE rn <= 5 ORDER BY doc_id, rn""")))
}
