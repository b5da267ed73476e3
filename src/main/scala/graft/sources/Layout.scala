package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SortedCutsBucket, ZOrderValue}
import graft.util.{GQuery, Tables}

/** Multi-dimensional data layout: write a table clustered on the Morton
  * (Z-order) curve of two dimensions, so file- and row-group-level
  * min/max stats are narrow in BOTH dimensions and box predicates prune
  * the scan from parquet footers alone.
  *
  * Why this matters at 100 TB: a table range-partitioned on ONE key
  * skips well for that key and not at all for any other; interleaving
  * the bits of two keys bounds each output file to a small hyper-
  * rectangle of the (a, b) domain, so selective filters on a, on b, or
  * on both each touch a small fraction of files. This is purely a WRITE
  * pattern — `repartitionByRange` + `sortWithinPartitions` on the
  * z-value — and costs one shuffle at write time; reads need nothing
  * but stock parquet pushdown. LayoutSpec measures the effect (scan
  * `numOutputRows` collapses vs a single-key layout for the
  * non-clustered dimension).
  */
object Layout {

  /** Write `df` clustered on the z-curve of two numeric dimension
    * columns, `nFiles` roughly-equal files.
    *
    * Dimensions are RANK-normalized (equal-mass quantile buckets, 2^bits
    * of them) before the interleave. Rank, not raw values, for two
    * measured reasons: (1) mismatched magnitudes (a ≤ 149, b ≤ 490) put
    * one dimension's bits above all of the other's and the curve
    * degenerates to a single-key sort — a box on the narrow dimension
    * then prunes nothing; (2) equal-WIDTH buckets collapse under skew
    * (the events value column has median 34 and max 490 — most of an
    * 8-bit width range would map < 4 bits of actual data mass). The cut
    * points come from `approxQuantile` (Greenwald–Khanna sketch: one
    * pass, bounded state — constant driver cost at any scale, the same
    * approach Delta's OPTIMIZE ZORDER takes via range ids), and the
    * per-row bucket map is a native binary-search expression inside
    * whole-stage codegen ([[graft.functions.SortedCutsBucket]]).
    */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
                    out: String, nFiles: Int, bits: Int = 8): Unit = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val tagged = df.withColumn("__da", dimA.cast("double"))
      .withColumn("__db", dimB.cast("double"))
    val Array(cutsA, cutsB) =
      Array("__da", "__db").map { c =>
        val cuts = tagged.stat.approxQuantile(c, probs, 1.0 / (4 * nb))
          .distinct.sorted
        // empty input / all-null dim → no quantiles; a single dummy cut
        // keeps the kernel total (everything lands in bucket 0 or 1)
        if (cuts.isEmpty) Array(0.0) else cuts
      }
    df.withColumn("__z", ZOrderValue.zOrderValue(
        SortedCutsBucket.sortedCutsBucket(dimA.cast("double"), cutsA),
        SortedCutsBucket.sortedCutsBucket(dimB.cast("double"), cutsB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
  }

  /** Single-key comparison layout: range-clustered on `dim` only. */
  def writeLinear(df: DataFrame, dim: Column, out: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, dim)
      .sortWithinPartitions(dim)
      .write.mode("overwrite").parquet(out)

  /** Training-order shuffle layout: materialize the corpus in a
    * deterministic pseudo-random GLOBAL order — sort on a seeded hash
    * of the id. Every pretraining pipeline does this once per epoch
    * seed: a sequential reader then streams an unbiased interleave of
    * sources/domains instead of parquet ingestion order. Costs exactly
    * one range exchange (the same shuffle any global ORDER BY pays);
    * no window, nothing driver-side. Determinism: same seed + same ids
    * → the same order, any partitioning.
    */
  def writeShuffled(df: DataFrame, idCol: Column, out: String,
                    nFiles: Int, seed: Long): Unit =
    df.withColumn("__h", xxhash64(lit(seed), idCol))
      .repartitionByRange(nFiles, col("__h"), idCol)
      .sortWithinPartitions(col("__h"), idCol)
      .drop("__h")
      .write.mode("overwrite").parquet(out)

  /** The z-value kernel itself under the hash oracle: the DuckDB twin
    * recomputes the bit interleave arithmetically (bit i of a → 2i, bit
    * i of b → 2i+1), proving the native expression's packing exactly on
    * every event row.
    */
  /** Curriculum epoch layout: global position = (quality band, salted
    * hash) — band-major so training consumes the highest-quality band
    * first, hash-shuffled WITHIN each band so consecutive samples stay
    * decorrelated (the [[writeShuffled]] anti-correlation argument,
    * applied per band). `buckets` equal-mass bands are cut by GLOBAL
    * quality rank, not score quantile sketches, so band boundaries are
    * exact and the layout is hash-oracle-replayable.
    *
    * Scale shape: two [[graft.operators.GlobalOrder.globalRank]] passes
    * (each one range exchange + zipWithIndex's bounded count job — no
    * single-partition window anywhere, no driver-side data) plus a
    * 1-row count broadcast for the band arithmetic; the band id is
    * exact BIGINT math `((rank-1)·B) div n`, identical in both engines.
    * The second pass re-evaluates the first's lineage during range
    * sampling — deterministic (RangePartitioner's sampler is seeded per
    * partition), and cheaper than pinning a corpus-sized cache entry.
    *
    * Input: (`idCol`, `scoreCol`) — any per-doc score frame (e.g.
    * [[graft.ops.TextAnalysis.quality]]). Output: (idCol, decile, pos)
    * with decile 0 = best band and pos a 1-based total order.
    */
  def curriculumOrder(scored: DataFrame, idCol: String, scoreCol: String,
                      buckets: Int, salt: String): DataFrame = {
    import graft.operators.GlobalOrder
    require(buckets > 0, s"buckets must be positive: $buckets")
    // rank on NEGATED floor-micro-unit quality (globalRank sorts
    // ascending): decile 0 = highest quality, ties by id — the
    // cross-engine ranking contract (never raw doubles, never round())
    val qu = scored.select(col(idCol),
      (-floor(col(scoreCol) * 1e6)).cast("long").as("__nqu"))
    val ranked = GlobalOrder.globalRank(qu, "__qr", col("__nqu"), col(idCol))
    val n = scored.select(count(lit(1)).as("__n"))
    val banded = ranked.crossJoin(broadcast(n))
      .withColumn("decile",
        expr(s"(( __qr - 1) * $buckets) DIV __n").cast("int"))
      .withColumn("__h",
        md5(concat_ws(":", lit(salt), col(idCol).cast("string"))))
      .select(col(idCol), col("decile"), col("__h"))
    GlobalOrder.globalRank(banded, "pos",
        col("decile"), col("__h"), col(idCol))
      .select(col(idCol), col("decile"), col("pos"))
  }

  val queries: Seq[GQuery] = Seq(
    GQuery("layout_zorder_value",
      (s, d) => Tables(s, d, "events")
        .select(col("event_id"),
          col("user_id").cast("int").as("a"),
          // floor, not a bare int cast: Spark's double→int truncates
          // while DuckDB's rounds — floor agrees everywhere
          floor(col("value")).cast("int").as("b"))
        .withColumn("z", ZOrderValue.zOrderValue(col("a"), col("b")))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, a, b,
          CAST(list_sum(list_transform(range(31), i ->
            ((a >> i) & 1) * (1::BIGINT << (2*i))
            + ((b >> i) & 1) * (1::BIGINT << (2*i + 1)))) AS BIGINT) AS z
        FROM (SELECT event_id, CAST(user_id AS INT) AS a,
                     CAST(floor("value") AS INT) AS b FROM events)
        ORDER BY event_id""")),

    // Curriculum layout: quality-decile-major, hash-shuffled within
    // each decile — the two-level epoch ordering curriculum training
    // reads (clean data first, each difficulty band internally
    // decorrelated). Two GlobalOrder passes (range exchange +
    // zipWithIndex each), never a single-partition window.
    GQuery("layout_curriculum",
      (s, d) => curriculumOrder(
          graft.ops.TextAnalysis.quality(Tables(s, d, "documents"), "text")
            .select(col("doc_id"), col("quality_score")),
          "doc_id", "quality_score", buckets = 10, salt = "curr")
        .orderBy(col("pos")),
      Some("""WITH qr AS (SELECT doc_id, length(text) AS chars,
          len(list_filter(string_split(text, ' '), x -> x <> '')) AS toks,
          length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
          length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digits
          FROM documents),
        q AS (SELECT doc_id,
          (1.0 - CASE WHEN chars > 0 THEN punct::DOUBLE / chars ELSE 0.0 END)
            * (1.0 - CASE WHEN chars > 0 THEN digits::DOUBLE / chars ELSE 0.0 END)
            * least(1.0, toks::DOUBLE / 20.0) AS qs
          FROM qr),
        u AS (SELECT doc_id, CAST(floor(qs * 1e6) AS BIGINT) AS qu FROM q),
        n AS (SELECT count(*) AS nn FROM u),
        dec AS (SELECT doc_id,
            CAST(((row_number() OVER (ORDER BY qu DESC NULLS LAST, doc_id) - 1)
                  * 10) // nn AS INT) AS decile
          FROM u, n),
        h AS (SELECT doc_id, decile,
            md5('curr:' || CAST(doc_id AS VARCHAR)) AS hh FROM dec)
        SELECT doc_id, decile,
          CAST(row_number() OVER (ORDER BY decile ASC NULLS LAST,
            hh ASC NULLS LAST, doc_id) AS BIGINT) AS pos
        FROM h ORDER BY pos""")),

    // The shuffle-layout ordering contract under the hash oracle, via
    // the md5-portable key (xxhash64 is Spark-only; writeShuffled uses
    // it in production — LayoutSpec proves hash-family equivalence of
    // the layout properties). Rank comes from operators/GlobalOrder:
    // range exchange + partition-local row_number + broadcast offsets,
    // NEVER a single-partition global window — at 100 TB the naive
    // Window.orderBy rendering is one task holding the corpus.
    GQuery("layout_shuffle_rank",
      (s, d) => graft.operators.GlobalOrder.globalRank(
          Tables(s, d, "documents")
            .select(col("doc_id"), md5(concat(lit("42:"),
              col("doc_id").cast("string"))).as("k")),
          "rank", col("k"), col("doc_id"))
        .select(col("doc_id"), col("k"), col("rank"))
        .orderBy(col("rank")),
      Some("""SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS k,
          CAST(row_number() OVER (
            ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)) ASC NULLS LAST,
                     doc_id) AS BIGINT) AS rank
        FROM documents ORDER BY rank""")))
}
