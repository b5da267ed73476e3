package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Distribution-drift monitoring — the validation pass a pipeline runs
  * between ingest snapshots before trusting new data (the natural
  * extension of [[ProfileQueries]]'s static audit): population
  * stability index on a numeric column across a time cutoff, and
  * per-source token-distribution KL divergence against the corpus.
  * The reference replicates rows but never validates them; this is
  * north-star data-quality scope.
  *
  * Determinism contract (both queries): bin/token counts are integers;
  * fractions are one fixed IEEE expression shape mirrored verbatim in
  * the oracle; each bin/token term is floor-quantized to nano/micro
  * units and integer-summed, so partition order cannot perturb the
  * reported divergence (the unigramSurprisal pattern).
  */
object DriftQueries {

  /** PSI of `value` per event_type: current window vs reference window
    * (split at `cutoff`), bins = reference-window deciles. Laplace
    * smoothing (+0.5 per bin) keeps empty current bins finite — the
    * standard industrial form. Scale shape: decile cuts are one
    * exact-percentile agg over the reference (the oracle-replayable
    * twin — production would swap in approx_percentile exactly as
    * q84_equidepth_approx does); binning + counting is ONE map-only
    * pass over events with the tiny cut table broadcast, then all
    * remaining algebra runs on (event_type × 10) rows.
    */
  def psi(ev: DataFrame, cutoff: String,
          exactCuts: Boolean = true): DataFrame = {
    val probs = (1 to 9).map(_ / 10.0)
    val ref = ev.filter(col("ts") < lit(cutoff).cast("timestamp"))
    // exact percentile for the oracle-replayable twin; the production
    // path is the bounded-memory GK sketch (the q84_equidepth_approx
    // argument — exact percentile buffers every value per group)
    val cuts = ref.groupBy(col("event_type").as("et"))
      .agg((if (exactCuts) percentile(col("value"), array(probs.map(lit): _*))
            else approx_percentile(col("value"), array(probs.map(lit): _*),
              lit(10000))).as("cuts"))
    // LEFT join: an event_type that first appears AFTER the cutoff has
    // no reference cuts — arguably the strongest drift signal there is,
    // and an inner join silently dropped it from the report (ADVICE
    // round 5). Such types land in sentinel bin -1 and are flagged
    // `new_type` below; smoothing keeps their single-bin PSI finite.
    val binned = ev
      .join(broadcast(cuts), col("event_type") === col("et"), "left")
      .withColumn("bin",
        when(col("cuts").isNull, lit(-1)).otherwise(
          aggregate(col("cuts"), lit(0),
            (acc, c) => acc + when(col("value") > c, 1).otherwise(0))))
      .withColumn("w",
        when(col("ts") < lit(cutoff).cast("timestamp"), lit("ref"))
          .otherwise(lit("cur")))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("w") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("w") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val totals = binned.groupBy(col("event_type").as("e2"))
      .agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    binned.join(totals, col("event_type") === col("e2"))
      .withColumn("p",
        (col("n_cur").cast("double") + 0.5) / (col("t_cur") + 5.0))
      .withColumn("q",
        (col("n_ref").cast("double") + 0.5) / (col("t_ref") + 5.0))
      .withColumn("term_n",
        floor((col("p") - col("q")) * log(col("p") / col("q")) * 1e9).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(col("t_ref")).as("n_ref"), max(col("t_cur")).as("n_cur"),
        (sum(col("term_n")).cast("double") / 1e9).as("psi"),
        // all rows of an unseen-in-reference type carry the sentinel
        (max(col("bin")) === -1).as("new_type"))
      .orderBy(col("event_type"))
  }

  /** Per-source token-distribution KL divergence vs the whole corpus,
    * add-1 smoothed over the corpus vocabulary (so a token absent from
    * a source still contributes its prior mass — full-vocab KL, not
    * intersection KL). All counts are partial-agg'd groupBys off one
    * token explode; the vocab × sources completion is an equi-join
    * (sources are a bounded enum); the heavy stream never shuffles on
    * anything wider than a token.
    */
  def tokenDriftKl(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(srcCol).as("src"), explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
    val corpus = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
    val consts = corpus.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("vocab"))
    val perSrc = toks.groupBy("src", "t").agg(count(lit(1)).as("k"))
    val srcTotals = perSrc.groupBy(col("src").as("s2"))
      .agg(sum(col("k")).as("t_src"))
    // complete the (source × vocab) grid so absent tokens keep k = 0
    val grid = corpus
      .crossJoin(srcTotals)
      .join(perSrc,
        col("s2") === perSrc("src") && corpus("t") === perSrc("t"), "left")
      .select(col("s2").as("src"), corpus("t").as("t"), col("cnt"),
        col("t_src"), coalesce(col("k"), lit(0L)).as("k"))
    grid.crossJoin(broadcast(consts))
      .withColumn("p",
        (col("k").cast("double") + 1.0) / (col("t_src") + col("vocab")))
      .withColumn("q",
        (col("cnt").cast("double") + 1.0) / (col("total") + col("vocab")))
      .withColumn("term_n", floor(col("p") * log(col("p") / col("q")) * 1e9).cast("long"))
      .groupBy(col("src"))
      .agg(max(col("t_src")).as("n_tokens"),
        (sum(col("term_n")).cast("double") / 1e9).as("kl"))
      .orderBy(col("src"))
  }

  /** PSI between two embedding populations over QUANTIZER CELLS — the
    * drift monitor for vector spaces, where per-component PSI is
    * meaningless (embeddings drift in direction, not coordinates):
    * the REFERENCE population owns the quantizer (its every-Nth
    * vectors, the index-side-truth doctrine), both populations assign
    * map-only against those broadcast centroids, and PSI runs over
    * the two cell histograms with (+0.5, +k/2) Laplace smoothing.
    * Detects mode collapse, new semantic clusters, and upstream
    * encoder changes between ingest snapshots. All math is the
    * floor-nano integer-sum PSI contract above; assignment is the
    * floor-micro argmin, so the whole monitor is hash-replayable.
    *
    * Scale: centroids broadcast; each population is one map-only
    * assign + one k-row partial-agg histogram; PSI is arithmetic on
    * 2k rows.
    */
  def cellDriftPsi(ref: DataFrame, cur: DataFrame, idCol: String,
                   vecCol: String, centroidEvery: Int): DataFrame = {
    import graft.ops.KMeansStep
    val cents = ref.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("cluster"), col(vecCol).as("cvec"))
    def hist(df: DataFrame, n: String) =
      KMeansStep.assignTo(df, idCol, vecCol, cents)
        .groupBy(col("cluster")).agg(count(lit(1)).as(n))
    val joined = hist(ref, "n_ref")
      .join(hist(cur, "n_cur"), Seq("cluster"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"), count(lit(1)).as("k"))
    val pr = (col("n_ref").cast("double") + 0.5) / (col("t_ref") + lit(0.5) * col("k"))
    val pc = (col("n_cur").cast("double") + 0.5) / (col("t_cur") + lit(0.5) * col("k"))
    joined.crossJoin(broadcast(tot))
      .select(col("t_ref"), col("t_cur"),
        floor((pc - pr) * log(pc / pr) * 1e9).cast("long").as("term_u"))
      .groupBy(col("t_ref").as("n_ref"), col("t_cur").as("n_cur"))
      .agg((sum(col("term_u")).cast("double") / 1e9).as("psi"))
  }

  private val cellPsiOracle: String = {
    val d2 = """list_sum(list_transform(list_zip(v.embedding, c.embedding), p ->
        (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""
    def assign(pop: String) =
      s"""SELECT vec_id, cluster FROM (
          SELECT v.vec_id, c.cluster,
            row_number() OVER (PARTITION BY v.vec_id
              ORDER BY CAST(floor($d2 * 1e6) AS BIGINT) ASC NULLS LAST,
                       c.cluster) AS rn
          FROM $pop v, cents c) t WHERE rn = 1"""
    def psiSelect(tag: String, h: String) =
      s"""SELECT '$tag' AS population,
          CAST(max(t_ref) AS BIGINT) AS n_ref,
          CAST(max(t_cur) AS BIGINT) AS n_cur,
          CAST(SUM(CAST(floor(
            ((CAST(n_cur AS DOUBLE) + 0.5) / (t_cur + 0.5 * kk)
              - (CAST(n_ref AS DOUBLE) + 0.5) / (t_ref + 0.5 * kk))
            * ln(((CAST(n_cur AS DOUBLE) + 0.5) / (t_cur + 0.5 * kk))
                 / ((CAST(n_ref AS DOUBLE) + 0.5) / (t_ref + 0.5 * kk)))
            * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS psi
        FROM (
          SELECT cents.cluster, coalesce(hr.n, 0) AS n_ref,
                 coalesce($h.n, 0) AS n_cur,
                 (SELECT SUM(n) FROM hr) AS t_ref,
                 (SELECT coalesce(SUM(n), 0) FROM $h) AS t_cur,
                 (SELECT count(*) FROM cents) AS kk
          FROM cents LEFT JOIN hr ON hr.cluster = cents.cluster
          LEFT JOIN $h ON $h.cluster = cents.cluster)"""
    s"""WITH cents AS (
        SELECT vec_id AS cluster, embedding FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 50 = 0),
      ref AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
      cur AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 <> 0),
      c0 AS (SELECT embedding AS c0e FROM embeddings WHERE vec_id = 0),
      shf AS (SELECT vec_id,
          list_transform(list_zip(embedding, c0e), p ->
            CAST(0.2 * CAST(p[1] AS DOUBLE) + 0.8 * CAST(p[2] AS DOUBLE)
              AS FLOAT)) AS embedding
        FROM embeddings CROSS JOIN c0 WHERE vec_id % 2 <> 0),
      ar AS (${assign("ref")}),
      ac AS (${assign("cur")}),
      ash AS (${assign("shf")}),
      hr AS (SELECT cluster, count(*) AS n FROM ar GROUP BY 1),
      hc AS (SELECT cluster, count(*) AS n FROM ac GROUP BY 1),
      hs AS (SELECT cluster, count(*) AS n FROM ash GROUP BY 1)
      ${psiSelect("current", "hc")}
      UNION ALL
      ${psiSelect("shifted", "hs")}
      ORDER BY population"""
  }

  val queries: Seq[GQuery] = Seq(

    // Embedding-space drift: PSI over quantizer cells, reference owns
    // the quantizer. 'current' is the disjoint same-distribution half
    // (PSI ≈ 0); 'shifted' negates the first component (a direction
    // change coordinates-wise monitors miss) — its PSI must come out
    // higher, asserted in DriftSpec; the oracle replays assignment,
    // histograms and the floor-nano PSI sum for both populations.
    GQuery("embed_drift_cells",
      (s, d) => {
        val emb = Tables(s, d, "embeddings")
        val ref = emb.filter(col("vec_id") % 2 === 0)
        val cur = emb.filter(col("vec_id") % 2 =!= 0)
        val c0 = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("__c0"))
        val shifted = cur.crossJoin(broadcast(c0))
          .withColumn("embedding",
            zip_with(col("embedding"), col("__c0"), (x, y) =>
              (lit(0.2) * x.cast("double") + lit(0.8) * y.cast("double"))
                .cast("float")))
          .drop("__c0")
        cellDriftPsi(ref, cur, "vec_id", "embedding", 50)
          .select(lit("current").as("population"), col("n_ref"),
            col("n_cur"), col("psi"))
          .unionByName(
            cellDriftPsi(ref, shifted, "vec_id", "embedding", 50)
              .select(lit("shifted").as("population"), col("n_ref"),
                col("n_cur"), col("psi")))
          .orderBy(col("population"))
      },
      Some(cellPsiOracle)),

    // Bounded-memory production twin: reference cuts from the GK
    // sketch instead of exact percentile (engine-specific → rows-only;
    // the exact twin below carries the hash oracle).
    GQuery("q92_psi_drift_approx",
      (s, d) => psi(Tables(s, d, "events"), "2024-01-16",
        exactCuts = false),
      None),

    GQuery("q92_psi_value_drift",
      (s, d) => psi(Tables(s, d, "events"), "2024-01-16"),
      Some("""WITH ref AS (
          SELECT event_type AS et, quantile_cont("value",
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
          FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
          GROUP BY event_type),
        binned AS (
          SELECT event_type,
            CASE WHEN cuts IS NULL THEN -1
              ELSE CAST(len(list_filter(cuts, c -> "value" > c)) AS INT)
            END AS bin,
            CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
              THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
            CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
              THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
          FROM events LEFT JOIN ref ON event_type = et
          GROUP BY event_type, bin),
        tot AS (
          SELECT event_type AS e2, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
          FROM binned GROUP BY event_type)
        SELECT event_type, CAST(max(t_ref) AS BIGINT) AS n_ref,
          CAST(max(t_cur) AS BIGINT) AS n_cur,
          CAST(SUM(CAST(floor(
            ((CAST(n_cur AS DOUBLE) + 0.5) / (t_cur + 5.0)
              - (CAST(n_ref AS DOUBLE) + 0.5) / (t_ref + 5.0))
            * ln(((CAST(n_cur AS DOUBLE) + 0.5) / (t_cur + 5.0))
                 / ((CAST(n_ref AS DOUBLE) + 0.5) / (t_ref + 5.0)))
            * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS psi,
          max(bin) = -1 AS new_type
        FROM binned JOIN tot ON event_type = e2
        GROUP BY event_type ORDER BY event_type""")),

    GQuery("q93_token_drift_kl",
      (s, d) => tokenDriftKl(Tables(s, d, "documents"), "source", "text"),
      Some("""WITH tok AS (
          SELECT source AS src, unnest(list_filter(string_split(text, ' '),
            x -> x <> '')) AS t
          FROM documents),
        corpus AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
        consts AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
          count(*) AS vocab FROM corpus),
        per_src AS (SELECT src, t, count(*) AS k FROM tok GROUP BY src, t),
        src_tot AS (SELECT src AS s2, CAST(SUM(k) AS BIGINT) AS t_src
          FROM per_src GROUP BY src),
        grid AS (
          SELECT s2 AS src, corpus.t, cnt, t_src,
            coalesce(k, 0) AS k
          FROM corpus CROSS JOIN src_tot
          LEFT JOIN per_src ON per_src.src = s2 AND per_src.t = corpus.t)
        SELECT src, CAST(max(t_src) AS BIGINT) AS n_tokens,
          CAST(SUM(CAST(floor(
            ((CAST(k AS DOUBLE) + 1.0) / (t_src + vocab))
            * ln(((CAST(k AS DOUBLE) + 1.0) / (t_src + vocab))
                 / ((CAST(cnt AS DOUBLE) + 1.0) / (total + vocab)))
            * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS kl
        FROM grid, consts
        GROUP BY src ORDER BY src"""))
  )
}
