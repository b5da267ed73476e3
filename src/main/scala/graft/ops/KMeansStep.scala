package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.{GQuery, Tables}

/** One distributed Lloyd (k-means) iteration over the embeddings table,
  * fully under the hash oracle — unlike the Spark-ML KMeans behind
  * sim_ann_ivf (whose internal init/aggregation is not replayable in
  * SQL, so those queries are rows-only), this hand-rolled step is the
  * auditable training kernel: deterministic centroid seed, assignment
  * by argmin over floor-quantized micro-unit distances (ties → cluster
  * id — the cross-engine ranking contract; a sub-quantum near-tie may
  * resolve to either centroid, deterministically), fixed-point mean
  * update.
  *
  * Scale shape: centroids broadcast (k rows); assignment is a map-only
  * pass over the corpus (cost ∝ n·k·dim, no shuffle); the update is ONE
  * partial-agg'd groupBy on (cluster, dim) of integer micro-units —
  * component sums combine map-side, so no cluster, however popular, can
  * skew a partition. That is exactly the shape a 100 TB Lloyd iteration
  * must have (and the reason mini-batch variants exist for the rest).
  *
  * Determinism: squared-L2 distances are per-row sequential double
  * folds (identical on both engines — same argument as the cosine
  * kernel's oracle, LlmQueries.sqlCos); argmin ties break on cluster
  * id; mean components are floor-quantized to micro-units and summed
  * as BIGINT, so the reported centroid update is exact and partition-
  * order independent.
  */
object KMeansStep {

  /** Squared L2 between two float vectors — the native codegen'd
    * kernel (an aggregate/zip_with HOF stack is CodegenFallback and
    * interpreted per pair; same accumulation order, so results are
    * bit-identical — see [[graft.functions.SquaredDistance]]).
    */
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.SquaredDistance.squaredDistance(a, b)

  /** Nearest deterministic centroid per vector: centroids = vectors
    * whose id ≡ 0 (mod `centroidEvery`) — a seedless, SQL-replayable
    * init. Returns (vec_id, cluster, d2).
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroidEvery: Int): DataFrame =
    assignTo(emb, idCol, vecCol,
      emb.filter(col(idCol) % centroidEvery === 0)
        .select(col(idCol).as("cluster"), col(vecCol).as("cvec")))

  /** Assignment against an EXPLICIT centroid table `(cluster, cvec)` —
    * the kernel [[assign]] wraps, exposed for consumers whose centroids
    * come from elsewhere (a persisted index sidecar, a prior round's
    * update): broadcast centroids, map-only argmin pass.
    */
  def assignTo(vecs: DataFrame, idCol: String, vecCol: String,
               cents: DataFrame): DataFrame = {
    // rank on floor-quantized micro-units (ties → cluster id), the
    // same cross-engine contract bm25TopK/winsorize use. NOT round():
    // Spark rounds the shortest-decimal RENDERING (BigDecimal HALF_UP)
    // while DuckDB rounds the binary double, so a value just under a
    // .00005 boundary that renders at it flips the emitted key between
    // engines. floor() acts on the binary value identically in both —
    // and the underlying doubles are bit-identical sequential folds.
    //
    // The argmin is a STRUCT-MIN AGGREGATE, not a row_number window
    // (round-14 x32/x64 scale finding): the window form shuffled and
    // sorted the full n·k candidate expansion — quadratic wall time
    // the moment k grows with the corpus (assign's every-Nth init), a
    // 10x knee at x32 on the semdedup curves. min over
    // struct(d2_u, cluster) is the SAME lexicographic ranking
    // (distance, then cluster id), but partial-aggregates map-side:
    // the crossJoin candidates reduce to one row per vector INSIDE the
    // scan stage and the exchange carries n rows, never n·k. The n·k
    // DISTANCE FLOPS remain (brute-force assignment is the SemDedup
    // paper's own cost; hold k fixed via explicit `cents` or go
    // through the IVF coarse path when k must scale).
    vecs.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u", floor(sqDist(col("__v"), col("cvec")) * 1e6).cast("long"))
      .groupBy(col("__vid"))
      .agg(min(struct(col("d2_u"), col("cluster"))).as("__m"))
      .select(col("__vid").as("vec_id"), col("__m.cluster").as("cluster"),
        // rendering only — the ranking key is the BIGINT above
        (col("__m.d2_u").cast("double") / 1e6).as("d2"))
  }

  /** The update half: per (cluster, dimension) member count and exact
    * fixed-point component mean (micro-unit BIGINT sum, one final
    * double division).
    */
  def update(emb: DataFrame, idCol: String, vecCol: String,
             centroidEvery: Int): DataFrame = {
    val a = assign(emb, idCol, vecCol, centroidEvery)
      .select(col("vec_id"), col("cluster"))
    emb.select(col(idCol).as("vec_id"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .join(a, "vec_id")
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1e6).cast("long")).as("sum_u"))
      .withColumn("mean", col("sum_u").cast("double") / (col("n") * 1e6))
      .orderBy(col("cluster"), col("dim"))
  }

  private val sqlD2 =
    """list_sum(list_transform(list_zip(v.embedding, c.embedding), p ->
       (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""

  private def assignSql(every: Int) =
    s"""SELECT vec_id, cluster, CAST(d2_u AS DOUBLE) / 1e6 AS d2 FROM (
        SELECT v.vec_id, c.vec_id AS cluster,
          CAST(floor($sqlD2 * 1e6) AS BIGINT) AS d2_u,
          CAST(row_number() OVER (PARTITION BY v.vec_id
            ORDER BY CAST(floor($sqlD2 * 1e6) AS BIGINT) ASC NULLS LAST,
                     c.vec_id) AS INT) AS rn
        FROM embeddings v, embeddings c
        WHERE c.vec_id % $every = 0)
      WHERE rn = 1"""

  val queries: Seq[GQuery] = Seq(
    GQuery("embed_kmeans_assign",
      (s, d) => assign(Tables(s, d, "embeddings"), "vec_id", "embedding",
        centroidEvery = 50).orderBy(col("vec_id")),
      Some(assignSql(50) + "\n        ORDER BY vec_id")),

    GQuery("embed_kmeans_step",
      (s, d) => update(Tables(s, d, "embeddings"), "vec_id", "embedding",
        centroidEvery = 50),
      Some(s"""WITH a AS (${assignSql(50)}),
        m AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                 unnest(embedding) AS x
          FROM embeddings)
        SELECT a.cluster, CAST(m.dim AS INT) AS dim, count(*) AS n,
          CAST(sum(CAST(floor(CAST(m.x AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS sum_u,
          CAST(sum(CAST(floor(CAST(m.x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
            / (count(*) * 1e6) AS mean
        FROM m JOIN a USING (vec_id)
        GROUP BY a.cluster, m.dim
        ORDER BY a.cluster, m.dim""")))
}
