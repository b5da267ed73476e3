package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity.cosineSimilarity
import graft.util.{GQuery, Tables}

/** Semantic deduplication à la SemDeDup (Abbas et al. 2023,
  * arXiv:2303.09540): embed → k-means cluster → compare pairs ONLY
  * within a cluster → drop all but one member of each semantic
  * duplicate group. Textual near-dup (Dedup.jaccardPairs) misses
  * paraphrases and re-renderings whose token sets differ; embedding
  * cosine catches them, but the exact all-pairs compare
  * ([[Dedup.embeddingPairs]]) is O(n²) — a non-starter at 10^11 docs.
  * SemDeDup's observation is that semantic duplicates land in the SAME
  * k-means cell essentially always (they are nearest to the same
  * centroid by construction), so restricting the compare to cells cuts
  * the work to Σ|cell|² ≈ n²/k while keeping recall on true semantic
  * dups; pairs the blocking can miss are those STRADDLING a cell
  * boundary (cos near the threshold, equidistant to two centroids) —
  * the documented approximation, same trade the paper makes.
  *
  * Determinism/oracle: cell assignment is [[KMeansStep.assign]] (the
  * seedless every-Nth centroid init, argmin on floor-quantized
  * micro-unit distances, ties → cluster id), the pair filter ranks on
  * floor-quantized micro-unit cosine (the repo-wide cross-engine
  * contract — never round(), never raw doubles), and group
  * representatives come from [[Cluster.dedupClusters]]'s
  * large-star/small-star connected components. Every stage replays in
  * ANSI SQL, so unlike LSH blocking ([[Dedup.embeddingPairsLsh]],
  * rows-only) this blocked path is fully hash-oracle-checked.
  *
  * Scale shape: assignment is a map-only broadcast pass (n·k·dim
  * flops, no shuffle); the pair stage shuffles each row ONCE on its
  * cell id and compares within cells (n²/k cosines expected — k is the
  * knob, the paper uses k ≈ √n to equalize scan and compare cost); CC
  * runs on the surviving near-dup edges only. A pathologically hot
  * cell degrades toward |cell|² — at 100 TB the mitigations are more
  * centroids or recursively re-clustering oversized cells; both leave
  * this operator's contract unchanged.
  */
object SemDedup {

  /** Within-cell semantic near-dup pairs: (i, j, cell, cos) for every
    * same-cell pair with cosine ≥ `threshold`. `centroidEvery` is the
    * deterministic k-means init (ids ≡ 0 mod N are the centroids).
    */
  def semanticPairs(emb: DataFrame, idCol: String, vecCol: String,
                    centroidEvery: Int, threshold: Double): DataFrame = {
    val cells = KMeansStep.assign(emb, idCol, vecCol, centroidEvery)
      .select(col("vec_id"), col("cluster").as("cell"))
    val tagged = emb.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(cells, "vec_id")
      // both self-join sides read the tagged frame; the owned persist
      // runs the n·k assignment once and the harness sweeps the entry
      // after materialization (Caches contract, see PLANS.md round 7)
      .transform(t => graft.util.Caches.own(t))
    val thrU = math.round(threshold * 1e6)
    tagged.as("a").join(tagged.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_u",
        floor(cosineSimilarity(col("a.__v"), col("b.__v")) * 1e6))
      .filter(col("cos_u") >= thrU)
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        col("a.cell").as("cell"),
        (col("cos_u").cast("double") / 1e6).as("cos"))
  }

  /** SemDeDup keep list: connected components over the within-cell
    * near-dup pairs, one canonical (min-id) member per semantic group.
    * Only vectors that HAVE a semantic duplicate appear; everything
    * else is implicitly kept ([[Cluster.dedupClusters]]'s contract).
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    centroidEvery: Int, threshold: Double): DataFrame =
    Cluster.dedupClusters(
        semanticPairs(emb, idCol, vecCol, centroidEvery, threshold)
          .select(col("i"), col("j")))
      .withColumnRenamed("doc_id", "vec_id")

  // ---- oracle SQL ----------------------------------------------------

  private def sqlD2(v: String, c: String) =
    s"""list_sum(list_transform(list_zip($v.embedding, $c.embedding), p ->
       (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""

  private def sqlCos(x: String, y: String) =
    s"""list_sum(list_transform(list_zip($x.embedding, $y.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (sqrt(list_sum(list_transform($x.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))
       * sqrt(list_sum(list_transform($y.embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))))"""

  /** The assign + within-cell-pairs CTEs, shared by both oracles.
    * Mirrors KMeansStep's assign oracle (argmin on micro-unit d2, tie
    * → centroid id) and the micro-unit cosine threshold.
    */
  private def pairCtes(every: Int, thrU: Long) =
    s"""a AS (
        SELECT vec_id, cluster FROM (
          SELECT v.vec_id, c.vec_id AS cluster,
            row_number() OVER (PARTITION BY v.vec_id
              ORDER BY CAST(floor(${sqlD2("v", "c")} * 1e6) AS BIGINT)
                       ASC NULLS LAST, c.vec_id) AS rn
          FROM embeddings v, embeddings c
          WHERE c.vec_id % $every = 0) t
        WHERE rn = 1),
      p AS (
        SELECT ax.vec_id AS i, ay.vec_id AS j, ax.cluster AS cell,
          CAST(floor(${sqlCos("x", "y")} * 1e6) AS BIGINT) AS cos_u
        FROM a ax JOIN a ay
          ON ax.cluster = ay.cluster AND ax.vec_id < ay.vec_id
        JOIN embeddings x ON x.vec_id = ax.vec_id
        JOIN embeddings y ON y.vec_id = ay.vec_id
        WHERE CAST(floor(${sqlCos("x", "y")} * 1e6) AS BIGINT) >= $thrU)"""

  // 0.4 on this synthetic near-orthogonal corpus (max pairwise cos
  // ≈ 0.6 — see dedup_embedding); real semantic-dup corpora use ≥ 0.9
  private val Thr = 0.4
  private val ThrU = math.round(Thr * 1e6)
  private val Every = 50

  val queries: Seq[GQuery] = Seq(
    GQuery("dedup_semantic_pairs",
      (s, d) => semanticPairs(Tables(s, d, "embeddings"),
          "vec_id", "embedding", centroidEvery = Every, threshold = Thr)
        .orderBy(col("i"), col("j")),
      Some(s"""WITH ${pairCtes(Every, ThrU)}
        SELECT i, j, cell, CAST(cos_u AS DOUBLE) / 1e6 AS cos
        FROM p ORDER BY i, j""")),

    GQuery("dedup_semantic",
      (s, d) => semanticDedup(Tables(s, d, "embeddings"),
          "vec_id", "embedding", centroidEvery = Every, threshold = Thr)
        .orderBy(col("vec_id")),
      Some(s"""WITH RECURSIVE ${pairCtes(Every, ThrU)},
        e AS (SELECT i AS x, j AS y FROM p UNION SELECT j, i FROM p),
        reach(node, r) AS (
          SELECT x, y FROM e
          UNION
          SELECT reach.node, e.y FROM reach JOIN e ON reach.r = e.x)
        SELECT node AS vec_id, least(node, min(r)) AS cluster,
               CAST(least(node, min(r)) = node AS INT) AS keep
        FROM reach GROUP BY node ORDER BY vec_id""")))
}
