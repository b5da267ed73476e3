package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding post-processing — the hygiene pass every similarity /
  * training pipeline runs before its vectors are trusted (FAISS and
  * friends assume L2-normalized inputs for cosine ≡ dot; retrieval
  * training mean-centers to kill the "anisotropy" common-direction
  * bias). Both are MAP-ONLY over the corpus: the only non-local piece
  * is mean-centering's per-dimension aggregate, which is
  * (dim-cardinality) rows broadcast back — the
  * [[LlmQueries]] coherence/k-means micro-unit pattern, so the whole
  * family is bit-exact cross-engine.
  *
  * Outputs are EXPLODED (vec_id, dim, value) scalar rows: the sums and
  * quotients are bit-identical IEEE ops in both engines (sequential
  * left folds, one sqrt, one division), so the hash oracle compares
  * raw doubles — no quantized rendering needed; arrays are avoided
  * only because scalar rows are what the compare hashes.
  */
object Embeddings {

  private def sq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2-normalize: component / ||v||. Zero vectors map to 0.0 (not
    * NaN) — the standard guard. Map-only, no shuffle anywhere.
    */
  def normalizeL2(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val n2 = sq(col(vecCol))
    emb
      .select(col(idCol), sqrt(n2).as("__nrm"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col(idCol), col("dim"),
        when(col("__nrm") === 0.0, lit(0.0))
          .otherwise(col("__x").cast("double") / col("__nrm")).as("x_n"))
  }

  /** Johnson–Lindenstrauss random projection to `kOut` dimensions with
    * a dense ±1 sign matrix (Achlioptas 2001: ±1 entries satisfy the JL
    * distance-preservation bound with the same constants as Gaussians,
    * and cost one integer hash per cell instead of a normal draw). The
    * sign of cell (j, d) is a pure function of (salt, j, d) via md5 —
    * no materialized matrix, no seed state, and DuckDB can regenerate
    * the identical matrix, so the projection is hash-oracle-checked
    * (the LSH hyperplanes in [[Similarity.bandBuckets]] are xxhash64 ⇒
    * rows-only; this is the portable twin of that construction).
    *
    * Determinism: each output component is Σ_d sign(j,d)·floor(x_d·1e6)
    * — an exact BIGINT sum (order-free), divided once by 1e6·√kOut at
    * the end (two IEEE ops, bit-identical cross-engine; √ is correctly
    * rounded by IEEE-754, unlike pow). Scale shape: ONE partial-agg'd
    * groupBy on (id, j) of integer terms — the explode fans each vector
    * to dim·kOut narrow rows map-side, combines before the exchange,
    * and nothing is ever broadcast or collected; cost is the
    * unavoidable n·dim·kOut multiply-adds of a dense projection.
    */
  def randomProject(emb: DataFrame, idCol: String, vecCol: String,
                    kOut: Int, salt: String): DataFrame = {
    val sign = when(
      conv(substring(md5(concat_ws(":", lit(salt),
          col("j"), col("dim"))), 1, 8), 16, 10).cast("long") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))
    emb
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .crossJoin(broadcast(
        emb.sparkSession.range(kOut).toDF("j")))
      .groupBy(col(idCol), col("j"))
      .agg(sum(sign * floor(col("__x").cast("double") * 1e6).cast("long"))
        .as("__su"))
      .select(col(idCol), col("j"),
        (col("__su").cast("double") / (lit(1e6) * sqrt(lit(kOut.toDouble))))
          .as("x_p"))
  }

  /** Mean-center: component − per-dimension corpus mean. The mean is
    * exact fixed-point (micro-unit BIGINT sums, one double division —
    * the k-means update contract), computed in one partial-agg'd pass
    * over a posexplode and broadcast back onto a second map-only pass;
    * vectors never shuffle whole.
    */
  def center(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val comp = emb
      .select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy("dim")
      .agg(count(lit(1)).as("__n"),
        sum(floor(col("__x").cast("double") * 1e6).cast("long")).as("__su"))
      .select(col("dim").as("__d"),
        (col("__su").cast("double") / (col("__n") * 1e6)).as("__mean"))
    emb
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .join(broadcast(comp), col("dim") === col("__d"))
      .select(col(idCol), col("dim"),
        (col("__x").cast("double") - col("__mean")).as("x_c"))
  }
}
