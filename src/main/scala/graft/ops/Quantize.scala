package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization for similarity search at scale.
  *
  * Symmetric per-vector quantization: scale = max|x|/127, q_i =
  * floor(x_i/scale + 0.5) (explicit round-half-up — portable across
  * engines, unlike banker's rounding). A 100 TB float32 embedding corpus
  * becomes ~25 TB of int8 codes + one float scale per vector; scan
  * bandwidth and cache footprint of every ANN probe drop 4× and the
  * integer dot product is exact (no accumulation-order drift), which is
  * why int8 is the default storage layout in production vector systems.
  *
  * Cosine on quantized codes is approximate w.r.t. the float original
  * (quantization noise ~1/254 per component) but EXACTLY reproducible:
  * all integer arithmetic, with one final IEEE sqrt/divide — so unlike
  * the float path there is nothing seeded or engine-specific about it,
  * and the whole pipeline (quantize → dot → top-k) is oracle-checkable
  * bit for bit. Recall vs the float baseline is spec-tested.
  *
  * Expressed with array higher-order functions (`transform`/`aggregate`/
  * `zip_with`): correct and shuffle-free (map-only quantization; the
  * top-k is the same broadcast + window plan as the float brute force).
  * HOFs are CodegenFallback — a native int8-dot `Expression` is the
  * drop-in upgrade if this became the hot path (the swap point is
  * [[dot]], mirroring functions/CosineSimilarity for floats).
  */
object Quantize {

  /** Quantize `vecCol` (array<float>) → array<bigint> codes in [-127,127]
    * plus the precomputed squared norm. Zero vectors quantize to zeros.
    */
  def int8(df: DataFrame, idCol: String, vecCol: String,
           outId: String, outQ: String): DataFrame = {
    df.select(col(idCol).as(outId), col(vecCol).as("__v"))
      .withColumn("__mx",
        array_max(transform(col("__v"), x => abs(x.cast("double")))))
      .withColumn(outQ, when(col("__mx") === 0d,
          transform(col("__v"), _ => lit(0L)))
        .otherwise(transform(col("__v"),
          x => floor(x.cast("double") / (col("__mx") / lit(127d)) + lit(0.5d))
            .cast("long"))))
      .withColumn(s"${outQ}_nn",
        aggregate(col(outQ), lit(0L), (acc, v) => acc + v * v))
      .drop("__v", "__mx")
  }

  /** Exact integer dot product of two quantized code arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Brute-force cosine top-k over int8-quantized codes — same plan as
    * [[Similarity.bruteForceTopK]] (broadcast queries, map-only corpus
    * scan, per-query window) but on 4×-smaller codes with exact integer
    * accumulation. Output: qid, nid, score, rn.
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    val c = graft.util.Tables.spread(int8(corpus, idCol, vecCol, "nid", "nq"))
    val q = int8(queries, idCol, vecCol, "qid", "qq")
    // micro-unit ranking key, not round(_, 4) — the dot/norms are exact
    // integers, so the one double division + floor is engine-exact
    // (Spark's round acts on the decimal rendering, DuckDB's on the
    // binary double; see Similarity.bruteForceTopK)
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .withColumn("score_u", floor(
        dot(col("qq"), col("nq")).cast("double")
          / (sqrt(col("qq_nn").cast("double")) * sqrt(col("nq_nn").cast("double")))
          * 1e6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_u").desc, col("nid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("score_u").cast("double") / 1e6).as("score"), col("rn"))
  }
}
