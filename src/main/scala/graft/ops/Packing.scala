package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining (SURVEY.md §2B north-star ops):
  * lay documents end-to-end and slice the stream into fixed
  * context-length windows ("concat-and-chunk", the standard GPT-style
  * packing that wastes no pad tokens; a document may straddle a window
  * boundary, which pretraining accepts).
  *
  * Scale design: a single global concatenation order would serialize the
  * whole corpus through one cumulative sum. Instead the corpus is
  * sharded by a deterministic md5-derived hash of the id (the same
  * portable derivation the sampling/dedup md5-twins use, so a DuckDB
  * oracle replays everything), and the offset/window assignment is a
  * per-shard prefix sum — one window per shard, shards run in parallel,
  * and the shard count is the parallelism knob at 100 TB. Assignment is
  * a pure function of (id set, shard count, ctx), so reruns and
  * repartitions agree, like [[Sampling]]'s splits.
  */
object Packing {

  /** Per-document packing assignment: shard, exclusive start offset in
    * the shard's token stream, and the ctx-length window (`bin`) the
    * document starts in. `tokensCol` is the caller's token count —
    * typically `size(TextAnalysis.tokens(col))` for whitespace tokens
    * or a real tokenizer's count.
    */
  def concatChunk(df: DataFrame, idCol: String, tokensCol: Column,
                  ctx: Int, shards: Int, salt: String = "pack"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = Sampling.hashBucket(col(idCol), salt) % shards
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("shard", shard.cast("int"))
      .withColumn("start_off",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("start_off") / lit(ctx.toDouble)).cast("long"))
  }

  /** Window-level fill statistics: how many documents start in each
    * ctx-window and how many of its tokens are covered — the packing
    *-efficiency readout (concat-and-chunk fills every window except
    * each shard's last).
    */
  def binStats(packed: DataFrame, ctx: Int): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_started"))

  /** Length-bucketed batching accounting — the OTHER standard batch
    * layout (finetuning/inference, where sequences must not be
    * concatenated): sequences are grouped into width-`width` length
    * buckets and each batch pads to its bucket ceiling, so the padding
    * waste is (ceiling − length) per document. Emits per bucket:
    * doc count, real tokens, padded tokens, and the waste as exact
    * floor-micro basis (waste_u = ⌊waste·1e6/padded⌋ — the number a
    * curation run watches to pick `width`; width→1 drives it to 0 at
    * the cost of many tiny batches, width→∞ is one bucket padding
    * everything to the global max). Map + one partial-agg'd groupBy on
    * ~max_len/width keys — nothing here grows with corpus size except
    * the linear scan.
    */
  def lengthBuckets(df: DataFrame, idCol: String, tokensCol: Column,
                    width: Int): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val n = greatest(tokensCol.cast("long"), lit(1L)) // empty docs pad as 1
    df.select(n.as("n_tokens"))
      .withColumn("bucket", floor((col("n_tokens") - 1) / lit(width.toDouble)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_tokens", (col("bucket") + 1) * width * col("n_docs"))
      .withColumn("waste_u",
        floor((col("padded_tokens") - col("sum_tokens")) * 1e6
          / col("padded_tokens")).cast("long"))
  }
}
