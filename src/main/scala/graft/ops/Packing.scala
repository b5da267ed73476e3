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
}
