package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): choose raw-corpus documents whose hashed n-gram
  * distribution looks like a TARGET corpus (the benchmark / high-quality
  * seed set), by importance weight under a pair of bag-of-hashed-ngrams
  * models. This is the standard published alternative to classifier
  * quality filtering ([[Lr]]) — no labels and no training loop, just two
  * count passes — and the last missing first-class selection family
  * next to mixture/temperature/token-budget/leakage-safe sampling.
  *
  * Model: features are unigrams AND bigrams hashed into `buckets`
  * buckets; the target and raw corpora each induce a Laplace-smoothed
  * bucket distribution p (target) and q (raw); a document's weight is
  * log w(x) = Σ_features [log p(bk) − log q(bk)], and selection takes
  * the top-n by Gumbel-perturbed weight — Gumbel top-k IS sampling
  * ∝ w without replacement, the paper's resampling step, made
  * deterministic here by deriving the Gumbel noise from md5(salt, id)
  * (the repo-wide seedless-draw doctrine; same md5-uniform
  * construction as [[Sampling]]'s hash buckets).
  *
  * Determinism/oracle: buckets are md5-derived (replayable in DuckDB —
  * the minhash/simhash twin doctrine), per-bucket log-ratios are
  * floor-quantized micro-nats (BIGINT), a document's log-weight is an
  * exact integer SUM of those micro-nats (commutative — partition
  * order cannot perturb it), and ranking keys are integers end to end.
  * ln() itself evaluates identically on both engines' IEEE doubles —
  * the precedent [[TextAnalysis.unigramSurprisal]]'s hash-green oracle
  * established.
  *
  * Scale shape (the reason DSIR fits 100 TB where a classifier
  * ensemble struggles): the model pass is two partial-agg'd groupBys
  * whose shuffles carry `buckets` rows (256 here — NOT vocabulary- or
  * corpus-sized, that is the whole point of feature hashing); the
  * scoring pass re-explodes raw features and joins the broadcast
  * B-row log-ratio table, then one partial-agg'd per-doc integer sum;
  * selection is a top-n (TakeOrdered — per-partition heads, no global
  * sort). Nothing anywhere scales with |target|·|raw|.
  */
object Dsir {

  /** One row per feature OCCURRENCE (unigrams + bigrams), hashed to
    * `bk` ∈ [0, buckets). Two codegen'd explodes off the same scan —
    * the zipped-slice bigram construction [[TextAnalysis
    * .bigramSurprisal]] measured against HOF alternatives.
    */
  private def features(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int, salt: String): DataFrame = {
    val tkn = split(col(textCol), " ")
    val uni = df.select(col(idCol).as("doc"), explode(tkn).as("g"))
      .filter(col("g") =!= "")
    // bigrams = the k=2 kgram kernel (r17: the zipped-slices arrays_zip
    // form was a CodegenFallback HOF; TokenNgrams is the codegen'd
    // byte-scan twin, byte-identical output — TextKernelsSpec)
    val tkf = TextAnalysis.tokens(col(textCol))
    val bi = df
      .select(col(idCol).as("doc"),
        explode(SpanDedup.kgrams(tkf, 2)).as("g"))
    uni.unionByName(bi).withColumn("bk",
      conv(substring(md5(concat_ws(":", lit(salt), col("g"))), 1, 8), 16, 10)
        .cast("long") % buckets)
  }

  /** Laplace-smoothed per-bucket micro-nat log-prob table
    * `(bk, lp_u)` for one corpus — `buckets` rows, broadcast-sized.
    * Buckets with zero count still get their smoothed floor via the
    * dense bucket spine (a missing bucket must score, not NULL out).
    */
  private def bucketLogProbs(feats: DataFrame, buckets: Int): DataFrame = {
    val spark = feats.sparkSession
    val counts = feats.groupBy(col("bk")).agg(count(lit(1)).as("c"))
    val spine = spark.range(buckets).toDF("bk")
    val total = counts.agg(sum(col("c")).as("n"))
    spine.join(counts, Seq("bk"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(total))
      .select(col("bk"),
        floor(log((col("c") + 1).cast("double") / (col("n") + buckets)) * 1e6)
          .cast("long").as("lp_u"))
  }

  /** The per-bucket micro-nat log-RATIO table `(bk, lr_u)` — the whole
    * fitted model, `buckets` rows.
    */
  private def logRatios(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int, salt: String): DataFrame = {
    val p = bucketLogProbs(features(target, idCol, textCol, buckets, salt),
      buckets)
    val q = bucketLogProbs(features(raw, idCol, textCol, buckets, salt),
      buckets)
    p.join(q.withColumnRenamed("lp_u", "lq_u"), "bk")
      .select(col("bk"), (col("lp_u") - col("lq_u")).as("lr_u"))
  }

  /** Score a feature stream against a (broadcast) log-ratio table:
    * per-doc exact integer sum of micro-nat ratios + derived keys.
    */
  private def scoreFeatures(feats: DataFrame, lr: DataFrame): DataFrame =
    feats.join(broadcast(lr), "bk")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("int").as("n_feats"),
        sum(col("lr_u")).as("logw_u"))
      .select(col("doc"), col("n_feats"),
        col("logw_u"),
        (col("logw_u").cast("double") / 1e6).as("logw"),
        // one IEEE division then floor — both engines evaluate the
        // identical double, so the derived key is exact too
        floor(col("logw_u").cast("double") / col("n_feats"))
          .cast("long").as("mean_lr"))

  /** Per-document importance weights of `raw` against `target`:
    * (doc, n_feats, logw_u, logw, mean_lr) where logw_u is the exact
    * micro-nat BIGINT Σ[log p − log q] over the doc's hashed features,
    * logw its double rendering, and mean_lr the per-feature mean (the
    * length-debiased key — a long doc's sum is more extreme merely for
    * having more features). Documents with no features drop out.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 256,
                        salt: String = "dsir"): DataFrame =
    scoreFeatures(features(raw, idCol, textCol, buckets, salt),
      logRatios(raw, target, idCol, textCol, buckets, salt))

  /** Persist the fitted model — the `buckets`-row log-ratio table — as
    * a parquet "index". This is the offline half of incremental DSIR:
    * at 100 TB the two model passes run ONCE per (target, corpus
    * snapshot), and every subsequent ingest batch is scored against
    * the stored table without touching either corpus again.
    */
  def writeModel(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, modelPath: String, buckets: Int = 256,
                 salt: String = "dsir"): Unit =
    logRatios(raw, target, idCol, textCol, buckets, salt)
      .coalesce(1).write.mode("overwrite").parquet(modelPath)

  /** Score an incoming batch against a persisted model: featurize the
    * batch (map-only), broadcast-join the `buckets`-row table, one
    * partial-agg'd per-doc integer sum. Nothing scales with the corpus
    * the model was fitted on — the per-ingest-batch economics the
    * persisted shingle/cell indexes established for dedup, applied to
    * quality scoring. Same output contract as [[importanceWeights]].
    */
  def scoreAgainstModel(spark: org.apache.spark.sql.SparkSession,
                        modelPath: String, batch: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 256,
                        salt: String = "dsir"): DataFrame =
    scoreWithModel(spark.read.parquet(modelPath), batch, idCol, textCol,
      buckets, salt)

  /** [[scoreAgainstModel]] over an already-loaded model frame — the
    * form a content-pinned read needs (TrainExport's
    * `PinnedInputs.model` hands the recipe a DataFrame, not a path).
    * `buckets`/`salt` must match the model's fit, as everywhere.
    */
  def scoreWithModel(model: DataFrame, batch: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 256,
                     salt: String = "dsir"): DataFrame =
    scoreFeatures(features(batch, idCol, textCol, buckets, salt), model)

  /** The resampling step: top-`n` of `weights` by Gumbel-perturbed
    * log-weight — equivalent to drawing n documents without
    * replacement with probability ∝ w (the Gumbel-top-k identity),
    * which is exactly DSIR's sampled selection (a hard top-n by raw
    * weight would take near-duplicates of the single most target-like
    * mode; the noise spreads selection across the weight distribution).
    * The Gumbel draw is seedless: u = (md5_32(salt, doc) mod 10^6 +
    * 0.5)/10^6 (strictly inside (0,1) — both log() calls finite),
    * g = −ln(−ln u). Key = floor((logw + g)·10^6) with doc id
    * tiebreak; `keyScale` lets a caller temper the noise.
    *
    * Scale: input is one row per RAW document (already reduced); the
    * top-n is TakeOrdered-shaped — per-partition heads then one n-row
    * merge, no global sort, no collect.
    */
  def importanceTake(weights: DataFrame, n: Int,
                     salt: String = "dsirg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(concat_ws(":", lit(salt), col("doc"))), 1, 8),
      16, 10).cast("long") % 1000000L).cast("double")
    val g = -log(-log((u + 0.5) / 1e6))
    val keyed = weights.withColumn("key_u",
      floor((col("logw_u").cast("double") / 1e6 + g) * 1e6).cast("long"))
    // orderBy+limit plans as TakeOrderedAndProject — per-partition
    // top-n heads merged once, no global sort; the ranking window then
    // runs over the ≤ n surviving rows only (never the corpus)
    val top = keyed.orderBy(col("key_u").desc, col("doc")).limit(n)
    val w = Window.orderBy(col("key_u").desc, col("doc"))
    top.withColumn("rk", row_number().over(w))
      .select(col("doc"), col("n_feats"), col("logw"),
        (col("key_u").cast("double") / 1e6).as("gumbel_key"),
        col("rk"))
  }
}
