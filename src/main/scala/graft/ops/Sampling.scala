package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling and split assignment for
  * training-data pipelines (SURVEY.md §2B north-star ops).
  *
  * Why hash-based rather than `df.sample`/`rand`: a training corpus
  * needs splits that are STABLE — the same document must land in the
  * same split on every run, on any cluster size, after any repartition,
  * and after incremental corpus growth (new docs never move old docs
  * between splits). Seeded `rand()` gives none of that: it is
  * partition-order dependent and reshuffles assignments when the input
  * layout changes. Hashing the document id is the standard fix (the
  * idiom behind TFDS/`datasets` split slicing): assignment is a pure
  * function of the row, so it is reproducible, join-free, map-side and
  * embarrassingly parallel at any scale.
  *
  * The hash is the first 8 hex chars of md5 (32 bits) — deliberately
  * the portable derivation the md5-twin dedup ops use, so a DuckDB
  * oracle replays assignments exactly; a salt string namespaces
  * independent draws (different salt ⇒ independent split).
  */
object Sampling {

  /** Uniform [0, 10000) bucket of a row id under a salt. */
  private[ops] def hashBucket(idCol: Column, salt: String): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(salt), idCol.cast("string"))),
      1, 8), 16, 10).cast("long"), lit(10000L))

  /** Assign each row to a named split by basis-point weights, e.g.
    * `Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000)` (must sum
    * to ≤ 10000; any remainder falls into the last split). Map-side
    * only — no shuffle, no state, stable under corpus growth.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 10000,
      s"split weights must be basis points summing to <= 10000: $splits")
    requireColumnsFree(df, "hashSplit", "split")
    val b = hashBucket(col(idCol), salt)
    val cums = splits.map(_._2).scanLeft(0)(_ + _).tail
    val assigned = splits.zip(cums).init
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), cum), rest) => when(b < cum, name).otherwise(rest)
      }
    df.withColumn("split", assigned)
  }

  /** Leakage-safe train/test split: near-duplicate CLUSTERS move as
    * units, so no near-dup pair ever straddles the boundary — the
    * dedup-aware split an eval pipeline needs (a plain per-doc hash
    * split leaks test content into train through paraphrases, the
    * exact contamination class decontamination hunts afterwards; this
    * prevents it by construction). `clusters` is
    * [[graft.ops.Cluster.dedupClusters]]'s output (only docs that HAVE
    * a near-dup appear); singletons group as themselves. The split key
    * is the GROUP id, so membership is a pure function of the cluster
    * structure — adding an unrelated doc never flips an existing
    * group's side.
    *
    * Scale: one left join docs×clusters (clusters ≪ corpus, AQE
    * broadcasts) + the map-only hash bucket. The heavy part is pair
    * generation + CC, which the caller already ran for dedup.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       salt: String, trainBps: Int): DataFrame = {
    require(trainBps >= 0 && trainBps <= 10000, s"bps out of range: $trainBps")
    requireColumnsFree(df, "leakageSafeSplit", "group_id", "split",
      "__cid", "__grp")
    val cl = clusters.select(col("doc_id").as("__cid"),
      col("cluster").as("__grp"))
    df.join(cl, col(idCol) === col("__cid"), "left")
      .withColumn("group_id", coalesce(col("__grp"), col(idCol)))
      .withColumn("split",
        when(hashBucket(col("group_id"), salt) < trainBps, "train")
          .otherwise("test"))
      .drop("__cid", "__grp")
  }

  /** Token-budget-constrained take: per group, keep documents in
    * deterministic hash-rank order while the RUNNING TOKEN SUM stays
    * within the group's budget — mixture sampling by tokens, not doc
    * counts (what an LLM data recipe actually budgets; doc-count takes
    * over-weight sources with long documents). The kept set is a pure
    * function of ids and budgets: stable under reruns, repartitions
    * and appends-after-the-fact (an appended doc ranks somewhere in
    * the order and only displaces docs ranked after it).
    *
    * Scale: one shuffle on the group key + a running-sum window within
    * each group — groups are SOURCES (bounded cardinality), and a
    * group's window parallelizes across its hash-rank range the same
    * way sample_stratified's does. For a group too large for one
    * task's sort, pre-shard by hash rank range (the pack_sequences
    * shard trick) and give each shard budget/shards.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
                        tokensCol: Column, salt: String,
                        budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__rk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    requireColumnsFree(df, "tokenBudgetSample", "n_tokens", "cum_tokens",
      "__rk")
    df.withColumn("n_tokens", tokensCol.cast("long"))
      .withColumn("__rk", hashBucket(col(idCol), salt))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .drop("__rk")
  }

  /** Keep a deterministic `bps`/10000 fraction of rows (content-stable
    * sampling: the kept set is a pure function of ids, so reruns,
    * repartitions and incremental appends agree on it).
    */
  def hashSample(df: DataFrame, idCol: String, salt: String,
                 bps: Int): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < bps)

  /** Deterministic stratified sample: the `bps`/10000 fraction of each
    * group, rounded up, chosen by hash rank within the group. Unlike
    * [[hashSample]] the per-group fraction is EXACT (ceil(n·f) rows per
    * group, not binomial), at the cost of one shuffle on the group key
    * — the window partitions by group, so skewed strata parallelize
    * across groups and a hot group is one sort partition (acceptable:
    * strata counts, unlike shingle df, are the caller's design choice).
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
                       salt: String, bps: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
    val rank = row_number().over(
      w.orderBy(hashBucket(col(idCol), salt), col(idCol)))
    requireColumnsFree(df, "stratifiedSample", "__rk", "__n")
    df.withColumn("__rk", rank)
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rk") <= ceil(col("__n") * bps / 10000.0))
      .drop("__rk", "__n")
  }

  /** Source-mixture rebalancing toward a uniform mix: down-sample every
    * group to (approximately) the smallest group's size by applying a
    * per-group keep fraction `floor(min_n · 10000 / n)` basis points as
    * a deterministic hash filter — the domain-reweighting step of a
    * pretraining data mix, with all of [[hashSample]]'s stability
    * guarantees (documents never flip in or out across reruns or corpus
    * repartitions; growth of one source only thins that source).
    *
    * Integer basis points (BIGINT arithmetic, no float division) keep
    * the fraction engine-portable. The plan is one partial-agg'd count
    * per group + a broadcast join of the (tiny) per-group rate table
    * onto the corpus — map-side at any scale.
    */
  def rebalanceUniform(df: DataFrame, idCol: String, groupCol: String,
                       salt: String): DataFrame = {
    requireColumnsFree(df, "rebalanceUniform", "keep", "__bps")
    val cnts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val minN = cnts.agg(min(col("__n")).as("__minn"))
    val rates = cnts.crossJoin(broadcast(minN))
      .withColumn("__bps", expr("__minn * 10000 DIV __n"))
      .select(col(groupCol), col("__bps"))
    df.join(broadcast(rates), groupCol)
      .withColumn("keep", hashBucket(col(idCol), salt) < col("__bps"))
      .drop("__bps")
  }

  /** Mixture sampling toward TARGET proportions — the "data mixing"
    * step of a pretraining corpus build (web 60% / code 20% / books
    * 20%): find the LARGEST total N whose per-group needs fit the
    * available counts, then take exactly floor(N·w_g/10000) rows per
    * group, chosen by hash rank (deterministic, partition-invariant,
    * stable under reruns). Groups without a weight are dropped.
    *
    * All sizing is BIGINT arithmetic in-plan (no float division, no
    * driver-side counts): N = min_g floor(avail_g·10000/w_g) via a
    * group-count aggregate joined to the literal weight table, with the
    * 1-row min broadcast back. The per-group rank window parallelizes
    * across groups; a hot group is one sort partition (the
    * [[stratifiedSample]] trade — strata are the caller's enum).
    * Exactness of per-group takes makes the whole op oracle-replayable.
    */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    salt: String, weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 10000 &&
      weights.forall(_._2 > 0),
      s"weights must be positive basis points summing to 10000: $weights")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    requireColumnsFree(df, "mixtureSample", "__rk", "__take")
    val wtab = weights.toDF(groupCol, "__w")
    // the global-min window runs over ≤ |groups| rows (the caller's
    // bounded enum) — a single-partition frame of metadata, not data;
    // it also avoids the crossJoin-of-derived-frame self-join that
    // trips conflicting-reference resolution
    val targets = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .join(broadcast(wtab), groupCol)
      .withColumn("__cap", expr("__n * 10000 DIV __w"))
      .withColumn("__nm",
        min(col("__cap")).over(Window.partitionBy()))
      .withColumn("__take", expr("__nm * __w DIV 10000"))
      .select(col(groupCol), col("__take"))
    // a weighted group with ZERO corpus rows contributes no cap row, so
    // the min would silently ignore it and the output mix would omit
    // the group at full takes for the others — per the contract
    // (largest N whose per-group needs fit the AVAILABLE counts) the
    // only honest answers are N = 0 or a loud failure; fail loudly
    // (a zero-row weighted group is a typo'd name or a broken upstream
    // filter, not a sampling decision). Bounded metadata collect.
    val present = targets.select(col(groupCol).cast("string"))
      .collect().map(_.getString(0)).toSet
    val missing = weights.map(_._1).filterNot(present)
    require(missing.isEmpty,
      s"mixtureSample: weighted group(s) absent from the corpus: " +
        s"${missing.mkString(", ")} — the requested mixture is " +
        "unsatisfiable (largest feasible N is 0)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.join(broadcast(targets), groupCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__take"))
      .drop("__rk", "__take")
  }

  /** Temperature-weighted mixture sampling at α = 1/2: target
    * proportions ∝ √n_g instead of caller-given weights — the standard
    * "temperature" rebalance multilingual/multi-source corpus builds
    * apply so high-resource groups stop drowning low-resource ones
    * while the ordering by size is preserved ([[mixtureSample]] is the
    * explicit-weights cousin; [[rebalanceUniform]] is the α → 0 limit).
    *
    * α = 1/2 specifically because √ is the one exponent IEEE-754
    * guarantees correctly rounded — `sqrt(n)` is bit-identical in every
    * engine, whereas `pow(n, 0.7)` is libm-dependent and can flip a
    * floor-quantized weight across engines. Each group's weight is
    * floor(√n_g·1e6) (one sqrt + one multiply per GROUP — metadata),
    * reduced to integer basis points of the BIGINT weight total, and
    * from there the sizing chain (caps → min → takes) and the hash-rank
    * selection are exactly [[mixtureSample]]'s — fully oracle-exact.
    * Floored basis points are clamped to ≥1 so no group divides by
    * zero or is silently dropped; Σ takes can undershoot the optimum by
    * ≤ |groups| rows (the bp resolution), which is the same contract as
    * caller-given bps. Scale shape: one partial-agg'd count, two
    * windows over ≤|groups| metadata rows, one broadcast join, one
    * per-group rank window.
    */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireColumnsFree(df, "temperatureSample", "__rk", "__take")
    val wAll = Window.partitionBy()
    val targets = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__wu",
        floor(sqrt(col("__n").cast("double")) * 1e6).cast("long"))
      .withColumn("__tw", sum(col("__wu")).over(wAll))
      .withColumn("__bp", greatest(expr("__wu * 10000 DIV __tw"), lit(1L)))
      .withColumn("__cap", expr("__n * 10000 DIV __bp"))
      .withColumn("__nm", min(col("__cap")).over(wAll))
      .withColumn("__take", expr("__nm * __bp DIV 10000"))
      .select(col(groupCol), col("__take"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol), salt), col(idCol))
    df.join(broadcast(targets), groupCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__take"))
      .drop("__rk", "__take")
  }

  /** Epoch-repetition mixing — the "data recipe" op: each source group
    * is repeated a FRACTIONAL number of epochs (basis points of an
    * epoch, 10000 = 1.0; e.g. 25000 = every doc twice, plus a stable
    * 50% subset a third time). This is how real pretraining mixes are
    * specified (high-quality sources up-sampled to n > 1 epochs, bulk
    * web capped at 1), and the fractional part must be a STABLE subset
    * — the same documents every run — or two pipeline stages disagree
    * about what epoch 2 of wiki contains. Integer epochs are a
    * map-side sequence explode; the fractional epoch selects by the
    * same salted id-hash as [[hashSample]] (partition-invariant, no
    * rand(), replayable in SQL). Output = input rows × their epoch
    * index (`epoch` column, 0-based), ~Σ n_g·bp_g/10000 rows.
    *
    * Scale shape: one broadcast join against the |groups|-row recipe
    * table + a map-side explode — no shuffle at all; the output feeds
    * [[graft.operators.GlobalOrder]]'s epoch-shuffle layout, which is
    * where the (single) range exchange happens.
    */
  def repeatEpochs(df: DataFrame, idCol: String, groupCol: String,
                   salt: String, epochsBp: Seq[(String, Int)]): DataFrame = {
    require(epochsBp.nonEmpty && epochsBp.forall(_._2 > 0),
      s"epoch factors must be positive basis points: $epochsBp")
    val spark = df.sparkSession
    import spark.implicits._
    requireColumnsFree(df, "repeatEpochs", "epoch", "__ebp", "__k", "__f")
    val wtab = epochsBp.toDF(groupCol, "__ebp")
    df.join(broadcast(wtab), groupCol)
      .withColumn("__k", expr("__ebp DIV 10000").cast("int"))
      .withColumn("__f", (col("__ebp") % 10000).cast("int"))
      // guard: sequence(0, k-1) with k = 0 would generate DESCENDING
      // [0, -1] (Spark's sequence walks backwards when stop < start),
      // not an empty array — the when() keeps sub-epoch groups correct
      .withColumn("epoch", explode(concat(
        when(col("__k") >= 1, sequence(lit(0), col("__k") - 1))
          .otherwise(array().cast("array<int>")),
        when(col("__f") > 0 && hashBucket(col(idCol), salt) < col("__f"),
          array(col("__k"))).otherwise(array().cast("array<int>")))))
      .drop("__ebp", "__k", "__f")
  }

  /** Deterministic uniform negative sampling for contrastive training:
    * `k` pseudo-random negatives per anchor over a DENSE id domain
    * [0, n) — negative j of anchor a is `md5(salt:a:j) mod n`, with a
    * self-collision deterministically bumped to the next id. The same
    * stability contract as [[hashSplit]]: the negative set is a pure
    * function of (id, j, salt), so reruns, repartitions and cluster
    * sizes agree, and the draw is refreshed per epoch by changing the
    * salt. Map-only candidate construction (k rows per anchor) + ONE
    * equi-join on the id — which is exactly the payload-fetch join the
    * training job needs anyway; no per-anchor scan, no rand().
    */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
                      salt: String): DataFrame = {
    // bounded metadata action (the id-domain size), same class as
    // GlobalOrder's partition counts. The dense-domain contract is
    // ENFORCED, not assumed: with id gaps the `neg_id` equi-join below
    // would silently drop candidates (anchors quietly get fewer than k
    // negatives — corrupt training pairs, no error), and the +1
    // self-collision bump could land on a hole. Sparse ids must be
    // ranked into a dense surrogate first (GlobalOrder.globalRank).
    val stats = df.agg(count(lit(1)), countDistinct(col(idCol)),
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    val n = stats.getLong(0)
    // count/min/max alone pass on DUPLICATED ids ([0,1,1,3]: n=4,
    // min=0, max=3) while the domain still has holes — distinctness is
    // what makes min=0 ∧ max=n-1 imply [0, n) with no gaps
    require(n == 0 ||
      (stats.getLong(1) == n &&
        stats.getLong(2) == 0L && stats.getLong(3) == n - 1),
      s"negativeSamples requires a dense DISTINCT id domain [0, n): " +
        s"got n=$n, distinct=${stats.getLong(1)}, " +
        s"min=${stats.getLong(2)}, max=${stats.getLong(3)} — rank ids " +
        "into a dense surrogate (GlobalOrder.globalRank) first")
    val cand = df.select(col(idCol).as("anchor"))
      .select(col("anchor"), explode(array((0 until k).map(lit): _*)).as("j"))
      .withColumn("h",
        pmod(conv(substring(md5(concat_ws(":", lit(salt),
          col("anchor").cast("string"), col("j").cast("string"))),
          1, 8), 16, 10).cast("long"), lit(n)))
      .withColumn("neg_id",
        when(col("h") === col("anchor"), pmod(col("h") + 1, lit(n)))
          .otherwise(col("h")))
    cand.join(df.select(col(idCol).as("__nid")), col("neg_id") === col("__nid"))
      .select(col("anchor"), col("j"), col("neg_id"))
  }

  /** 60-bit order hash: the two leading 32-bit md5 words fused as
    * `hi·2²⁸ + (lo mod 2²⁸)` — strictly positive, < 2⁶⁰. The 32-bit
    * [[hashBucket]] word alone is NOT an ordering key at scale: at 10¹¹
    * documents each 32-bit value repeats ~23×, so an order built on it
    * degenerates to id-order runs inside every collision group — a
    * structured, non-uniform shuffle exactly where the corpus is
    * biggest. 60 bits pushes the expected collision count at 10¹¹ rows
    * to ~4×10⁶ isolated pairs (id tie-break noise, not runs).
    */
  private[ops] def hashOrder60(idCol: Column, salt: String): Column = {
    val hx = md5(concat_ws(":", lit(salt), idCol.cast("string")))
    val hi = conv(substring(hx, 1, 8), 16, 10).cast("long")
    val lo = pmod(conv(substring(hx, 9, 8), 16, 10).cast("long"),
      lit(268435456L))
    hi * lit(268435456L) + lo
  }

  /** Deterministic global shuffle + shard assignment — the training
    * export's last step: reading shard 0..S−1 each in `pos` order
    * replays ONE uniform pseudo-random permutation of the corpus, and
    * any subset of shards is itself a uniform subsample (what a
    * smaller ablation run reads). Shard and position are pure
    * functions of (salt, id): reruns, repartitions and retries agree
    * byte-for-byte, and a new epoch is a new salt — none of which
    * holds for `ORDER BY rand()`.
    *
    * Scale shape: shard assignment is map-only; `pos` is a row_number
    * window partitioned by shard — ONE exchange on the shard key and a
    * within-shard sort, never a global sort (the classic
    * single-reducer trap of `ORDER BY rand()` at 100 TB). The
    * production writer pairs this with
    * `.repartition($"shard").sortWithinPartitions("__h").write
    * .partitionBy("shard")` so the exchange doubles as file layout.
    */
  private def shardOf(h: Column, numShards: Int): Column =
    pmod(h, lit(numShards.toLong)).cast("int")

  private def posOver(w: org.apache.spark.sql.expressions.WindowSpec): Column =
    (row_number().over(w) - 1).cast("long")

  /** `extraPartitionCols` prepends partition keys to the position
    * window — e.g. a `split` column, so each (split, shard) cell gets
    * its own dense positions (the pipeline_train_export shape). Shard
    * assignment itself never depends on the extras.
    */
  /** Output/scratch column names are claimed via `withColumn`, which
    * REPLACES an existing column of the same name — a caller schema
    * already containing one would be silently corrupted, so the claim
    * is checked loudly instead.
    */
  private def requireColumnsFree(df: DataFrame, ctx: String,
                                 names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$ctx writes column(s) ${clash.mkString(", ")} — rename them in " +
        "the input (they would be silently overwritten)")
  }

  def shuffleShards(df: DataFrame, idCol: String, salt: String,
                    numShards: Int,
                    extraPartitionCols: Seq[Column] = Nil): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    requireColumnsFree(df, "shuffleShards", "shard", "pos", "__h")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(extraPartitionCols :+ col("shard"): _*)
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hashOrder60(col(idCol), salt))
      .withColumn("shard", shardOf(col("__h"), numShards))
      .withColumn("pos", posOver(w))
      .drop("__h")
  }

  /** Materialize [[shuffleShards]] as the on-disk training layout:
    * `path/shard=<k>/` directories, ONE file per shard, rows inside
    * each file in `pos` order — so a trainer streams shard k top to
    * bottom and the concatenation of shards 0..S−1 IS the permutation,
    * no shuffle buffer needed reader-side. The repartition runs BEFORE
    * the position window: HashPartitioning(shard, S) satisfies the
    * window's ClusteredDistribution, so the plan carries exactly ONE
    * exchange — the same one that becomes the file layout. (Shard
    * values can hash-collide across the S partitions, so a write task
    * may own several shard dirs or none; `partitionBy` still emits one
    * sorted file per directory.) Overwrite mode: the export is a pure
    * function of (salt, ids), so a rerun replaces byte-identical
    * content.
    */
  def writeShards(df: DataFrame, idCol: String, salt: String,
                  numShards: Int, path: String): Unit = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    requireColumnsFree(df, "writeShards", "shard", "pos", "__h")
    // the one-sorted-file-per-shard contract (a trainer streams a
    // shard top to bottom AS the permutation) silently breaks if the
    // session splits files by record count: a shard dir with several
    // files has no defined cross-file order
    val maxRec = df.sparkSession.conf
      .get("spark.sql.files.maxRecordsPerFile", "0")
    require(maxRec == "0",
      s"writeShards needs one sorted file per shard dir, but " +
        s"spark.sql.files.maxRecordsPerFile=$maxRec would split them " +
        "with no defined cross-file order — unset it for this write")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hashOrder60(col(idCol), salt))
      .withColumn("shard", shardOf(col("__h"), numShards))
      .repartition(numShards, col("shard"))
      .withColumn("pos", posOver(w))
      .sortWithinPartitions(col("shard"), col("pos"))
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Per-group quality gate: keep the top ceil(n_g·keepBps/10⁴) rows
    * of each group by `scoreCol` (descending; ties → smaller id) — the
    * "top X% per domain by classifier score" filter corpus curation
    * applies after scoring, which a global threshold cannot express
    * (it would empty low-scoring domains entirely instead of keeping
    * their best X%). Callers pass an integer micro-unit score
    * (floor(score·1e6)) so the cut is engine-exact; the take count is
    * integer `DIV` arithmetic — no double rounding anywhere.
    *
    * Scale shape: the per-group count and the rank stack on ONE
    * exchange keyed by the group (two window functions, same
    * partitioning); a skewed group is one sort partition, the same
    * accepted contract as [[stratifiedSample]]. Map-side nothing is
    * recomputed per row but the comparison.
    */
  def qualityGate(df: DataFrame, idCol: String, groupCol: String,
                  scoreCol: Column, keepBps: Int): DataFrame = {
    require(keepBps >= 0 && keepBps <= 10000,
      s"keepBps must be basis points in [0, 10000]: $keepBps")
    requireColumnsFree(df, "qualityGate", "__s", "__n", "__rn")
    import org.apache.spark.sql.expressions.Window
    val wset = Window.partitionBy(col(groupCol))
    val w = wset.orderBy(col("__s").desc, col(idCol))
    df.withColumn("__s", scoreCol)
      .withColumn("__n", count(lit(1)).over(wset))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= expr(s"(__n * $keepBps + 9999) DIV 10000"))
      .drop("__s", "__n", "__rn")
  }
}
