package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for vector search at corpus scale
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", PAMI 2011 — the storage layout behind FAISS's IVF-PQ).
  *
  * The 100 TB story: [[Quantize]]'s scalar int8 gets 4× compression;
  * PQ splits each vector into `m` subvectors and stores only the id of
  * the nearest per-subspace codeword — dim 64 floats (256 B) become
  * m = 8 single-byte codes (32× — plus one shared ks×m codebook). An
  * ADC scan (asymmetric distance computation: full-precision query
  * against the codebook, one lookup-table probe per stored code) then
  * touches 8 bytes per candidate instead of 256, which is the
  * difference between a memory-resident index and a disk-bound one at
  * 10^11 vectors.
  *
  * Unlike Spark-ML-backed IVF (rows-only: its quantizer fit is not
  * replayable in SQL), every stage here is under the hash oracle: the
  * codebook is the seedless [[KMeansStep]] sample (subvectors of every
  * `centroidEvery`-th vector — deterministic, SQL-replayable), the
  * assignment is argmin over floor-micro-unit distances with ties to
  * the lowest codeword id, and ADC scores are exact BIGINT sums of
  * per-subspace micro-unit distances. Recall vs the exact scan is
  * spec-tested on planted clusters ([[LlmOpsSpec]]); refining the
  * codebook with Lloyd iterations ([[KMeansStep.update]] per subspace)
  * improves recall but is deliberately not fused in — sampled
  * codebooks keep the oracle one CTE chain.
  *
  * Scale shape: the codebook and the probe LUT are broadcast metadata
  * (ks·m and ks·m·|probes| rows); encode is one broadcast join + one
  * partial-agg'd min per (vector, subspace); the ADC scan is one
  * broadcast join + one partial-agg'd sum per (probe, vector). No
  * all-pairs stage, no full-vector shuffle after encode.
  */
object Pq {

  private def sqDist(a: Column, b: Column): Column =
    graft.functions.SquaredDistance.squaredDistance(a, b)

  /** Explode each vector into its `m` subvectors of `subDim` dims:
    * one narrow (`__id`, j, sv) row per subspace — map-only.
    */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String,
                         m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col(vecCol), j * subDim + 1, subDim).as("sv"))): _*))
          .as("b"))
      .select(col("__id"), col("b.j").as("j"), col("b.sv").as("sv"))

  /** The per-subspace codebook (c, j, cv): subvectors of every
    * `centroidEvery`-th vector of `emb` — the seedless sample
    * [[KMeansStep]] uses for init, chosen here so the codebook is
    * SQL-replayable (a Lloyd-refined codebook improves recall but
    * would push the oracle through unrolled iterations).
    */
  def codebook(emb: DataFrame, idCol: String, vecCol: String,
               m: Int, subDim: Int, centroidEvery: Int): DataFrame =
    subvectors(emb.filter(col(idCol) % centroidEvery === 0),
        idCol, vecCol, m, subDim)
      .select(col("__id").as("c"), col("j"), col("sv").as("cv"))

  /** Per-(vector, subspace) micro-unit distances to every codeword:
    * (`__id`, j, c, du). The codebook is broadcast to a map-only join
    * keyed on the subspace.
    */
  private def distancesTo(df: DataFrame, idCol: String, vecCol: String,
                          cb: DataFrame, m: Int, subDim: Int): DataFrame =
    subvectors(df, idCol, vecCol, m, subDim)
      .join(broadcast(cb), "j")
      .withColumn("du", floor(sqDist(col("sv"), col("cv")) * 1e6).cast("long"))

  private def distances(emb: DataFrame, idCol: String, vecCol: String,
                        m: Int, subDim: Int, centroidEvery: Int): DataFrame =
    distancesTo(emb, idCol, vecCol,
      codebook(emb, idCol, vecCol, m, subDim, centroidEvery), m, subDim)

  /** PQ codes: (id, j, code) — the nearest codeword per subspace,
    * ties to the lowest codeword id (min on a (du, c) struct compares
    * lexicographically, and the min is partial-agg'd map-side — no
    * window, no skew).
    */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             m: Int, subDim: Int, centroidEvery: Int): DataFrame =
    distances(emb, idCol, vecCol, m, subDim, centroidEvery)
      .groupBy(col("__id"), col("j"))
      .agg(min(struct(col("du"), col("c"))).as("mn"))
      .select(col("__id").as(idCol), col("j"), col("mn.c").as("code"))

  /** ADC top-k: for each probe (full precision), score every OTHER
    * encoded vector by Σ_j lut(j, code_j) where lut is the probe's
    * per-(subspace, codeword) distance table, and keep the k nearest
    * by (score, id). Scores are exact BIGINT micro-unit sums —
    * rendered as `ad2` (approximate squared L2; approximate w.r.t. the
    * raw vectors, exactly reproducible w.r.t. the codes).
    */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
              m: Int, subDim: Int, centroidEvery: Int,
              probePred: Column => Column, k: Int): DataFrame = {
    val d2 = distances(emb, idCol, vecCol, m, subDim, centroidEvery)
    val codes = d2
      .groupBy(col("__id"), col("j"))
      .agg(min(struct(col("du"), col("c"))).as("mn"))
      .select(col("__id").as("nid"), col("j"), col("mn.c").as("code"))
    // the LUT branch re-derives the (map-only) distance frame with the
    // probe filter pushed into the scan — ks·m rows per probe
    val lut = d2.filter(probePred(col("__id")))
      .select(col("__id").as("qid"), col("j").as("lj"), col("c"), col("du"))
    val scores = codes
      .join(broadcast(lut), col("j") === col("lj") && col("code") === col("c"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("du")).as("ad2_u"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ad2_u"), col("nid"))
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("ad2_u").cast("double") / 1e6).as("ad2"), col("rn"))
  }

  /** ADC-with-exact-refine: PQ's quantization error is concentrated
    * at the top-k BOUNDARY (two candidates whose true distances differ
    * by less than the cell diameter can swap ranks), so production
    * FAISS re-ranks a slightly larger ADC candidate set with exact
    * distances. Here: ADC top `refine·k` per probe, then exact
    * floor-micro squared-L2 against the RAW vectors of those
    * candidates only, keep top k by (d2, id).
    *
    * Scale shape: the refine join touches |probes|·refine·k candidate
    * rows — metadata-sized, never the corpus; the raw-vector fetch is
    * an equi-join on id (the only stage that reads full vectors after
    * encode, and only for candidates). Fully oracle-checked like
    * [[adcTopK]] — the refine stage is one more CTE on the same chain.
    */
  def adcTopKRefined(emb: DataFrame, idCol: String, vecCol: String,
                     m: Int, subDim: Int, centroidEvery: Int,
                     probePred: Column => Column, k: Int,
                     refine: Int = 4): DataFrame = {
    val cand = adcTopK(emb, idCol, vecCol, m, subDim, centroidEvery,
      probePred, k * refine).select(col("qid"), col("nid"))
    val vecs = emb.select(col(idCol).as("__rid"), col(vecCol).as("__rv"))
    val probes = emb.filter(probePred(col(idCol)))
      .select(col(idCol).as("__pid"), col(vecCol).as("__pv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d2_u"), col("nid"))
    cand.join(vecs, col("nid") === col("__rid"))
      .join(broadcast(probes), col("qid") === col("__pid"))
      .withColumn("d2_u", floor(sqDist(col("__rv"), col("__pv")) * 1e6).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("d2_u").cast("double") / 1e6).as("d2"), col("rn"))
  }

  /** IVF-PQ: the canonical FAISS production layout — an IVF coarse
    * quantizer prunes the corpus to the `nprobe` nearest inverted
    * lists per query, and only THOSE candidates are ADC-scored from
    * their 8-byte PQ codes. The two compressions multiply: a probe
    * touches nprobe/nlist of the corpus, at 32× less bytes per touched
    * row — at 10^11 vectors that is the difference between an
    * interactive probe and a full-corpus scan either axis alone can't
    * close. Rows-only (the Spark-ML KMeans coarse quantizer's fit is
    * not SQL-replayable — the reason [[adcTopK]] exists as the
    * oracle-checked flat twin); planted-cluster recall is spec-tested.
    *
    * Scale shape: fit is bounded by `maxFit` (never corpus-sized);
    * membership and codes are map-only derivations; the candidate set
    * is one broadcast join on `list` (∝ probed postings), the ADC join
    * is per-candidate metadata, and the sum is partial-agg'd. Nothing
    * driver-side beyond the bounded KMeans fit.
    */
  /** IVF-PQ with the DETERMINISTIC coarse quantizer — the composition
    * anchor for the production config: [[Similarity.ivfTopKDet]]'s
    * coarse stage (seedless every-`coarseEvery`-th centroids, min_by
    * floor-micro-d2 assignment with ties to the smaller list,
    * (d2, list)-ranked probes) feeding [[adcTopK]]'s PQ stage
    * (seedless codebook, argmin codes, exact BIGINT ADC sums). Every
    * stage replays verbatim in ANSI SQL, so the END-TO-END IVF-PQ
    * pipeline — coarse assign → probe prune → ADC — is hash-oracle-
    * checked, not just its two halves separately; the seeded
    * [[ivfPqTopK]] stays the production form (fitted quantizer,
    * better-balanced lists), recall-spec'd against this anchor's exact
    * flat twin.
    *
    * Scale shape identical to [[ivfPqTopK]]: centroids and codebook
    * are broadcast metadata, assignment and encode are partial-agg'd
    * map-side folds, candidates ∝ probed postings, never corpus².
    */
  def ivfPqTopKDet(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, coarseEvery: Int = 50,
                   nprobe: Int = 4, m: Int = 8, subDim: Int = 8,
                   centroidEvery: Int = 50): DataFrame = {
    val cents = corpus.filter(col(idCol) % coarseEvery === 0)
      .select(col(idCol).as("list"), col(vecCol).as("cvec"))
    val assigned = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u", floor(sqDist(col("nvec"), col("cvec")) * 1e6).cast("long"))
      .groupBy(col("nid"))
      .agg(min_by(col("list"), struct(col("d2_u"), col("list"))).as("list"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d2_u"), col("list"))
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_u", floor(sqDist(col("qvec"), col("cvec")) * 1e6).cast("long"))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("qid", "list")
    val cb = codebook(corpus, idCol, vecCol, m, subDim, centroidEvery)
    val codes = distancesTo(corpus, idCol, vecCol, cb, m, subDim)
      .groupBy(col("__id"), col("j"))
      .agg(min(struct(col("du"), col("c"))).as("mn"))
      .select(col("__id").as("nid"), col("j"), col("mn.c").as("code"))
    // a vector sits in exactly one list and probe rows are distinct
    // (qid, list), so candidate pairs are unique without a distinct
    val cand = assigned
      .join(broadcast(probes), "list")
      .filter(col("nid") =!= col("qid"))
      .select("qid", "nid")
    val lut = distancesTo(queries, idCol, vecCol, cb, m, subDim)
      .select(col("__id").as("lqid"), col("j").as("lj"),
        col("c"), col("du"))
    val scores = cand
      .join(codes, "nid")
      .join(broadcast(lut),
        col("qid") === col("lqid") && col("j") === col("lj") &&
          col("code") === col("c"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("du")).as("ad2_u"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ad2_u"), col("nid"))
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("ad2_u").cast("double") / 1e6).as("ad2"), col("rn"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, subDim: Int = 8, centroidEvery: Int = 50,
                seed: Long = 42L, maxFit: Long = 100000L): DataFrame = {
    val (assigned, cents) =
      Similarity.ivfFit(corpus, idCol, vecCol, nlist, seed, maxFit)
    val cb = codebook(corpus, idCol, vecCol, m, subDim, centroidEvery)
    val codes = distancesTo(corpus, idCol, vecCol, cb, m, subDim)
      .groupBy(col("__id"), col("j"))
      .agg(min(struct(col("du"), col("c"))).as("mn"))
      .select(col("__id").as("nid"), col("j"), col("mn.c").as("code"))
    val probes = Similarity.probeLists(queries, cents, idCol, vecCol, nprobe)
    // candidates = members of probed lists (the IVF pruning step);
    // self-pairs dropped before any scoring work
    val cand = assigned.select(col("nid"), col("list"))
      .join(broadcast(probes.select(col("qid"), col("list"))), "list")
      .filter(col("nid") =!= col("qid"))
      .select("qid", "nid")
    // the probe's LUT: distances from ITS subvectors to the shared
    // codebook — ks·m rows per probe, broadcast
    val lut = distancesTo(queries, idCol, vecCol, cb, m, subDim)
      .select(col("__id").as("lqid"), col("j").as("lj"),
        col("c"), col("du"))
    val scores = cand
      .join(codes, "nid")
      .join(broadcast(lut),
        col("qid") === col("lqid") && col("j") === col("lj") &&
          col("code") === col("c"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("du")).as("ad2_u"))
    val w = Window.partitionBy(col("qid")).orderBy(col("ad2_u"), col("nid"))
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("nid"),
        (col("ad2_u").cast("double") / 1e6).as("ad2"), col("rn"))
  }
}
