package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarity
import graft.ops.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import graft.util.Tables

class LlmOpsSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  test("cosine expression matches a hand computation, handles edge cases") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),        // orthogonal → 0
      (Array(1f, 2f), Array(2f, 4f)),        // parallel → 1
      (Array(1f, 2f), Array(-1f, -2f)))      // opposite → -1
      .toDF("a", "b")
      .select(CosineSimilarity.cosineSimilarity(col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    // zero norm and length mismatch → null
    val bad = Seq((Array(0f, 0f), Array(1f, 2f)), (Array(1f), Array(1f, 2f)))
      .toDF("a", "b")
      .select(CosineSimilarity.cosineSimilarity(col("a"), col("b")).as("c"))
    assert(bad.filter(col("c").isNull).count() == 2)
  }

  test("PPM codec: encode/decode round-trip, resize samples the right pixels") {
    import graft.ops.PpmImage
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val img = PpmImage.synthesize(id)
      val back = PpmImage.decode(PpmImage.encode(img))
      assert(back.width == img.width && back.height == img.height)
      assert(java.util.Arrays.equals(back.pixels, img.pixels))
      // nearest-neighbor: out(x,y) must equal src(x*w/w2, y*h/h2)
      val rs = PpmImage.resize(img, 4, 4)
      for (x <- 0 until 4; y <- 0 until 4) {
        val expected = img(x * img.width / 4, y * img.height / 4)
        assert(rs(x, y) == expected, s"id=$id ($x,$y)")
      }
    }
  }

  test("WAV codec: encode/decode round-trip, decimation keeps every k-th sample") {
    import graft.ops.WavAudio
    for (id <- Seq(0L, 3L, 42L, 499L)) {
      val clip = WavAudio.synthesize(id)
      val back = WavAudio.decode(WavAudio.encode(clip))
      assert(back.sampleRate == clip.sampleRate)
      assert(java.util.Arrays.equals(back.samples, clip.samples))
      val dec = WavAudio.decimate(clip, 4)
      assert(dec.sampleRate == 2000)
      assert(dec.samples.length == (clip.samples.length + 3) / 4)
      dec.samples.zipWithIndex.foreach { case (s, i) =>
        assert(s == clip.samples(4 * i), s"id=$id i=$i")
      }
    }
  }

  test("LSH ANN achieves high recall@10 vs brute force on sf0.001") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding", 64, 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.6, s"recall=$recall") // 32 bits / 8×4-bit bands on 500 vecs
  }

  test("PQ exact refine: recall@k vs exact L2 is >= plain ADC and high") {
    import graft.ops.Pq
    import graft.functions.SquaredDistance.squaredDistance
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, sfDir, "embeddings")
    val pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ % 10 === 0
    val q = emb.filter(pred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = emb
      .select(col("vec_id").as("nid"), col("embedding").as("nv"))
      .crossJoin(q).filter(col("nid") =!= col("qid"))
      .withColumn("d2u",
        floor(squaredDistance(col("nv"), col("qv")) * 1e6).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2u"), col("nid"))))
      .filter(col("rn") <= 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val adc = Pq.adcTopK(emb, "vec_id", "embedding", m = 8, subDim = 8,
        centroidEvery = 10, probePred = pred, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val refined = Pq.adcTopKRefined(emb, "vec_id", "embedding", m = 8,
        subDim = 8, centroidEvery = 10, probePred = pred, k = 5, refine = 8)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val rAdc = (exact intersect adc).size.toDouble / exact.size
    val rRef = (exact intersect refined).size.toDouble / exact.size
    // the refine pass re-ranks an 8× candidate pool with exact
    // distances — it can only fix ADC boundary swaps, never introduce
    // them, so refined recall dominates
    assert(rRef >= rAdc, s"refined $rRef < adc $rAdc")
    assert(rRef >= 0.6, s"refined recall too low: $rRef (adc $rAdc)")
  }

  test("IVF ANN achieves reasonable recall@10 vs brute force on sf0.001") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // near-orthogonal synthetic vectors are a worst case for IVF; half
    // the lists probed ⇒ expect at least half the true neighbors found
    assert(recall > 0.4, s"recall=$recall")
  }

  test("DSIR importance weights: target-like raw docs outscore off-distribution ones; take is ∝-weight biased") {
    import graft.ops.Dsir
    // target speaks vocabulary A; raw is half A-like, half B-like —
    // the A-like half must carry strictly higher importance weight
    def doc(v: String, seed: Int) =
      (0 until 30).map(i => s"${v}w${(i * 7 + seed) % 12}").mkString(" ")
    val target = (0 until 10).map(i => (1000L + i, doc("a", i)))
      .toDF("doc_id", "text")
    val raw = ((0 until 20).map(i => (i.toLong, doc("a", i))) ++
      (20 until 40).map(i => (i.toLong, doc("b", i))))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .select(col("doc"), col("mean_lr")).as[(Long, Long)].collect().toMap
    assert(w.size == 40, s"lost docs: ${w.size}")
    val aMin = (0 until 20).map(i => w(i.toLong)).min
    val bMax = (20 until 40).map(i => w(i.toLong)).max
    assert(aMin > bMax,
      s"A-like floor $aMin not above B-like ceiling $bMax")
    // Gumbel take at n=20: selection must be heavily biased toward the
    // A-like half (∝-weight sampling, not uniform), yet reproducible
    val take = Dsir.importanceTake(
        Dsir.importanceWeights(raw, target, "doc_id", "text"), n = 20)
      .select(col("doc")).as[Long].collect().toSet
    val aTaken = take.count(_ < 20)
    assert(aTaken >= 15, s"take not weight-biased: $aTaken/20 A-like")
    val again = Dsir.importanceTake(
        Dsir.importanceWeights(raw, target, "doc_id", "text"), n = 20)
      .select(col("doc")).as[Long].collect().toSet
    assert(again == take, "take not deterministic")
  }

  test("deterministic-quantizer IVF: sane recall, unique candidates, one list per vector") {
    // sim_ann_ivf_det's full value-correctness lives in its DuckDB
    // oracle; this spec pins the ANN-structural properties the oracle
    // can't express: recall against the exact baseline, and the
    // one-list-per-vector invariant that makes (qid, nid) candidates
    // unique without a dedup stage.
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val det = Similarity.ivfTopKDet(emb, q, "vec_id", "embedding",
      k = 10, centroidEvery = 50, nprobe = 4)
    val rows = det.select("qid", "nid").as[(Long, Long)].collect()
    assert(rows.length == rows.toSet.size, "duplicate (qid,nid) candidates")
    val recall = (exact intersect rows.toSet).size.toDouble / exact.size
    // sf0.001 has 500 vectors → 10 deterministic lists, 4 probed; the
    // arbitrary (untrained) cells cost recall vs the fitted quantizer —
    // that trade is the documented reason production keeps ivfTopK
    assert(recall > 0.25, s"recall=$recall")
    assert(rows.map(_._1).toSet == exact.map(_._1).toSet, "lost a query")
  }

  test("persisted IVF index: probe prunes unprobed list dirs and matches in-memory IVF") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/index"
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", idx, nlist = 8)
    // layout: ingest=base/list=<i>/ dirs + centroid sidecar (the
    // ingest level is what makes batchId-keyed appends idempotent)
    import scala.jdk.CollectionConverters._
    val top = java.nio.file.Files.list(java.nio.file.Paths.get(idx))
      .iterator.asScala.map(_.getFileName.toString).toSet
    assert(top.contains("ingest=base") && top.contains("_graft_centroids"),
      s"layout: $top")
    val dirs = java.nio.file.Files
      .list(java.nio.file.Paths.get(idx, "ingest=base"))
      .iterator.asScala.map(_.getFileName.toString).toSet
    assert(dirs.count(_.startsWith("list=")) == 8, s"layout: $dirs")
    val probed = Similarity.ivfProbeIndex(spark, idx, q,
      "vec_id", "embedding", k = 10, nprobe = 4)
    // the probe plan must prune at the partition level: the static isin
    // filter shows up as PartitionFilters on the index scan, so unprobed
    // list directories are never opened
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      ".*PartitionFilters: \\[[^\\]]*list".r.findFirstIn(plan).isDefined,
      s"no partition filter on list in plan:\n$plan")
    // same quantizer seed ⇒ identical results to the in-memory path
    val mem = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 4)
      .select("qid", "nid", "score", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    val got = probed.select("qid", "nid", "score", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == mem, s"indexed path diverged: ${(got diff mem).take(5)} vs ${(mem diff got).take(5)}")
  }

  test("band-parameter guards: degenerate band widths fail loudly instead of degenerating to all-pairs (round-12)") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    // width 0 (more chunks than bits): no valid banding — pre-fix the
    // zero mask collapsed every band value to 0 = full cross product
    val e1 = intercept[IllegalArgumentException](
      Dedup.simhashPairsPortable(docs, "doc_id", "text", maxDist = 32))
    assert(e1.getMessage.contains("bits"))
    // width 64 (maxDist=0, 64-bit fingerprint) is legal: the mask must
    // cover ALL bits (Scala's 1L<<64 wraps to 1 → mask 0 pre-fix), so
    // only exact-fingerprint twins pair — the identical docs do, the
    // distinct one does not
    val p0 = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 0)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(p0 == Set((1L, 2L)), s"maxDist=0 banding broken: $p0")
    // bands must divide k: a non-divisor silently dropped trailing
    // signatures (recall below the configured k)
    val e2 = intercept[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", n = 2, k = 16, bands = 5,
        threshold = 0.5))
    assert(e2.getMessage.contains("divide"))
    val e3 = intercept[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", n = 2, k = 4, bands = 8,
        threshold = 0.5))
    assert(e3.getMessage.contains("divide"))
  }

  test("det IVF: an id slice with no quantizer candidate fails loudly instead of writing a silently empty index (round-12)") {
    val emb = Tables(spark, sfDir, "embeddings")
    // every id ≡ 0 (mod 49) removed: the deterministic quantizer slice
    // is empty — pre-fix this wrote an empty index whose probes all
    // returned zero neighbors with no error
    val noCents = emb.filter(col("vec_id") % 49 =!= 0).limit(200)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_empty").toString + "/index"
    val e = intercept[IllegalArgumentException](
      Similarity.ivfWriteIndexDet(noCents, "vec_id", "embedding",
        centroidEvery = 49, indexPath = idx))
    assert(e.getMessage.contains("quantizer"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.ivfTopKDet(noCents, noCents.limit(3), "vec_id",
        "embedding", k = 3, centroidEvery = 49).count())
    assert(e2.getMessage.contains("quantizer"))
  }

  test("det IVF index append: relabeled twins find their originals, replay idempotent") {
    val emb = Tables(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 20 === 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivf_app").toString + "/index"
    Similarity.ivfWriteIndexDet(corpus, "vec_id", "embedding",
      centroidEvery = 49, indexPath = idx)
    Similarity.ivfAppendToIndex(spark, idx, batch, "vec_id", "embedding", "b0")
    val nCorpus = corpus.count(); val nBatch = batch.count()
    assert(spark.read.parquet(idx).count() == nCorpus + nBatch)
    // probing with BYTE-IDENTICAL relabeled copies of the appended
    // vectors: each query's nearest centroid is its twin's assigned
    // list, so the twin is always in a probed list and must come back
    // rank-1 with cosine exactly 1
    val twins = batch.withColumn("vec_id", col("vec_id") + 5000000L)
    val top1 = Similarity.ivfProbeIndexDet(spark, idx, twins,
        "vec_id", "embedding", k = 1, nprobe = 4)
      .select("qid", "nid", "score").as[(Long, Long, Double)].collect()
    assert(top1.length == nBatch)
    // identical vectors: floor-micro cosine is 1.0 up to one ulp of
    // float accumulation (floor can land on 0.999999)
    assert(top1.forall { case (q, n, s) => n == q - 5000000L && s >= 0.999999 },
      s"twin not rank-1: ${top1.filter(t => t._2 != t._1 - 5000000L || t._3 < 0.999999).take(5).toSeq}")
    // at-least-once replay of the same ingest tag rewrites, not duplicates
    Similarity.ivfAppendToIndex(spark, idx, batch, "vec_id", "embedding", "b0")
    assert(spark.read.parquet(idx).count() == nCorpus + nBatch,
      "replayed append duplicated rows")
    // segment-merge rebuild: ingest tree collapses to base, content ≡
    // a fresh det build over the union (same quantizer rule); the
    // rebuild converts to the CAS-versioned layout, so the raw
    // snapshot reads the resolved version dir
    Similarity.rebuildIvfIndexDet(spark, idx) // policy from the sidecar
    def snap(p: String) = spark.read.parquet(p)
      .select(col("ingest"), col("nid"), col("list").cast("long"), col("nvec"))
      .as[(String, Long, Long, Array[Float])].collect()
      .map(t => t._2 -> ((t._1, t._3, t._4.toSeq))).toMap
    val rebuilt = snap(graft.sources.IndexLifecycle.resolveDir(spark, idx))
    assert(rebuilt.values.forall(_._1 == "base"))
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_ivf_fresh").toString + "/index"
    Similarity.ivfWriteIndexDet(corpus.unionByName(batch),
      "vec_id", "embedding", centroidEvery = 49, indexPath = fresh)
    assert(rebuilt == snap(fresh), "rebuild diverged from fresh union build")
  }

  test("persisted shingle index: probe equals ground truth, hot list governs both sides, buckets prune") {
    import graft.ops.Dedup
    // planted: batch doc 0 is a near-dup of corpus doc 1's BODY (one
    // middle token changed over 20 — it sits in three 3-gram windows,
    // killing exactly 3 of the 18 body shingles); corpus docs and batch
    // doc 10 share a 5-token boilerplate prefix whose pure shingles
    // have corpus df 3 > maxDf 2 → the persisted hot list must drop
    // them from BOTH sides, so doc 10 (boilerplate-only overlap) yields
    // NO pair instead of a spurious one
    val boiler = "standard copyright header boilerplate line"
    def body(seed: Int) = (0 until 20).map(i => s"w${seed}_$i").mkString(" ")
    val nearDup = body(1).replace("w1_10 ", "CHANGED ")
    val corpus = Seq((1L, s"$boiler ${body(1)}"), (3L, s"$boiler ${body(3)}"),
      (5L, s"$boiler ${body(5)}")).toDF("doc_id", "text")
    val batch = Seq((0L, nearDup), (10L, s"$boiler ${body(10)}"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_shidx").toString + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
      nBuckets = 16, maxDf = 2)
    def ls(p: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(p))
        .iterator.asScala.map(_.getFileName.toString).toSet
    }
    // layout: ingest=<tag> is the first level (replay-idempotent batch
    // overwrites), bucket= the second (probe pruning)
    val dirs = ls(idx)
    assert(dirs.contains("ingest=base"), s"layout: $dirs")
    assert(ls(s"$idx/ingest=base").exists(_.startsWith("bucket=")),
      s"layout under ingest=base: ${ls(s"$idx/ingest=base")}")
    assert(dirs.contains("_graft_hot"), s"hot sidecar missing: $dirs")
    val probed = Dedup.jaccardAgainstIndex(spark, idx, batch,
      "doc_id", "text", n = 3, threshold = 0.5, nBuckets = 16)
    // partition-level pruning is plumbed exactly like the IVF probe
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      ".*PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"no bucket partition filter in plan:\n$plan")
    val got = probed.select("i", "j", "jaccard")
      .as[(Long, Long, Double)].collect()
    // ground truth with the hot filter: doc 1 keeps 18 body + 2 bridge
    // shingles (nj = 20; the 3 pure-boilerplate shingles are hot),
    // doc 0 has ni = 18, |∩| = 15 → J = 15/(18+20−15) = 15/23 ≈ 0.652.
    // Doc 10 must be absent — its only corpus overlap was boilerplate.
    assert(got.toSeq.map(t => (t._1, t._2)) == Seq((0L, 1L)),
      s"pairs: ${got.toSeq}")
    assert(math.abs(got(0)._3 - math.floor(15.0 / 23.0 * 1e6) / 1e6) < 1e-9)
  }

  test("embedding hygiene: normalized vectors are unit-length, centering zeroes the means") {
    import graft.ops.Embeddings
    val emb = Tables(spark, sfDir, "embeddings").limit(200)
    val n = Embeddings.normalizeL2(emb, "vec_id", "embedding")
    // ||v_n|| = 1 per vector (up to fp), and direction is preserved
    val norms = n.groupBy("vec_id")
      .agg(sum(col("x_n") * col("x_n")).as("n2"))
      .select("n2").as[Double].collect()
    assert(norms.nonEmpty)
    norms.foreach(v => assert(math.abs(v - 1.0) < 1e-9, s"norm² $v"))
    // centering: per-dim mean of the output is ~0 (quantized means are
    // exact to the micro-unit, so the residual is < 1e-6 + fp noise)
    val c = Embeddings.center(emb, "vec_id", "embedding")
    val res = c.groupBy("dim").agg(avg(col("x_c")).as("m"))
      .select("m").as[Double].collect()
    res.foreach(v => assert(math.abs(v) < 2e-6, s"residual mean $v"))
    // zero vectors normalize to zero, not NaN
    val z = Seq((1L, Array.fill(4)(0.0f)), (2L, Array(3.0f, 4.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val zn = Embeddings.normalizeL2(z, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert((0 until 4).forall(d => zn((1L, d)) == 0.0))
    assert(math.abs(zn((2L, 0)) - 0.6) < 1e-12 &&
      math.abs(zn((2L, 1)) - 0.8) < 1e-12)
  }

  test("JL random projection preserves pairwise distances within the ±1-matrix bound") {
    import graft.ops.Embeddings
    val emb = Tables(spark, sfDir, "embeddings").limit(60)
    val orig = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .as[(Long, Int, Float)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3.toDouble) }
    val proj = Embeddings.randomProject(emb, "vec_id", "embedding",
        kOut = 16, salt = "jl")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3) }
    assert(proj.values.forall(_.length == 16))
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      o = d2(orig(ids(i)), orig(ids(j))) if o > 1e-9
    } yield d2(proj(ids(i)), proj(ids(j))) / o
    assert(ratios.nonEmpty)
    // E[ratio] = 1 exactly; Var = 2/k per pair for ±1 matrices. With
    // k = 16 individual ratios scatter ~±0.35, so the MEDIAN over
    // ~1700 pairs sits well inside [0.6, 1.6] unless the sign matrix
    // is broken (all-equal signs → ratios collapse toward 0 or blow up)
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.length / 2)
    assert(median > 0.6 && median < 1.6, s"median distortion $median")
    // and no catastrophic outliers (quantization adds ≤1e-6 per term)
    assert(sortedR.head > 0.02 && sortedR.last < 8.0,
      s"extremes ${sortedR.head} .. ${sortedR.last}")
  }

  test("ingest loop: probe then append — later batches see earlier ones") {
    import graft.ops.Dedup
    def body(seed: Int) = (0 until 20).map(i => s"v${seed}_$i").mkString(" ")
    val corpusA = Seq((1L, body(1)), (2L, body(2))).toDF("doc_id", "text")
    val batchB = Seq((10L, body(10))).toDF("doc_id", "text")
    // batch C doc 20 is a near-dup of BATCH B's doc 10, not of corpus A
    val batchC = Seq((20L, body(10).replace("v10_10 ", "EDIT ")))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_shidx2").toString + "/index"
    Dedup.writeShingleIndex(corpusA, "doc_id", "text", n = 3, idx,
      nBuckets = 8)
    def probe(b: org.apache.spark.sql.DataFrame) =
      Dedup.jaccardAgainstIndex(spark, idx, b, "doc_id", "text", n = 3,
          threshold = 0.5, nBuckets = 8)
        .select("i", "j").as[(Long, Long)].collect().toSet
    // ingest B: no dup against A, then append
    assert(probe(batchB).isEmpty)
    Dedup.appendToShingleIndex(spark, idx, batchB, "doc_id", "text",
      n = 3, ingestTag = "b1", nBuckets = 8)
    // ingest C: its near-dup partner arrived in the PREVIOUS batch —
    // the probe must find it because the append made B part of the index
    assert(probe(batchC) == Set((20L, 10L)))
    // replay safety: re-running the SAME (batch, tag) — the streaming
    // at-least-once window — must overwrite its own partitions, not
    // duplicate postings (duplicates would silently inflate `common`
    // and report jaccards above the true value)
    val before = spark.read.parquet(idx).count()
    Dedup.appendToShingleIndex(spark, idx, batchB, "doc_id", "text",
      n = 3, ingestTag = "b1", nBuckets = 8)
    assert(spark.read.parquet(idx).count() == before,
      "replayed append duplicated postings")
    assert(probe(batchC) == Set((20L, 10L)))
  }

  test("forget: deletion propagates into shingle and IVF indexes, idempotent") {
    import graft.ops.{Dedup, Forget, Similarity}
    def body(seed: Int) = (0 until 20).map(i => s"f${seed}_$i").mkString(" ")
    val corpus = Seq((1L, body(1)), (3L, body(3)), (5L, body(5)))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_forget").toString + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx, nBuckets = 8)
    Dedup.appendToShingleIndex(spark,
      idx, Seq((10L, body(10))).toDF("doc_id", "text"),
      "doc_id", "text", n = 3, ingestTag = "b1", nBuckets = 8)
    def probe(seed: Int) = Dedup.jaccardAgainstIndex(spark, idx,
        Seq((99L, body(seed).replace(s"f${seed}_10 ", "EDIT ")))
          .toDF("doc_id", "text"),
        "doc_id", "text", n = 3, threshold = 0.5, nBuckets = 8)
      .select("j").as[Long].collect().toSet
    assert(probe(3) == Set(3L) && probe(10) == Set(10L))
    val othersBefore = spark.read.parquet(idx)
      .filter(!col("doc").isin(3L, 10L)).count()
    // forget one base doc and one ingested doc in one call
    val removed = Forget.fromShingleIndex(spark, idx, Seq(3L, 10L))
    assert(removed > 0)
    val left = spark.read.parquet(idx)
    assert(left.filter(col("doc").isin(3L, 10L)).count() == 0,
      "forgotten docs still have postings")
    assert(left.count() == othersBefore,
      "other docs' postings were disturbed")
    // probes of the forgotten docs' near-dups come back empty; an
    // unrelated doc is still findable
    assert(probe(3).isEmpty && probe(10).isEmpty)
    assert(probe(1) == Set(1L))
    // idempotent: nothing left to remove
    assert(Forget.fromShingleIndex(spark, idx, Seq(3L, 10L)) == 0L)

    // IVF index: forgotten vectors disappear from probe results
    val emb = Tables(spark, sfDir, "embeddings")
    val ivf = java.nio.file.Files
      .createTempDirectory("graft_forget_ivf").toString + "/index"
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", ivf,
      nlist = 4, maxFit = 100L)
    val q = emb.filter(col("vec_id") % 50 === 0)
    val top = Similarity.ivfProbeIndex(spark, ivf, q, "vec_id", "embedding",
        k = 5, nprobe = 2)
      .select("nid").as[Long].collect().toSet
    val victims = top.take(2).toSeq
    assert(Forget.fromIvfIndex(spark, ivf, victims) > 0)
    val after = Similarity.ivfProbeIndex(spark, ivf, q, "vec_id", "embedding",
        k = 5, nprobe = 2)
      .select("nid").as[Long].collect().toSet
    assert(victims.forall(v => !after.contains(v)),
      s"forgotten vectors $victims still returned: $after")
  }

  test("IVF sampled-fit quantizer (maxFit < corpus) keeps recall") {
    // the 100 TB contract: the KMeans fit sees a bounded sample, never
    // the corpus — recall must survive training on 1/5th of the vectors
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, q, "vec_id", "embedding",
        k = 10, nlist = 8, nprobe = 4, maxFit = 100L)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("embedding LSH finds planted near-duplicates (⊆ exact, high recall)") {
    // plant near-dups: jittered copies of every 5th vector (cos ≈ 0.999)
    val emb = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f) + lit(0.003f))
          .cast("array<float>").as("embedding"))
    val corpus = emb.unionByName(planted)
    val exact = Dedup.embeddingPairs(corpus, "vec_id", "embedding", 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(corpus, "vec_id", "embedding", 64, 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"${(lsh diff exact).size} false positives")
    assert(exact.nonEmpty, "planted near-dups must exceed the threshold")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall > 0.8, s"recall=$recall over ${exact.size} pairs")
  }

  test("rolling hash: order-sensitive Horner chain mod 2^31") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),   // permutation → different hash
      (3L, "alpha beta gamma"),   // identical → same hash
      (4L, ""))                   // empty → 0
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.rollingHash(col("text")).as("rh"))
    val got = df.as[(Long, Long)].collect().toMap
    assert(got(1L) == got(3L))
    assert(got(1L) != got(2L))
    assert(got(4L) == 0L)
    assert(got.values.forall(h => h >= 0 && h < TextAnalysis.rollingMod))
    // Horner step: rh("a b") == (rh("a")*B + xxhash64("b") mod M) mod M
    val parts = Seq(("a b", "a", "b")).toDF("ab", "a", "b")
      .select(
        TextAnalysis.rollingHash(col("ab")).as("rab"),
        TextAnalysis.rollingHash(col("a")).as("ra"),
        pmod(xxhash64(col("b")), lit(TextAnalysis.rollingMod)).as("hb"))
      .select(col("rab"),
        pmod(col("ra") * lit(TextAnalysis.rollingBase) + col("hb"),
          lit(TextAnalysis.rollingMod)).as("expect"))
      .as[(Long, Long)].collect().head
    assert(parts._1 == parts._2)
  }

  test("quality score stays in [0,1] and penalizes punct/digit-heavy text") {
    val df = Seq(
      (1L, "the cat and the dog is a good friend of the house and is here " +
        "with all of the family and the children today"),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3L, "123 456 789 012 345 678 901 234 567 890"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.quality(df, "text")
      .select(col("doc_id"), col("quality_score"))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(q(1L) > q(2L) && q(1L) > q(3L))
  }

  test("minhash LSH finds the planted near-duplicates (recall on j≥0.95)") {
    val docs = Tables(spark, sfDir, "documents")
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.95)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.95)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = (exact intersect lsh).size.toDouble / exact.size
      assert(recall >= 0.9, s"recall=$recall over ${exact.size} pairs")
    }
  }

  test("simhash: identical docs distance 0; near-dup pairs ⊆ low hamming") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1 && p._2 == 2 && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 3 || p._1 == 3))
  }

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "the cat and the dog is here"),
      (3L, "el gato y el perro es aqui"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
    val got = df.as[(Long, String)].collect().toMap
    assert(got(1L) == "de" && got(2L) == "en" && got(3L) == "es")
  }

  test("multimodal resize: ≤ target bytes, deterministic, identity when small") {
    val media = Multimodal.asMediaTable(
      Tables(spark, sfDir, "documents").limit(50))
    val r1 = Multimodal.resize(media, 64).orderBy("doc_id").collect()
    val r2 = Multimodal.resize(media, 64).orderBy("doc_id").collect()
    assert(r1.sameElements(r2))
    r1.foreach { row =>
      val n = row.getAs[Int]("n_bytes")
      val res = row.getAs[Array[Byte]]("resized")
      assert(res.length <= 64)
      if (n <= 64) assert(res.length == n)
    }
  }

  test("multimodal: stub features are deterministic, frames cover payload") {
    val media = Multimodal.asMediaTable(
      Tables(spark, sfDir, "documents").limit(50))
    val f1 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    val frames = Multimodal.sampleFrames(media, 8)
      .groupBy("doc_id").agg(sum(octet_length(col("frame"))).as("tb"))
    val orig = media.select(col("doc_id"),
      octet_length(col("payload")).as("nb"))
    val mismatch = frames.join(orig, "doc_id")
      .filter(col("tb") =!= col("nb")).count()
    assert(mismatch == 0)
  }

  test("hash split/sample: deterministic, partition-invariant, growth-stable, stratified-exact") {
    import graft.ops.Sampling
    val splits = Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000)
    val docs = spark.range(2000).toDF("doc_id")
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "doc_id", "s", splits)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    val a1 = assign(docs)
    // partition layout must not change assignments (rand() would)
    assert(assign(docs.repartition(13)) == a1)
    // corpus growth must not move existing docs between splits
    val aSub = assign(spark.range(500).toDF("doc_id"))
    assert(aSub.forall { case (k, v) => a1(k) == v })
    // proportions near the weights
    val nTrain = a1.values.count(_ == "train")
    assert(nTrain > 1500 && nTrain < 1700, s"train=$nTrain of 2000")
    assert(a1.size == 2000) // total: every row assigned exactly once
    // hashSample: kept set is a subset invariant and ~bps sized
    val kept = Sampling.hashSample(docs, "doc_id", "k", 1000)
      .as[Long].collect().toSet
    val kept2 = Sampling.hashSample(docs.repartition(7), "doc_id", "k", 1000)
      .as[Long].collect().toSet
    assert(kept == kept2)
    assert(kept.size > 140 && kept.size < 260, s"kept=${kept.size} of 2000")
    // stratified: EXACT ceil(n*f) per group, deterministic
    val grouped = spark.range(1000).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
    val got = Sampling.stratifiedSample(grouped, "id", "g", "st", 500)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    val sizes = grouped.groupBy("g").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (g, n) =>
      assert(got(g) == math.ceil(n * 0.05).toLong, s"group $g: ${got(g)} of $n")
    }
  }

  test("repetition: spam scores high, prose low; decontaminate finds planted overlap") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"), // spam
      (2L, "the quick brown fox jumps over a lazy dog today"), // prose
      (3L, "")).toDF("doc_id", "text")
    val rep = TextAnalysis.repetition(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    // spam: the 10 trigram windows cycle through only 2 distinct
    // trigrams → ratio 0.8; top token "buy" = 6 of 12 tokens
    assert(math.abs(rep(1L)._1 - 0.8) < 1e-12 && rep(1L)._2 == 0.5)
    // prose: all trigrams and tokens distinct
    assert(rep(2L)._1 == 0.0 && math.abs(rep(2L)._2 - 0.1) < 1e-12)
    // empty doc: both pinned to 0
    assert(rep(3L) == ((0.0, 0.0)))
    // decontamination: doc 15 shares a planted 5-gram with benchmark
    // doc 7 (%7), doc 20 shares nothing, doc 7 only matches itself
    val corpus = Seq(
      (7L, "alpha beta gamma delta epsilon zeta"),            // benchmark
      (15L, "intro words alpha beta gamma delta epsilon end"), // overlaps
      (20L, "completely different words with no shared grams at all"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramOverlap(corpus, "doc_id", "text", n = 5,
        benchPred = _ % 7 === 0)
      .as[(Long, Long)].collect().toMap
    // doc 15's "alpha beta gamma delta epsilon" is the one shared
    // 5-gram; self-matches are excluded; doc 20 absent
    assert(cont == Map(15L -> 1L))
  }

  test("surprisal scorers survive empty and one-token documents") {
    // Regression: bigramSurprisal sliced with unclamped length n-1; an
    // empty token array made that -1 and ANSI slice() throws at
    // runtime. Degenerate docs must DROP (no transitions), not crash.
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "single"),
      (4L, "two words here two words")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .select("doc").as[Long].collect().toSet
    assert(got == Set(4L), s"only the multi-token doc scores: $got")
  }

  test("keepBest: per-cluster quality argmax with id tiebreak") {
    import graft.ops.Cluster
    val clusters = Seq((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (7L, 7L, 1), (9L, 7L, 0)).toDF("doc_id", "cluster", "keep")
    val quality = Seq((1L, 0.30), (2L, 0.90), (3L, 0.90),
      (7L, 0.50), (9L, 0.10)).toDF("doc_id", "quality_score")
    val got = Cluster.keepBest(clusters, quality, "doc_id", "quality_score")
      .collect().map(r => r.getAs[Long]("cluster") ->
        ((r.getAs[Long]("best_id"), r.getAs[Double]("best_quality"),
          r.getAs[Long]("n_members")))).toMap
    // cluster 1: 2 and 3 tie at 0.90 — lower id wins; NOT the min-id
    // member 1 (quality 0.30), which plain `keep` would have chosen
    assert(got(1L) == ((2L, 0.9, 3L)))
    assert(got(7L) == ((7L, 0.5, 2L)))
  }

  test("mixtureSample hits exact per-group targets, deterministic, weight-gated") {
    import graft.ops.Sampling
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "lang")
    val weights = Seq("en" -> 5000, "zh" -> 2000, "de" -> 1500,
      "fr" -> 1000, "es" -> 500)
    val got = Sampling.mixtureSample(docs, "doc_id", "lang", "mix", weights)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // closed-form: N = min_g floor(avail*10000/w); take_g = floor(N*w/10000)
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val n = weights.map { case (g, w) => avail(g) * 10000L / w }.min
    weights.foreach { case (g, w) =>
      assert(got(g) == n * w / 10000L, s"group $g: ${got(g)}")
      assert(got(g) <= avail(g))
    }
    // the realized mix tracks the target proportions (within the floor
    // quantum of the smallest group)
    val total = got.values.sum.toDouble
    weights.foreach { case (g, w) =>
      assert(math.abs(got(g) / total - w / 10000.0) < 0.01,
        s"group $g mix ${got(g) / total} vs target ${w / 10000.0}")
    }
    // partition-invariant: same kept set under a different layout
    val a = Sampling.mixtureSample(docs, "doc_id", "lang", "mix", weights)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(docs.repartition(13), "doc_id", "lang",
        "mix", weights)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // groups without a weight are dropped entirely
    val partial = Sampling.mixtureSample(docs, "doc_id", "lang", "mix",
      Seq("en" -> 9000, "de" -> 1000))
    assert(partial.select("lang").distinct().as[String].collect().toSet ==
      Set("en", "de"))
  }

  test("mixtureSample randomized: takes are the closed-form optimum on arbitrary mixes") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val nGroups = 3 + rnd.nextInt(3)
      val groups = (0 until nGroups).map(g => s"g$g")
      val avail = groups.map(_ -> (10 + rnd.nextInt(200))).toMap
      // random positive bps summing to exactly 10000
      val raw = groups.map(_ => 1 + rnd.nextInt(100))
      val scaled = raw.map(w => math.max(1, w * 9000 / raw.sum))
      val weights = groups.zip(
        scaled.init :+ (10000 - scaled.init.sum)).toSeq
      assert(weights.map(_._2).sum == 10000 && weights.forall(_._2 > 0))
      val rows = for {
        (g, n) <- avail.toSeq; i <- 0 until n
      } yield (s"$g:$i", g)
      val df = rows.toDF("id", "grp").repartition(1 + rnd.nextInt(8))
      val got = Sampling.mixtureSample(df, "id", "grp", s"t$trial", weights)
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      val nMax = weights.map { case (g, w) => avail(g).toLong * 10000L / w }.min
      weights.foreach { case (g, w) =>
        val want = nMax * w / 10000L
        assert(got.getOrElse(g, 0L) == want,
          s"trial $trial group $g: ${got.getOrElse(g, 0L)} vs $want " +
            s"(avail ${avail(g)}, w $w, N $nMax)")
        assert(want <= avail(g))
      }
    }
  }

  test("temperatureSample: takes track sqrt proportions, feasible, partition-invariant") {
    import graft.ops.Sampling
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "lang")
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = Sampling.temperatureSample(docs, "doc_id", "lang", "temp")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // closed-form replay of the BIGINT sizing chain
    val wu = avail.map { case (g, n) =>
      g -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong }
    val tw = wu.values.sum
    val bp = wu.map { case (g, u) => g -> math.max(u * 10000L / tw, 1L) }
    val nm = avail.map { case (g, n) => n * 10000L / bp(g) }.min
    avail.keys.foreach { g =>
      assert(got.getOrElse(g, 0L) == nm * bp(g) / 10000L, s"group $g: $got")
      assert(got.getOrElse(g, 0L) <= avail(g))
    }
    // the rebalance property: every group's sampled share moves from
    // its corpus share TOWARD (here: onto, up to bp quantization) its
    // sqrt share — rare groups up-weighted, the head down-weighted
    val total = got.values.sum.toDouble
    val corpusTotal = avail.values.sum.toDouble
    avail.keys.foreach { g =>
      val sqrtShare = wu(g).toDouble / tw
      assert(math.abs(got(g) / total - sqrtShare) < 0.01,
        s"group $g share ${got(g) / total} vs sqrt share $sqrtShare")
    }
    val head = avail.maxBy(_._2)._1
    val tail = avail.minBy(_._2)._1
    if (avail(head) > avail(tail)) {
      assert(got(head) / total < avail(head) / corpusTotal,
        "head group should lose share under temperature")
      assert(got(tail) / total > avail(tail) / corpusTotal,
        "tail group should gain share under temperature")
    }
    // partition-invariant kept set
    val a = Sampling.temperatureSample(docs, "doc_id", "lang", "temp")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(docs.repartition(13), "doc_id",
        "lang", "temp")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("rebalanceUniform: every group thinned toward the min, deterministic") {
    import graft.ops.Sampling
    val df = (0 until 900).map(i =>
      (i.toLong, if (i < 600) "big" else if (i < 800) "mid" else "small"))
      .toDF("id", "g")
    val out = Sampling.rebalanceUniform(df, "id", "g", "m1")
    val kept = out.filter(col("keep")).groupBy("g").count()
      .as[(String, Long)].collect().toMap
    // small keeps everything (bps = 10000); bigger groups land near 100
    assert(kept("small") == 100L)
    assert(kept("big") > 60 && kept("big") < 140, s"big=${kept("big")}")
    assert(kept("mid") > 60 && kept("mid") < 140, s"mid=${kept("mid")}")
    // keep decisions are a pure function of (id, salt): repartition
    // cannot change them
    val again = Sampling.rebalanceUniform(df.repartition(7), "id", "g", "m1")
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(again == out.filter(col("keep")).select("id").as[Long].collect().toSet)
  }

  test("redactPii: removes emails/ips/long digit runs, counts match, order-stable") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@corp.example.org or 10.0.255.3 acct 123456789"),
      (2L, "no pii here just words and the number 42")).toDF("id", "t")
    val got = TextAnalysis.redactPii(df, "t")
      .select("id", "n_emails", "n_ips", "redacted")
      .as[(Long, Int, Int, String)].collect()
      .map { case (k, a, b, r) => k -> ((a, b, r)) }.toMap
    assert(got(1L) == ((1, 1,
      "reach me at <EMAIL> or <IP> acct <NUM>")))
    assert(got(2L) == ((0, 0, "no pii here just words and the number 42")))
  }

  test("connected components: transitive closure, canonical = min id") {
    import graft.ops.Cluster
    // {1,2,3} via a chain, {10,11}, a 4-chain {20..23}, pair {5,6}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 23L), (5L, 6L)).toDF("i", "j")
    val got = Cluster.dedupClusters(edges)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (10L, 10L, 1), (11L, 10L, 0),
      (20L, 20L, 1), (21L, 20L, 0), (22L, 20L, 0), (23L, 20L, 0),
      (5L, 5L, 1), (6L, 5L, 0)))
    // a long chain exercises multi-round propagation + early exit:
    // diameter 9 needs several rounds, maxIter stays a backstop
    val chain = (100L until 109L).map(i => (i, i + 1)).toDF("i", "j")
    val labels = Cluster.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 10 && labels.values.forall(_ == 100L))
  }

  test("pageRank: hub outranks leaves, integer ranks partition-invariant") {
    import graft.ops.Graph
    // star: 10 leaves point at hub 0; hub points back at leaf 1
    val nodes = (0L to 10L).toDF("node")
    val edges = ((1L to 10L).map(i => (i, 0L)) :+ ((0L, 1L)))
      .toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, iters = 5)
      .select("node", "u").as[(Long, Long)].collect().toMap
    assert(pr(0L) == pr.values.max, "hub must carry the max rank")
    // leaf 1 receives the hub's mass, other leaves only teleport mass
    assert(pr(1L) > pr(2L))
    assert((2L to 10L).map(pr).toSet.size == 1, "symmetric leaves equal")
    // exact integers ⇒ bit-identical under repartitioning
    val pr2 = Graph.pageRank(nodes.repartition(5), edges.repartition(3),
        iters = 5)
      .select("node", "u").as[(Long, Long)].collect().toMap
    assert(pr2 == pr)
  }

  test("int8 quantization: codes bounded, error ≤ scale/2, high recall") {
    import graft.ops.Quantize
    val emb = Tables(spark, sfDir, "embeddings")
    val q = Quantize.int8(emb, "vec_id", "embedding", "id", "q")
    // codes live in [-127, 127]
    val outOfRange = q.select(explode(col("q")).as("c"))
      .filter(abs(col("c")) > 127).count()
    assert(outOfRange == 0)
    // dequantization error is bounded by scale/2 per component
    val err = emb.select(col("vec_id").as("id"), col("embedding"))
      .join(q, "id")
      .select(greatest(lit(0.0), array_max(zip_with(col("embedding"), col("q"),
        (x, c) => abs(x.cast("double") -
          c * array_max(transform(col("embedding"), e => abs(e.cast("double")))) / 127d)
          - array_max(transform(col("embedding"), e => abs(e.cast("double")))) / 254d
      ))).as("excess"))
      .agg(max(col("excess"))).as[Double].head()
    assert(err < 1e-9, s"max excess over scale/2 bound: $err")
    // recall@10 vs the float brute force
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val quant = Quantize.int8TopK(emb, queries, "vec_id", "embedding", 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall > 0.8, s"recall=$recall")
  }

  test("PQ ADC: planted clusters recalled exactly, codes bounded, deterministic") {
    import graft.ops.Pq
    // 12 well-separated anchors (scale ~10), 10 members each with tiny
    // jitter (≤0.09) — dim 16 split m=4 × subDim=4. centroidEvery=10
    // samples member 0 of every cluster as a codeword, so each
    // cluster's members share a code block and ADC must return the 9
    // siblings of each probe before anything cross-cluster.
    val dim = 16
    // hash-spread anchors (sin(a·k + d) is a trap: a pair of anchors
    // whose phase difference lands near a multiple of 2π coincides in
    // EVERY dimension — measured with k = 37, anchors 1 and 10)
    def vec(a: Int, mb: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        (((a * dim + d) * 2654435761L % 997).toFloat / 49.85f) + mb * 0.01f)
    val rows = for (a <- 0 until 12; mb <- 0 until 10)
      yield ((a * 10 + mb).toLong, vec(a, mb))
    val emb = rows.toDF("vec_id", "embedding").repartition(7)
    val codes = Pq.encode(emb, "vec_id", "embedding",
      m = 4, subDim = 4, centroidEvery = 10)
    // every vector gets exactly m codes, all from the sampled id set
    val cc = codes.groupBy("vec_id").count().as[(Long, Long)].collect()
    assert(cc.length == 120 && cc.forall(_._2 == 4L))
    val cw = codes.select("code").distinct().as[Long].collect()
    assert(cw.forall(_ % 10 == 0))
    // probe member 9 of each cluster: its 9 siblings share its code
    // block, so they rank ahead of every cross-cluster vector
    val top = Pq.adcTopK(emb, "vec_id", "embedding",
        m = 4, subDim = 4, centroidEvery = 10,
        probePred = _ % 10 === 9, k = 9)
      .as[(Long, Long, Double, Int)].collect()
    assert(top.map(_._1).distinct.length == 12)
    top.foreach { case (qid, nid, _, _) =>
      assert(nid / 10 == qid / 10, s"probe $qid recalled cross-cluster $nid")
    }
    // partition-invariant
    val again = Pq.adcTopK(emb.repartition(3), "vec_id", "embedding",
        m = 4, subDim = 4, centroidEvery = 10,
        probePred = _ % 10 === 9, k = 9)
      .as[(Long, Long, Double, Int)].collect()
    assert(top.sortBy(t => (t._1, t._4)).toSeq ==
      again.sortBy(t => (t._1, t._4)).toSeq)

    // IVF-PQ on the same planted set: list pruning must not lose the
    // probe's siblings (tight clusters land whole in one Voronoi cell,
    // and with nprobe = 3 of 6 lists the probe's own cell is searched)
    val probes = emb.filter(col("vec_id") % 10 === 9)
    val ivfpq = Pq.ivfPqTopK(emb, probes, "vec_id", "embedding",
        k = 9, nlist = 6, nprobe = 3, m = 4, subDim = 4,
        centroidEvery = 10, maxFit = 120L)
      .as[(Long, Long, Double, Int)].collect()
    val byProbe = ivfpq.groupBy(_._1)
    assert(byProbe.size == 12)
    byProbe.foreach { case (qid, rs) =>
      val sib = rs.count(r => r._2 / 10 == qid / 10)
      assert(sib >= 7, s"probe $qid: only $sib/9 siblings recalled")
    }
  }

  test("negative sampling: k per anchor, never self, partition-invariant") {
    import graft.ops.Sampling
    val docs = Tables(spark, sfDir, "documents").select("doc_id")
    val neg = Sampling.negativeSamples(docs, "doc_id", k = 4, salt = "ep1")
      .collect().map(r => (r.getAs[Long]("anchor"), r.getAs[Int]("j"),
        r.getAs[Long]("neg_id")))
    val n = docs.count()
    assert(neg.length == n * 4)
    assert(neg.forall { case (a, _, g) => a != g }, "self-negative leaked")
    assert(neg.forall { case (_, _, g) => g >= 0 && g < n }, "id out of domain")
    // stability: a different partitioning draws the identical set
    val neg2 = Sampling.negativeSamples(docs.repartition(7), "doc_id",
        k = 4, salt = "ep1")
      .collect().map(r => (r.getAs[Long]("anchor"), r.getAs[Int]("j"),
        r.getAs[Long]("neg_id")))
    assert(neg.toSet == neg2.toSet)
    // a different salt (epoch) draws a different set
    val neg3 = Sampling.negativeSamples(docs, "doc_id", k = 4, salt = "ep2")
      .collect().map(r => (r.getAs[Long]("anchor"), r.getAs[Int]("j"),
        r.getAs[Long]("neg_id")))
    assert(neg.toSet != neg3.toSet)
    // sparse id domains must FAIL LOUDLY: with gaps, the neg_id join
    // silently under-delivers negatives (ADVICE round 5) — the dense
    // contract is enforced up front
    val sparse = docs.filter(col("doc_id") % 2 === 0)
    val err = intercept[IllegalArgumentException] {
      Sampling.negativeSamples(sparse, "doc_id", k = 4, salt = "ep1")
    }
    assert(err.getMessage.contains("dense DISTINCT id domain"))
  }

  test("hard negatives: scores inside the band, subset of the corpus scan") {
    val emb = Tables(spark, sfDir, "embeddings")
    val qs = emb.filter(col("vec_id") % 100 === 0)
    val hard = Similarity.hardNegatives(emb, qs, "vec_id", "embedding",
        k = 5, lo = 0.15, hi = 0.40).collect()
    assert(hard.nonEmpty)
    hard.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s >= 0.15 && s < 0.40, s"score $s outside band")
      assert(r.getAs[Long]("qid") != r.getAs[Long]("nid"))
    }
  }

  /** The engine's portable id hash, recomputed independently (first 8
    * md5 hex chars as a 32-bit int, mod 10000) — the spec-side referee
    * for every hash-gated sampling assertion.
    */
  private def refBucket(salt: String, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 10000
  }

  test("repeatEpochs: integer epochs exact, fractional epoch is the salted hash subset") {
    import graft.ops.Sampling
    val df = (0L until 90L).map(i => (i, Seq("a", "b", "c")((i % 3).toInt)))
      .toDF("id", "src")
    val recipe = Seq("a" -> 25000, "b" -> 10000, "c" -> 5000)
    val got = Sampling.repeatEpochs(df, "id", "src", "ep", recipe)
      .select("id", "src", "epoch").as[(Long, String, Int)]
      .collect().toSet
    val expected = (0L until 90L).flatMap { i =>
      val src = Seq("a", "b", "c")((i % 3).toInt)
      val bp = recipe.toMap.apply(src)
      val full = (0 until bp / 10000).map(e => (i, src, e))
      val frac = if (bp % 10000 > 0 && refBucket("ep", i) < bp % 10000)
        Seq((i, src, bp / 10000)) else Nil
      full ++ frac
    }.toSet
    assert(got == expected)
    // sanity on the shape: every 'b' doc exactly once at epoch 0, every
    // 'a' doc at least twice, SOME BUT NOT ALL 'a'/'c' docs drew the
    // fractional epoch (10000 ids ⇒ astronomically unlikely otherwise)
    assert(got.count(_._2 == "b") == 30)
    assert(expected.exists(t => t._2 == "a" && t._3 == 2))
    assert(expected.exists(t => t._2 == "c"))
    assert(got.groupBy(_._2).apply("a").size < 90)
    // partition invariance: the draw is content-addressed
    val re = Sampling.repeatEpochs(df.repartition(7), "id", "src", "ep", recipe)
      .select("id", "src", "epoch").as[(Long, String, Int)].collect().toSet
    assert(re == got)
  }

  test("containment: catches short-inside-long that jaccard misses; bounds hold") {
    val uniq = (1 to 40).map(k => s"w$k")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // 5 tokens, contained below
      (2L, (uniq.take(20) :+ "alpha beta gamma delta epsilon").mkString(" ")
        + " " + uniq.drop(20).mkString(" ")),
      (3L, "zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.9).select("i", "j").as[(Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L)),
      s"the quoted doc must be the one containment pair: $cont")
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.8).select("i", "j").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)),
      "jaccard at 0.8 must miss the asymmetric pair (that is the point)")
    // containment ≥ jaccard pointwise ⇒ at equal thresholds the jaccard
    // family is a subset of the containment family (real corpus)
    val corpus = Tables(spark, sfDir, "documents")
    val cj = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.8, 5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val cc = Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.8, 5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(cj.subsetOf(cc))
  }

  test("shuffleShards: exact permutation, dense per-shard positions, partition-invariant") {
    val docs = Tables(spark, sfDir, "documents")
    val n = docs.count()
    val rows = Sampling.shuffleShards(docs, "doc_id", "shuf", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(rows.length == n, "every document appears")
    assert(rows.map(_._1).distinct.length == rows.length, "exactly once")
    // positions are dense 0..|shard|-1 within every shard
    val byShard = rows.groupBy(_._2)
    byShard.foreach { case (sh, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq,
        s"shard $sh positions must be dense from 0")
    }
    // all 8 shards populated, no shard hoards (loose uniformity bound)
    assert(byShard.size == 8 && byShard.values.map(_.size).min > n / 16)
    // pure function of (salt, id): physical layout cannot move a row
    val re = Sampling.shuffleShards(docs.repartition(13), "doc_id",
        "shuf", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().toSet
    assert(re == rows.toSet, "partition-invariant")
    // a new salt is an independent permutation
    val other = Sampling.shuffleShards(docs, "doc_id", "epoch2", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().toSet
    assert(other != rows.toSet)
  }

  test("qualityGate: per-group ceil take, kept scores dominate dropped") {
    val scored = TextAnalysis.quality(
        Tables(spark, sfDir, "documents"), "text")
      .withColumn("score_u", floor(col("quality_score") * 1e6).cast("long"))
    val kept = Sampling.qualityGate(scored, "doc_id", "source",
        col("score_u"), keepBps = 3000)
      .select("doc_id", "source", "score_u")
      .as[(Long, String, Long)].collect()
    val all = scored.select("doc_id", "source", "score_u")
      .as[(Long, String, Long)].collect()
    val keptIds = kept.map(_._1).toSet
    all.groupBy(_._2).foreach { case (src, g) =>
      val k = kept.filter(_._2 == src)
      assert(k.length == (g.length * 3000 + 9999) / 10000,
        s"$src: exact ceil take")
      val dropped = g.filterNot(r => keptIds(r._1))
      if (dropped.nonEmpty && k.nonEmpty) {
        // ties split by smaller id, so dominance is non-strict
        assert(k.map(_._3).min >= dropped.map(_._3).max,
          s"$src: kept floor must dominate dropped ceiling")
      }
    }
    // keepBps = 10000 keeps everything; 0 keeps nothing
    assert(Sampling.qualityGate(scored, "doc_id", "source",
      col("score_u"), 10000).count() == all.length)
    assert(Sampling.qualityGate(scored, "doc_id", "source",
      col("score_u"), 0).count() == 0)
  }
}
