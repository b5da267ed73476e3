package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, KMeansStep, SemDedup}
import graft.util.Tables

class SemDedupSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def q6(x: Double): Long = math.floor(x * 1e6).toLong

  test("semanticPairs = brute-force within-cell pairs on the real corpus") {
    val emb = Tables(spark, sfDir, "embeddings")
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    val cells = KMeansStep.assign(emb, "vec_id", "embedding", 50)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    val expected = (for {
      (i, vi) <- vecs.toSeq; (j, vj) <- vecs.toSeq
      if i < j && cells(i) == cells(j) && q6(cos(vi, vj)) >= 400000L
    } yield (i, j) -> q6(cos(vi, vj))).toMap
    val got = SemDedup.semanticPairs(emb, "vec_id", "embedding", 50, 0.4)
      .select(col("i"), col("j"), floor(col("cos") * 1e6).cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(got == expected,
      s"got ${got.size} pairs, expected ${expected.size}")
    assert(expected.nonEmpty, "vacuous corpus test: no within-cell pairs")
  }

  test("blocked pairs are a subset of the exact all-pairs; misses straddle cells") {
    val emb = Tables(spark, sfDir, "embeddings")
    val thr = 0.3 // looser than the registered query so misses exist
    val global = Dedup.embeddingPairs(emb, "vec_id", "embedding", thr)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val blocked = SemDedup.semanticPairs(emb, "vec_id", "embedding", 50, thr)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val cells = KMeansStep.assign(emb, "vec_id", "embedding", 50)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(blocked.subsetOf(global))
    val missed = global -- blocked
    assert(missed.forall { case (i, j) => cells(i) != cells(j) },
      "a same-cell pair above threshold was dropped — blocking must only lose cross-cell pairs")
  }

  test("planted semantic dups: found, clustered, min-id kept") {
    // dim 4, centroids at ids 0 and 4 (every = 4): e0- and e1-aligned.
    // ids 1, 2 are semantic dups of id 0 (paraphrase = same direction,
    // small perturbation); ids 5-7 are far from everything.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val rows = Seq(
      0L -> v(1, 0, 0, 0),
      1L -> v(0.98, 0.02, 0, 0),
      2L -> v(0.95, 0, 0.05, 0),
      3L -> v(0.6, 0.6, 0.5, 0.1), // between cells, no dup
      4L -> v(0, 1, 0, 0),
      5L -> v(0.1, 0.9, 0.3, 0),
      6L -> v(0, 0, 1, 0),
      7L -> v(0, 0, 0, 1))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = SemDedup.semanticPairs(emb, "vec_id", "embedding", 4, 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L))
      && pairs.contains((1L, 2L)), s"planted dup group not found: $pairs")
    assert(!pairs.exists { case (i, j) => Set(i, j).exists(Set(6L, 7L)) },
      s"orthogonal vectors must not pair: $pairs")
    val keep = SemDedup.semanticDedup(emb, "vec_id", "embedding", 4, 0.9)
      .select("vec_id", "cluster", "keep").as[(Long, Long, Int)]
      .collect().toSet
    val grp = keep.filter(_._2 == 0L)
    assert(grp.map(_._1) == Set(0L, 1L, 2L),
      s"semantic group should be {0,1,2}: $keep")
    assert(grp.count(_._3 == 1) == 1 && grp.exists(t => t._1 == 0L && t._3 == 1),
      s"exactly the min id is kept: $grp")
  }

  test("auto pairs with no hot cells = semanticPairs, all mode 'full'") {
    val emb = Tables(spark, sfDir, "embeddings")
    val plain = SemDedup.semanticPairs(emb, "vec_id", "embedding", 50, 0.4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val auto = SemDedup.semanticPairsAuto(emb, "vec_id", "embedding",
        50, 0.4, maxCell = 1000000000L, subEvery = 20)
      .select("i", "j", "mode").as[(Long, Long, String)].collect()
    assert(auto.map(t => (t._1, t._2)).toSet == plain)
    assert(auto.nonEmpty && auto.forall(_._3 == "full"),
      "no block exceeds a huge maxCell, so every pair must be mode=full")
  }

  test("planted unimodal pile: star mode caps pairs linearly, same components as exact") {
    // A pile of 10 near-identical vectors (per-member perturbation
    // ~1e-5, so every pairwise floor-micro d2 quantizes to 0): the
    // one-level sub-split ties every member into ONE block — the
    // round-7 negative result — and capped stays quadratic there.
    // Ids 0,4,8 are top-level centroids drawn FROM the pile; the
    // whole pile ties to cell 0. Ids 12/13 are a cold two-member cell.
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val pile = (0L to 9L).map(k => k -> v(1.0, k * 1e-5, 0, 0))
    val cold = Seq(12L -> v(0, 0, 1, 0), 13L -> v(0, 0, 0.98, 0.02))
    val emb = (pile ++ cold).toDF("vec_id", "embedding")
    val auto = SemDedup.semanticPairsAuto(emb, "vec_id", "embedding",
        centroidEvery = 4, threshold = 0.9, maxCell = 5L, subEvery = 2)
      .select("i", "j", "mode").as[(Long, Long, String)].collect()
    val star = auto.filter(_._3 == "star")
    assert(star.length == 9 && star.forall(_._1 == 0L),
      s"pile must emit 9 anchor edges from min-id 0, got ${star.toSeq}")
    assert(auto.filter(_._3 == "full").map(t => (t._1, t._2)).toSet
        == Set((12L, 13L)),
      s"cold cell keeps exact all-pairs: ${auto.toSeq}")
    // capped (same params) cannot split the pile: quadratic 45 pairs
    val capped = SemDedup.semanticPairsCapped(emb, "vec_id", "embedding",
        4, 0.9, maxCell = 5L, subEvery = 2)
      .select("i", "j").as[(Long, Long)].collect()
    assert(capped.count(t => t._1 <= 9L && t._2 <= 9L) == 45,
      s"sub-split should tie the pile into one quadratic block, got ${capped.length}")
    // the star edges close to the SAME components as exact all-pairs
    import graft.ops.Cluster
    def labels(pairs: org.apache.spark.sql.DataFrame) =
      Cluster.connectedComponents(pairs.select("i", "j"))
        .as[(Long, Long)].collect().toMap
    val exact = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.9)
    assert(labels(SemDedup.semanticPairsAuto(emb, "vec_id", "embedding",
        4, 0.9, 5L, 2)) == labels(exact),
      "pile star edges must yield the same dedup components as exact pairs")
  }

  test("cell-index rebuild re-absorbs ingest segments ≡ fresh build over the union") {
    val emb = Tables(spark, sfDir, "embeddings")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 20 === 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_cell_rebuild").toString
    val idx = root + "/index"
    SemDedup.writeCellIndex(corpus, "vec_id", "embedding", 49, idx)
    SemDedup.appendToCellIndex(spark, idx, batch, "vec_id", "embedding", "b0")
    SemDedup.rebuildCellIndex(spark, idx, centroidEvery = 49)
    def snap(p: String) = spark.read.parquet(p)
      .select(col("ingest"), col("vec_id"), col("cell").cast("long"),
        col("embedding"))
      .as[(String, Long, Long, Array[Float])].collect()
      .map(t => t._2 -> ((t._1, t._3, t._4.toSeq))).toMap
    // the rebuild converts to the CAS-versioned layout — raw snapshot
    // reads must target the resolved version dir
    val rebuilt = snap(graft.sources.IndexLifecycle.resolveDir(spark, idx))
    assert(rebuilt.values.forall(_._1 == "base"),
      "ingest segments must collapse to base")
    val fresh = root + "/fresh"
    SemDedup.writeCellIndex(corpus.unionByName(batch),
      "vec_id", "embedding", 49, fresh)
    assert(rebuilt == snap(fresh),
      "rebuild must equal a fresh build over the union (same quantizer rule)")
    // probes against the rebuilt index still work (sidecar swapped too)
    assert(SemDedup.semanticAgainstIndex(spark, idx,
      emb.filter(col("vec_id") % 20 === 10), "vec_id", "embedding",
      threshold = 0.0).count() > 0)
  }

  test("cell-index rebuild: crashed unpublished version is invisible to probes and pruned") {
    import graft.sources.IndexLifecycle
    val emb = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 10 =!= 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_cell_crash").toString
    val idx = root + "/index"
    SemDedup.writeCellIndex(emb, "vec_id", "embedding", 49, idx)
    SemDedup.rebuildCellIndex(spark, idx, centroidEvery = 49)
    val before = spark.read.parquet(IndexLifecycle.resolveDir(spark, idx)).count()
    // simulate a rebuild that died mid-write: an unpublished claimed
    // version dir full of garbage (no marker ever committed). Readers
    // resolve the published version and never see it.
    val orphan = new java.io.File(idx, "g000000099")
    spark.range(3).toDF("junk").coalesce(1).write.parquet(orphan.toString)
    val served = spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
    assert(served.count() == before)
    assert(!served.columns.contains("junk"), "orphan content leaked into reads")
    // the next rebuild proceeds normally and prunes the expired orphan
    // (orphanGraceMs=0: no claim protects it, so it ages out at once)
    IndexLifecycle.rebuild(spark, idx, orphanGraceMs = 0L) {
      (src, _, dst) =>
        SemDedup.writeCellIndex(
          src.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", 49, dst)
    }
    assert(!orphan.exists(), "expired orphan version dir not reclaimed")
    assert(spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .count() == before, "rebuild lost rows")
  }

  test("cell-index forget: targets vanish, survivors byte-identical, probe blind to them, idempotent") {
    import graft.ops.Forget
    val emb = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 10 =!= 0)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_forget_cell_spec").toString + "/index"
    SemDedup.writeCellIndex(emb, "vec_id", "embedding",
      centroidEvery = 49, idx)
    val before = spark.read.parquet(idx)
      .select(col("vec_id"), col("cell").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3.toSeq))).toMap
    val victims = before.keys.filter(_ % 7 == 0).toSeq
    assert(victims.nonEmpty)
    assert(Forget.fromCellIndex(spark, idx, victims) == victims.size.toLong)
    val after = spark.read.parquet(idx)
      .select(col("vec_id"), col("cell").cast("long"), col("embedding"))
      .as[(Long, Long, Array[Float])].collect()
      .map(t => t._1 -> ((t._2, t._3.toSeq))).toMap
    assert(victims.forall(v => !after.contains(v)), "forgotten ids survive")
    assert(after == before -- victims,
      "survivors' cell or vector payload disturbed by the rewrite")
    // a probe batch no longer surfaces forgotten neighbors
    val probe = SemDedup.semanticAgainstIndex(spark, idx,
        Tables(spark, sfDir, "embeddings").filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", threshold = 0.0)
      .select("j").as[Long].collect().toSet
    assert(victims.forall(v => !probe.contains(v)),
      "probe still returns forgotten vectors")
    // idempotent: nothing left to remove
    assert(Forget.fromCellIndex(spark, idx, victims) == 0L)
  }
}
