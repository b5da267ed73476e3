package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SemDedup, Similarity}

/** The append-after-pin trap must be LIVE for the two round-13 pinned
  * probe families ([[SemDedup.semanticAgainstIndexAt]] /
  * [[Similarity.ivfProbeIndexDetAt]]): the oracle rows prove the
  * pinned read returns the pre-append corpus, but only a divergence
  * assertion proves the fixture construction actually discriminates —
  * that a LISTING read of the same index would return something
  * different (self/sibling matches from the appended segment). Without
  * this, a broken pin that silently fell back to the listing would
  * still pass its oracle whenever the fixture were vacuous.
  *
  * Vectors are deterministic functions of `vec_id % 5`, so ids in the
  * same residue class carry IDENTICAL embeddings — the appended batch
  * (%20==0) contains exact duplicates of the probe batch (%10==0,
  * same class since 20 ≡ 0 mod 5), guaranteeing the listing read
  * produces cos-1.0 matches against the appended segment.
  */
class PinnedProbeSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def vecs(ids: Seq[Long]) =
    ids.toDF("vec_id").withColumn("embedding",
      array((0 until 4).map(d =>
        (pmod(col("vec_id") * (d + 3), lit(5)) + lit(d) * lit(0.25))
          .cast("float")): _*))

  private val all = vecs(1L to 120L)
  private def corpus = all.filter(col("vec_id") % 10 =!= 0)
  private def batch = all.filter(col("vec_id") % 10 === 0)
  private def appended = all.filter(col("vec_id") % 20 === 0)

  test("semanticAgainstIndexAt: the pinned read excludes the appended segment a listing read would self-match") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ppsem")
      .toString + "/idx"
    SemDedup.writeCellIndex(corpus, "vec_id", "embedding",
      centroidEvery = 7, idx)
    SemDedup.rebuildCellIndex(spark, idx, centroidEvery = 7) // v2 = [base]
    SemDedup.appendToCellIndex(spark, idx, appended,
      "vec_id", "embedding", ingestTag = "b0") // v3
    val pinned = SemDedup.semanticAgainstIndexAt(spark, idx, version = 2L,
      batch, "vec_id", "embedding", threshold = 0.99).collect()
    // pinned corpus = pre-append %10≠0 population only
    assert(pinned.forall(_.getAs[Long]("j") % 10 != 0),
      "pinned probe must never return an appended (batch-side) corpus id")
    val listing = SemDedup.semanticAgainstIndex(spark, idx,
      batch, "vec_id", "embedding", threshold = 0.99).collect()
    val selfish = listing.filter(r => r.getAs[Long]("j") % 20 == 0)
    assert(selfish.nonEmpty,
      "fixture is vacuous: the listing read found no matches against " +
        "the appended segment — the trap does not discriminate")
    // and among them the literal self-pairs (cos 1.0 with itself)
    assert(listing.exists(r => r.getAs[Long]("i") == r.getAs[Long]("j")),
      "listing read must self-match the appended duplicates")
  }

  test("ivfProbeIndexDetAt: the pinned top-k excludes appended vectors a listing read ranks first") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ppivf")
      .toString + "/idx"
    Similarity.ivfWriteIndexDet(corpus, "vec_id", "embedding",
      centroidEvery = 7, indexPath = idx)
    Similarity.rebuildIvfIndexDet(spark, idx) // v2 = [base]
    Similarity.ivfAppendToIndex(spark, idx, appended,
      "vec_id", "embedding", ingestTag = "b0") // v3
    val pinned = Similarity.ivfProbeIndexDetAt(spark, idx, version = 2L,
      batch, "vec_id", "embedding", k = 5, nprobe = 2).collect()
    assert(pinned.nonEmpty)
    assert(pinned.forall(_.getAs[Long]("nid") % 10 != 0),
      "pinned probe must never rank an appended (batch-side) vector")
    val listing = Similarity.ivfProbeIndexDet(spark, idx,
      batch, "vec_id", "embedding", k = 5, nprobe = 2).collect()
    // every %20==0 appended vector is an exact duplicate of some
    // queries (same residue class) — the listing top-k must surface
    // at least one of them
    assert(listing.exists(_.getAs[Long]("nid") % 20 == 0),
      "fixture is vacuous: the listing read ranked no appended vector — " +
        "the trap does not discriminate")
  }
}
