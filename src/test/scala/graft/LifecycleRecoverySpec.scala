package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Forget}
import graft.sources.{Compaction, IndexLifecycle, ManifestCommit, MemoryManifestCommit}

/** Crash- and race-path recovery contracts surfaced by the round-12
  * core review — each test pins one fixed failure mode:
  *
  *  1. read-snapshot publish fencing (`expectGen`): a read-modify-write
  *     table writer whose input predates an interleaved publish must
  *     LOSE, not silently roll that publish back (the forgetRows
  *     victim-resurrection scenario);
  *  2. sealSegment crash recovery: the parked `.replaced` copy of a
  *     chain-referenced segment is RESTORED on replay, never deleted
  *     while it is the only committed copy;
  *  3. convert() crash recovery: a prior attempt's partially-filled
  *     generation dir is flattened into the new one, not nested
  *     invisibly inside it;
  *  4. toGenerational moves partition DIRECTORIES, not just top-level
  *     files — a partitionBy-written flat table must not convert to an
  *     empty generation;
  *  5. an all-forgotten version's EMPTY segment set stays pinned and
  *     replayable (recorded-empty ≠ pre-format), and the next publish
  *     chains from it instead of a racy directory listing;
  *  6. manifest() re-lists when the newest marker vanishes mid-read
  *     instead of silently degrading a generational index to flat.
  */
class LifecycleRecoverySpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private val NB = 4

  private def docs(ids: Seq[Long]) =
    ids.toDF("doc_id").withColumn("text",
      concat_ws(" ",
        concat(lit("a"), pmod(col("doc_id"), lit(5))),
        concat(lit("b"), pmod(col("doc_id"), lit(3))),
        concat(lit("c"), col("doc_id")),
        concat(lit("d"), col("doc_id") + 1),
        concat(lit("e"), pmod(col("doc_id"), lit(7))),
        concat(lit("f"), col("doc_id") * 2),
        concat(lit("g"), pmod(col("doc_id") + 3, lit(4))),
        concat(lit("h"), col("doc_id"))))

  private def fsOf(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def postings(idx: String): Set[(Long, String)] =
    spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet

  private def freshIndex(prefix: String, ids: Seq[Long]): String = {
    val idx = java.nio.file.Files.createTempDirectory(prefix)
      .toString + "/index"
    Dedup.writeShingleIndex(docs(ids), "doc_id", "text", n = 3, idx,
      nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, idx) // v1 convert, v2 fresh base
    idx
  }

  test("expectGen: a publish whose read snapshot is stale is FENCED even when its claim number is higher") {
    val t = java.nio.file.Files.createTempDirectory("graft_lrfence")
      .toString + "/tbl"
    Compaction.writeGen(docs(0L to 9L), t)  // g1
    // writer A read g1 and publishes g2 (in the race this is the forget)
    Compaction.writeGen(docs(0L to 4L), t, expectGen = Some(1L)) // g2
    // writer B ALSO read g1 (its input predates A's publish) but claims
    // a HIGHER number — the monotonic fence alone would let it win and
    // silently roll A's publish back; the snapshot fence must stop it
    val e = intercept[Compaction.FencedWriteException](
      Compaction.writeGen(docs(0L to 9L), t, expectGen = Some(1L)))
    assert(e.getMessage.contains("fenced"))
    val gens = Compaction.generations(spark, t)
    assert(gens == Seq(1L, 2L), s"loser must leave no generation: $gens")
    assert(Compaction.readTable(spark, t).count() == 5L,
      "the fenced loser rolled back the winner's publish")
    // re-read current, retry with the fresh snapshot: wins
    Compaction.writeGen(docs(0L to 9L), t, expectGen = Some(2L)) // g3
    assert(Compaction.readTable(spark, t).count() == 10L)
  }

  test("sealSegment: a replay after a crash between the two renames RESTORES the parked committed copy") {
    val base = 0L until 20L
    val batch = 100L until 108L
    val idx = freshIndex("graft_lrseal", base)
    Dedup.appendToShingleIndex(spark, idx, docs(batch), "doc_id", "text",
      n = 3, ingestTag = "b1", nBuckets = NB) // v3: [base, b1]
    val fs = fsOf(idx)
    val dir = new Path(IndexLifecycle.resolveDir(spark, idx))
    val before = postings(idx)
    val v = IndexLifecycle.versions(spark, idx).max
    // the crash window: a replay parked the committed segment and died
    // before swinging its replacement in
    assert(fs.rename(new Path(dir, "ingest=b1"),
      new Path(dir, ".graft_seg_tmp_b1.replaced")))
    // an EMPTY replay (non-deterministic source) must restore the
    // parked copy — pre-fix, the entry-time delete lost it forever
    IndexLifecycle.appendSegment(spark, idx, "b1") { (_, _) => () }
    assert(fs.exists(new Path(dir, "ingest=b1")),
      "the parked committed copy was not restored")
    assert(postings(idx) == before, "replay recovery lost postings")
    assert(IndexLifecycle.versions(spark, idx).max == v)
    // park again; a NON-empty replay of the same content replaces it
    // cleanly — identical postings, no parked leftovers
    assert(fs.rename(new Path(dir, "ingest=b1"),
      new Path(dir, ".graft_seg_tmp_b1.replaced")))
    Dedup.appendToShingleIndex(spark, idx, docs(batch), "doc_id", "text",
      n = 3, ingestTag = "b1", nBuckets = NB)
    assert(postings(idx) == before)
    assert(!fs.exists(new Path(dir, ".graft_seg_tmp_b1.replaced")))
  }

  test("convert: a retry after a mid-move crash flattens the prior attempt's segments instead of nesting them") {
    val base = 0L until 15L
    val batch = 200L until 208L
    val idx = java.nio.file.Files.createTempDirectory("graft_lrconv")
      .toString + "/index"
    // FLAT index with two segments (flat appends seal without markers)
    Dedup.writeShingleIndex(docs(base), "doc_id", "text", n = 3, idx,
      nBuckets = NB)
    Dedup.appendToShingleIndex(spark, idx, docs(batch), "doc_id", "text",
      n = 3, ingestTag = "b0", nBuckets = NB)
    val flat = spark.read.parquet(idx)
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet
    // simulate the crashed first convert: claim g1, move ONE of the two
    // segments in, die before the publish
    val fs = fsOf(idx)
    val main = new Path(idx)
    val n = Compaction.claimNext(fs, main, "ixconvert")
    val g = new Path(main, f"g$n%09d")
    fs.mkdirs(g)
    assert(fs.rename(new Path(main, "ingest=base"),
      new Path(g, "ingest=base")))
    // the retry must recover BOTH segments into the published dir
    IndexLifecycle.convert(spark, idx)
    val m = IndexLifecycle.manifest(spark, idx).get
    assert(m.segments.sorted == Seq("b0", "base"),
      s"crashed-attempt segments lost or nested: ${m.segments}")
    assert(postings(idx) == flat,
      "convert recovery lost postings from the crashed attempt")
  }

  test("toGenerational: a partitionBy-written flat table converts with its data, not to an empty generation") {
    val t = java.nio.file.Files.createTempDirectory("graft_lrpart")
      .toString + "/tbl"
    docs(0L until 30L).withColumn("k", pmod(col("doc_id"), lit(3)))
      .write.partitionBy("k").parquet(t)
    Compaction.toGenerational(spark, t)
    assert(Compaction.generations(spark, t) == Seq(1L))
    assert(Compaction.readTable(spark, t).count() == 30L,
      "partition subdirectories were left behind at the root")
  }

  test("all-forgotten version: the EMPTY segment set stays pinned; the next publish chains from it, never from a listing") {
    val base = 0L until 10L
    val idx = freshIndex("graft_lrempty", base)
    val removed = Forget.fromShingleIndex(spark, idx, base)
    assert(removed > 0L)
    // the shingle rewrite keeps the (now postings-free) ingest=base dir
    // for its sidecars; emulate a family whose rewrite drops an emptied
    // segment dir entirely, then publish through the REAL mutate path —
    // which derives live segments from the dir and records the set
    val fs0 = fsOf(idx)
    fs0.delete(new Path(IndexLifecycle.resolveDir(spark, idx),
      "ingest=base"), true)
    assert(IndexLifecycle.mutate(spark, idx)(_ => 0L) == 0L)
    val v = IndexLifecycle.versions(spark, idx).max
    val m = IndexLifecycle.manifestAt(spark, idx, v)
    assert(m.segments.isEmpty && m.segmentsRecorded,
      s"all-forgotten version must pin a RECORDED empty set: $m")
    // a sealed-but-unpublished segment sits in the dir (a concurrent
    // appender mid-commit): the next publish must NOT leak it into its
    // pinned set via a directory-listing fallback
    val fs = fsOf(idx)
    fs.mkdirs(new Path(IndexLifecycle.resolveDir(spark, idx), "ingest=zz"))
    val batch = 300L until 306L
    Dedup.appendToShingleIndex(spark, idx, docs(batch), "doc_id", "text",
      n = 3, ingestTag = "n1", nBuckets = NB)
    val m2 = IndexLifecycle.manifestAt(spark, idx,
      IndexLifecycle.versions(spark, idx).max)
    assert(m2.segments == Seq("n1"),
      s"the unpublished segment leaked into the pinned set: ${m2.segments}")
  }

  /** Delegating commit whose next read of `failOnce` returns absent —
    * the marker-pruned-mid-read race, made deterministic.
    */
  private class FlakyCommit(inner: ManifestCommit) extends ManifestCommit {
    @volatile var failOnce: String = null
    override def createExclusive(name: String, payload: Array[Byte]) =
      inner.createExclusive(name, payload)
    override def read(name: String): Option[Array[Byte]] =
      if (name == failOnce) { failOnce = null; None } else inner.read(name)
    override def list(prefix: String): Seq[String] = inner.list(prefix)
    override def delete(name: String): Unit = inner.delete(name)
    override def createdAt(name: String): Option[Long] = inner.createdAt(name)
    override def describe: String = s"flaky(${inner.describe})"
  }

  test("manifest(): a newest marker vanishing between listing and read forces a re-list, never a silent flat fallback") {
    val root = java.nio.file.Files.createTempDirectory("graft_lrflaky")
      .toString
    val flaky = new FlakyCommit(new MemoryManifestCommit)
    ManifestCommit.register(root, flaky)
    try {
      val idx = root + "/index"
      Dedup.writeShingleIndex(docs(0L until 10L), "doc_id", "text", n = 3,
        idx, nBuckets = NB)
      Dedup.rebuildShingleIndex(spark, idx)
      val v = IndexLifecycle.manifest(spark, idx).get.v
      flaky.failOnce = f"_graft_ixgen.g$v%09d"
      val m = IndexLifecycle.manifest(spark, idx)
      assert(m.isDefined && m.get.v == v,
        "a transiently unreadable newest marker degraded the index to " +
          "flat — the lost-batch failure mode")
    } finally ManifestCommit.unregister(root)
  }
}
