package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, SemDedup, SpanDedup}
import graft.sources.IndexLifecycle
import graft.streaming.StreamingDedup

/** The in-loop segment-accumulation policy (`maxSegments` on every
  * attach* loop) and the id-level replay closure it depends on.
  *
  * The policy: steady-state streaming appends one `ingest` segment per
  * trigger; probes pay per-segment listing/stats/footer overhead that
  * climbs with segment count (measured curve, PLANS.md round-10), so
  * each trigger optionally runs the family's
  * [[IndexLifecycle.maybeRebuild]] after its append. The loop with the
  * policy on must produce BYTE-IDENTICAL pairs to the loop with it off
  * — compaction is a layout decision, never a semantics one.
  *
  * The closure: a replayed trigger excludes its own ingest tag so it
  * does not match the batch against its previously-appended self — but
  * a rebuild landing in the crash window (the in-loop policy itself,
  * or the documented external maintenance job) ABSORBS that tag into
  * `ingest=base`, where no segment filter can reach it. The probes
  * therefore also exclude index-side rows carrying the batch's own ids
  * (a document cannot have arrived before itself). These tests pin the
  * absorbed-replay case for the shingle, span and cell families;
  * PhashSpec pins it for the image family.
  */
class StreamingCompactionSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def body(seed: Int) = (0 until 20).map(i => s"v${seed}_$i").mkString(" ")

  test("attach(maxSegments): segments stay bounded, pairs identical to the uncompacted loop") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, body(1)), (2L, body(2))).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_scomp").toString
    // two identical indexes: A runs the in-loop policy, B never compacts
    val (idxA, idxB) = (root + "/ia", root + "/ib")
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idxA, nBuckets = 8)
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idxB, nBuckets = 8)
    // 4 batches; batch k carries one novel doc and one near-dup of
    // batch k-1's novel doc — every pair needs history that, on the A
    // side, has been through a rebuild by the time it is probed
    val batches = (0 until 4).map { k =>
      val novel = (100L + k) -> body(100 + k)
      if (k == 0) Seq(novel, 900L -> body(1).replace("v1_5 ", "EDIT "))
      else Seq(novel,
        (900L + k) -> body(100 + k - 1).replace(s"v${100 + k - 1}_10 ", "EDIT "))
    }
    def run(idx: String, pairs: String, ckpt: String, maxSegments: Int): Unit = {
      val in = MemoryStream[(Long, String)]
      val q = StreamingDedup.attach(in.toDF().toDF("doc_id", "text"),
          "doc_id", "text", idx, pairs, n = 3, threshold = 0.5,
          nBuckets = 8, maxSegments = maxSegments)
        .option("checkpointLocation", ckpt).start()
      try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    run(idxA, root + "/pa", root + "/ca", maxSegments = 2)
    run(idxB, root + "/pb", root + "/cb", maxSegments = 0)
    val pa = spark.read.parquet(root + "/pa")
      .select("batch", "i", "j", "jaccard").collect().map(_.toString).sorted.toSeq
    val pb = spark.read.parquet(root + "/pb")
      .select("batch", "i", "j", "jaccard").collect().map(_.toString).sorted.toSeq
    assert(pa == pb, s"compaction changed pair semantics:\nA=$pa\nB=$pb")
    assert(pa.size == 4, s"every batch's near-dup must surface: $pa")
    // B accumulated base + 4 ingest segments; A's policy held the count
    // at or under the cap (append to 3 → rebuild to 1 → ...)
    val (sa, sb) = (IndexLifecycle.segmentCount(spark, idxA),
      IndexLifecycle.segmentCount(spark, idxB))
    assert(sb == 5, s"uncompacted loop must accumulate: $sb")
    assert(sa <= 2, s"policy must bound segments: $sa")
    // content equivalence: the collapsed index holds exactly the
    // uncompacted one's distinct postings
    val rows = (p: String) => spark.read
      .parquet(IndexLifecycle.resolveDir(spark, p))
      .select("doc", "s").distinct().collect().map(_.toString).toSet
    assert(rows(idxA) == rows(idxB), "compacted postings must match")
  }

  test("DEFAULT maxSegments: an attach loop left on its defaults stays bounded at the family cap (round-12)") {
    // the round-10..11 default was 0 = unbounded — a user following the
    // scaladoc got linear probe degradation until they found the curve
    // tables; the defaults are now the measured-knee policy and this
    // pins the DEFAULT code path (no maxSegments argument at all)
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, body(1))).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_sdef").toString
    val idx = root + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx, nBuckets = 8)
    val nBatches = StreamingDedup.ShingleMaxSegments + 2
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.attach(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", idx, root + "/pairs", n = 3, threshold = 0.99,
        nBuckets = 8) // NO maxSegments: the default policy must engage
      .option("checkpointLocation", root + "/ckpt").start()
    try (0 until nBatches).foreach { k =>
      in.addData((200L + k) -> body(200 + k)); q.processAllAvailable()
    } finally q.stop()
    val segs = IndexLifecycle.segmentCount(spark, idx)
    assert(segs <= StreamingDedup.ShingleMaxSegments,
      s"default policy must bound segments at the shingle cap: $segs")
    assert(segs < nBatches + 1,
      s"no rebuild ever ran — the default policy did not engage: $segs")
    // the postings survived the in-loop rebuilds intact
    val docs = spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .select("doc").distinct().as[Long].collect().toSet
    assert(docs == (Set(1L) ++ (0 until nBatches).map(200L + _)),
      s"in-loop compaction lost documents: $docs")
  }

  test("shingle absorbed-tag replay: id-level closure keeps the probe self-match-free") {
    val corpus = Seq((1L, body(1)), (2L, body(2))).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_sabs").toString + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx, nBuckets = 8)
    val batch = Seq((10L, body(10)),
      (30L, body(1).replace("v1_5 ", "EDIT "))).toDF("doc_id", "text")
    def probe() = Dedup.jaccardAgainstIndex(spark, idx, batch,
        "doc_id", "text", n = 3, threshold = 0.5, nBuckets = 8,
        excludeIngest = Some("b0"))
      .select("i", "j").as[(Long, Long)].collect().toSet
    val before = probe()
    assert(before == Set((30L, 1L)), s"pre-append probe: $before")
    Dedup.appendToShingleIndex(spark, idx, batch, "doc_id", "text",
      n = 3, ingestTag = "b0", nBuckets = 8)
    Dedup.rebuildShingleIndex(spark, idx)
    // b0 is gone as a segment — its rows live in ingest=base now
    val segs = IndexLifecycle.segmentCount(spark, idx)
    assert(segs == 1, s"rebuild must absorb the tag: $segs segments")
    val replay = probe()
    assert(replay == before,
      s"absorbed-tag replay must equal the pre-append probe: $replay")
  }

  test("span absorbed-tag replay: batch counts must not double against their absorbed selves") {
    val corpus = Seq((1L, body(1))).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_spabs").toString + "/index"
    SpanDedup.writeSpanIndex(corpus, "doc_id", "text", k = 5, idx, nBuckets = 8)
    // every span of the batch doc occurs exactly ONCE in the batch and
    // zero times in the corpus: the honest answer is zero duplication.
    // A replay whose tag a rebuild absorbed would, without the id-level
    // closure, see each span once live + once in base = n_occ 2 ≥
    // minOcc and report the whole doc as duplicated against itself.
    val batch = Seq((10L, body(10))).toDF("doc_id", "text")
    def probe() = SpanDedup.coverageAgainstIndex(spark, idx, batch,
        "doc_id", "text", k = 5, minOcc = 2, nBuckets = 8,
        excludeIngest = Some("b0"))
      .select("doc", "n_tokens", "n_dup_positions", "covered_tokens")
      .collect().map(_.toString).sorted.toSeq
    val before = probe()
    assert(before.exists(_.contains("[10,")), "batch doc must be reported")
    assert(before.forall(_.endsWith(",0,0]")),
      s"pre-append probe must see zero duplication: $before")
    SpanDedup.appendToSpanIndex(spark, idx, batch, "doc_id", "text",
      k = 5, ingestTag = "b0", nBuckets = 8)
    SpanDedup.rebuildSpanIndex(spark, idx)
    assert(IndexLifecycle.segmentCount(spark, idx) == 1)
    assert(probe() == before,
      "absorbed-tag replay must not double-count the batch's own spans")
  }

  test("pinned jaccard probe: version replays the append prefix; newest pin tracks the live probe") {
    val corpus = Seq((1L, body(1)), (2L, body(2))).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_jacat").toString + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx, nBuckets = 8)
    Dedup.rebuildShingleIndex(spark, idx) // v1 convert, v2 base
    // append a near-dup of corpus doc 1 — visible to v3, not to v2
    Dedup.appendToShingleIndex(spark, idx,
      Seq((50L, body(1).replace("v1_9 ", "EDIT "))).toDF("doc_id", "text"),
      "doc_id", "text", n = 3, ingestTag = "b0", nBuckets = 8)
    val batch = Seq((90L, body(1).replace("v1_3 ", "X "))).toDF("doc_id", "text")
    def at(v: Long) = Dedup.jaccardAgainstIndexAt(spark, idx, v, batch,
        "doc_id", "text", n = 3, threshold = 0.5, nBuckets = 8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(at(2L) == Set((90L, 1L)), "v2 must see only the base corpus")
    assert(at(3L) == Set((90L, 1L), (90L, 50L)),
      "v3 must add the appended near-dup")
    val live = Dedup.jaccardAgainstIndex(spark, idx, batch,
        "doc_id", "text", n = 3, threshold = 0.5, nBuckets = 8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(at(3L) == live, "the newest pin must equal the live probe")
    intercept[RuntimeException](at(99L))
  }

  test("shingle rebuild keeps the hot list monotone: once-capped shingles stay hot") {
    // one shingle shared by ALL 6 corpus docs (df 6 > maxDf 5) is
    // capped at build; after the rebuild recounts dfs over the CAPPED
    // postings (where it no longer appears), the sidecar must still
    // carry it — otherwise later batch probes stop filtering it and
    // inflate their n_sh against postings that are gone forever
    val shared = "common tail here"
    val corpus = (1L to 6L).map(i => (i, s"${body(i.toInt)} $shared"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_hotmono").toString + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
      nBuckets = 8, maxDf = 5)
    // the sidecar stores xxhash64 fingerprints, never raw shingle text
    // (RTBF: monotone raw strings would outlive erased documents) —
    // so the assertions work in fingerprint space
    val sharedH = Seq(shared).toDF("s")
      .select(xxhash64(col("s"))).as[Long].head()
    val hot0 = spark.read
      .parquet(IndexLifecycle.resolveDir(spark, idx) + "/_graft_hot")
      .as[Long].collect().toSet
    assert(hot0.contains(sharedH),
      s"build must cap the shared shingle (fingerprint $sharedH): $hot0")
    Dedup.rebuildShingleIndex(spark, idx)
    val hot1 = spark.read
      .parquet(IndexLifecycle.resolveDir(spark, idx) + "/_graft_hot")
      .as[Long].collect().toSet
    assert(hot0.subsetOf(hot1),
      s"rebuild must keep the prior hot list: lost ${hot0 -- hot1}")
  }

  test("RTBF erasure is byte-level: no victim-derived text survives anywhere under the index after forgetViaRebuild") {
    // two victim docs share a distinctive phrase; maxDf=1 caps it at
    // build time, so it enters the hot sidecar — the one place where
    // the monotone contract would have kept RAW victim text alive
    // through every future rebuild (the sidecar stores fingerprints
    // precisely so this test can pass). Survivor postings keep their
    // own raw shingles — erasure is about the VICTIMS' bytes.
    val secret = "zq1x zq2y zq3z"
    val corpus = Seq(
      (1L, s"${body(1)} $secret"),
      (2L, s"${body(2)} $secret"),
      (3L, body(3))).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_rtbf").toString + "/index"
    Dedup.writeShingleIndex(corpus, "doc_id", "text", n = 3, idx,
      nBuckets = 4, maxDf = 1)
    val removed = graft.ops.Forget.fromShingleIndexViaRebuild(
      spark, idx, Seq(1L, 2L))
    assert(removed > 0L, "forget must remove the victims' postings")
    // scan EVERY byte of EVERY file under the index root — data,
    // sidecars, markers, retained old generations after prune
    import scala.jdk.CollectionConverters._
    val victimBytes = Seq("zq1x", "zq2y", "zq3z").map(_.getBytes("UTF-8"))
    val offenders = java.nio.file.Files
      .walk(java.nio.file.Paths.get(idx)).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter { f =>
        val bytes = java.nio.file.Files.readAllBytes(f)
        victimBytes.exists(tok =>
          bytes.sliding(tok.length).exists(_.sameElements(tok)))
      }.map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"victim-derived text still at rest under the index: $offenders")
    // and the survivor is untouched
    val left = spark.read
      .parquet(IndexLifecycle.resolveDir(spark, idx))
      .select("doc").distinct().as[Long].collect().toSet
    assert(left == Set(3L), s"survivors: $left")
  }

  test("table RTBF: forgetRows erases victims byte-level, collapses time travel, idempotent") {
    import graft.sources.Compaction
    val secret = "zqtab1 zqtab2"
    val rows = Seq((1L, s"keep one"), (2L, s"victim $secret"),
      (3L, s"also keep")).toDF("id", "payload")
    val path = java.nio.file.Files
      .createTempDirectory("graft_tabrtbf").toString + "/table"
    Compaction.writeGen(rows.filter(col("id") =!= 3L), path) // g1
    Compaction.writeGen(rows, path)                          // g2; g1 retired
    val gensBefore = Compaction.generations(spark, path)
    assert(gensBefore.length == 2, s"fixture needs a retired gen: $gensBefore")
    val removed = Compaction.forgetRows(spark, path, col("id") === 2L)
    assert(removed == 1L)
    // logical erasure
    assert(Compaction.readTable(spark, path)
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
    // time travel to the pre-forget generations is GONE, loudly
    val gens = Compaction.generations(spark, path)
    assert(gens.length == 1, s"scrub must leave one readable gen: $gens")
    gensBefore.foreach { g =>
      intercept[IllegalArgumentException](
        Compaction.readTableAt(spark, path, g))
    }
    // physical erasure: no victim bytes anywhere under the table root
    import scala.jdk.CollectionConverters._
    val victimBytes = Seq("zqtab1", "zqtab2").map(_.getBytes("UTF-8"))
    val offenders = java.nio.file.Files
      .walk(java.nio.file.Paths.get(path)).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter { f =>
        val bytes = java.nio.file.Files.readAllBytes(f)
        victimBytes.exists(tok =>
          bytes.sliding(tok.length).exists(_.sameElements(tok)))
      }.map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"victim bytes still at rest under the table: $offenders")
    // idempotent
    assert(Compaction.forgetRows(spark, path, col("id") === 2L) == 0L)
  }

  test("cell absorbed-tag replay: id-level closure over the semantic index") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val corpus = Seq(1L -> v(1, 0, 0, 0), 2L -> v(0, 1, 0, 0))
      .toDF("vec_id", "embedding")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_cabs").toString + "/index"
    // centroidEvery=2 selects only id 2 — the ODD batch id below can
    // never join the quantizer, so the post-rebuild cell space is
    // unchanged and the pre/post probes are honestly comparable
    SemDedup.writeCellIndex(corpus, "vec_id", "embedding",
      centroidEvery = 2, idx)
    val batch = Seq(11L -> v(0.99, 0.1, 0, 0)).toDF("vec_id", "embedding")
    def probe() = SemDedup.semanticAgainstIndex(spark, idx, batch,
        "vec_id", "embedding", threshold = 0.9,
        excludeIngest = Some("b0"))
      .select("i", "j").as[(Long, Long)].collect().toSet
    val before = probe()
    assert(before == Set((11L, 1L)), s"pre-append probe: $before")
    SemDedup.appendToCellIndex(spark, idx, batch, "vec_id", "embedding",
      ingestTag = "b0")
    SemDedup.rebuildCellIndex(spark, idx, centroidEvery = 2)
    assert(IndexLifecycle.segmentCount(spark, idx) == 1)
    assert(probe() == before,
      "absorbed-tag replay must not match the batch against itself")
  }
}
