package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Forget, TrainExport}
import graft.sources.{Compaction, IndexLifecycle}

/** The unified export manifest's contract ([[TrainExport]]):
  * one atomically-committed artifact pins every input (table
  * generations, index manifest versions, params-sidecar fingerprints)
  * and `replay` re-runs the recipe from the manifest alone —
  * hash-identical while the pins are retained, loudly failing with the
  * retention messages once a pinned version is scrubbed, and loudly
  * failing when a pinned index's params sidecars changed underneath.
  * Also pins the round-12 Compaction fix the feature exposed: marker
  * pruning honors the same wall-time readerGraceMs as data-dir pruning
  * (markers and dirs must expire together, or readTableAt reports a
  * generation unreadable while its data is still protected).
  */
class TrainExportSpec extends AnyFunSuite {
  import GraftSpark.spark

  import spark.implicits._

  private val NB = 4

  /** Deterministic tiny corpus, same construction as
    * IndexLifecycleSpec: identical ids → identical text, so overlap
    * between batch and corpus ids is exact-duplicate text (jaccard 1).
    */
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

  TrainExport.registerRecipe("spec_export_v1") { (s, in, p) =>
    val batch = in.table("docs")
    val t = in.index("text")
    val drop = Dedup.jaccardAgainstIndexAt(s, t.path, t.version, batch,
        "doc_id", "text", n = p("n").toInt,
        threshold = p("threshold").toDouble, nBuckets = p("nBuckets").toInt)
      .select(col("i").as("doc_id")).distinct()
    batch.join(drop, Seq("doc_id"), "left_anti").select("doc_id")
  }

  private val recipeParams = Map(
    "n" -> "3", "threshold" -> "0.9", "nBuckets" -> NB.toString)

  /** Builds table g1 = ids 25..34, text index v2 over ids 0..29, and
    * commits the export. Kept set under the PINS: 30..34 (25..29 are
    * exact dups of corpus docs).
    */
  private def freshExport(prefix: String): (String, TrainExport.ExportManifest) = {
    val root = java.nio.file.Files.createTempDirectory(prefix).toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text") // v1 convert, v2 base
    val m = TrainExport.commit(spark, s"$root/export", "spec_export_v1",
      params = recipeParams,
      tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text" -> s"$root/text"))
    (root, m)
  }

  private def keptIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().sorted.toSeq

  test("commit pins every input; replay after append+forget on all of them is hash-identical to the artifact") {
    val (root, m) = freshExport("graft_texp")
    assert(m.recipe == "spec_export_v1")
    assert(m.tables("docs").gen == 1L)
    assert(m.indexes("text").version == 2L)
    assert(m.params == recipeParams)
    // the manifest is ONE committed artifact and round-trips exactly
    assert(TrainExport.manifest(spark, s"$root/export") == m)
    val artifact = keptIds(spark.read.parquet(s"$root/export/data"))
    assert(artifact == (30L to 34L),
      s"pinned recipe must keep exactly the non-duplicate ids: $artifact")
    // mutate EVERY input — append AND forget, scrubs grace-deferred.
    // The appended index segment contains the batch's own 30..34 text:
    // an unpinned replay would drop ALL of them (empty result).
    val grace = 600000L
    Compaction.writeGen(docs(25L to 44L), s"$root/docs",
      readerGraceMs = grace)
    Compaction.forgetRows(spark, s"$root/docs",
      col("doc_id") % 2 === 0, readerGraceMs = grace)
    Dedup.appendToShingleIndex(spark, s"$root/text", docs(30L to 40L),
      "doc_id", "text", n = 3, ingestTag = "b0", nBuckets = NB)
    Forget.fromShingleIndexViaRebuild(spark, s"$root/text",
      Seq(26L, 27L), readerGraceMs = grace)
    val replayed = TrainExport.replay(spark, s"$root/export")
    assert(keptIds(replayed) == artifact,
      "replay after mutating every input must reproduce the artifact")
  }

  test("a second commit into the same export dir fails loudly") {
    val (root, _) = freshExport("graft_texp2")
    val e = intercept[IllegalArgumentException](
      TrainExport.commit(spark, s"$root/export", "spec_export_v1",
        params = recipeParams,
        tables = Map("docs" -> s"$root/docs"),
        indexes = Map("text" -> s"$root/text")))
    assert(e.getMessage.contains("immutable once committed"))
  }

  test("replay fails with the table retention message once the pinned generation is scrubbed") {
    val (root, _) = freshExport("graft_texp3")
    // two zero-grace publishes move the rank floor past g1: marker and
    // dir both expire (the pre-round-12 marker pruning and the dir
    // pruning now agree)
    Compaction.writeGen(docs(25L to 35L), s"$root/docs")
    Compaction.writeGen(docs(25L to 36L), s"$root/docs")
    val e = intercept[IllegalArgumentException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e.getMessage.contains("pinned table 'docs' is gone") &&
      e.getMessage.contains("retention window"),
      s"wrong failure: ${e.getMessage}")
  }

  test("replay fails with the index retention message once the pinned version's dir is scrubbed") {
    val (root, _) = freshExport("graft_texp4")
    // two rebuilds with zero orphan grace retire the pinned v2 dir
    // (dir retention = two most recent distinct dirs)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    Dedup.rebuildShingleIndex(spark, s"$root/text", orphanGraceMs = 0L)
    val e = intercept[RuntimeException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e.getMessage.contains("pinned index 'text' is gone"),
      s"wrong failure: ${e.getMessage}")
  }

  test("replay fails when the pinned version's params sidecars changed in place") {
    val (root, m) = freshExport("graft_texp5")
    val pin = m.indexes("text")
    val im = IndexLifecycle.manifestAt(spark, pin.path, pin.version)
    val pinnedDir = new Path(new Path(pin.path), im.dir).toString
    // simulate an in-place retune (the params doctrine forbids it —
    // which is exactly why replay must detect it)
    Dedup.writeShingleParams(spark, pinnedDir, 3, NB, 999)
    val e = intercept[IllegalArgumentException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e.getMessage.contains("params sidecars changed"),
      s"wrong failure: ${e.getMessage}")
  }

  test("replay in a FRESH JVM: a second process re-runs the export from the manifest alone, hash-verified") {
    // the headline property, proven across a process boundary: the
    // child JVM shares NOTHING with this one but the filesystem — its
    // recipe registry re-populates at class load, every pin resolves
    // from storage, and TrainExport.replay's fingerprint check guards
    // the result. An in-JVM replay could silently lean on memoized
    // session state; a forked one cannot.
    import graft.ops.Multimodal
    import scala.sys.process._
    // the BUILT-IN recipe (train_export_v1), deliberately: the child
    // JVM only has the library's class-load registrations — a
    // spec-local recipe would not exist over there, which is exactly
    // the deployment contract (recipe code ships in the jar)
    val sdocs = docs(0L until 40L)
      .withColumn("source", pmod(col("doc_id"), lit(3)).cast("string"))
    val root = java.nio.file.Files.createTempDirectory("graft_texp8").toString
    Compaction.writeGen(sdocs.filter(col("doc_id") % 2 === 0), s"$root/docs")
    Dedup.writeShingleIndex(sdocs.filter(col("doc_id") % 2 =!= 0),
      "doc_id", "text", n = 3, s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    Multimodal.writePhashIndex(
      Multimodal.asPhashImageTable(sdocs.filter(col("doc_id") % 2 =!= 0)),
      s"$root/img", maxDist = 1, nBuckets = NB)
    Multimodal.rebuildPhashIndex(spark, s"$root/img")
    TrainExport.commit(spark, s"$root/export", TrainExport.StandardRecipe,
      params = Map("keepBps" -> "9000", "n" -> "3", "threshold" -> "0.9",
        "maxDist" -> "1", "trainBps" -> "9500", "numShards" -> "2",
        "splitSalt" -> "jsp", "shardSalt" -> "jsh",
        "nBuckets" -> NB.toString, "phashBuckets" -> NB.toString),
      tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text" -> s"$root/text", "image" -> s"$root/img"))
    val artifact = keptIds(spark.read.parquet(s"$root/export/data")
      .select("doc_id"))
    assert(artifact.nonEmpty, "vacuous fixture: the export kept nothing")
    // mutate the inputs, as production would between export and a
    // later replay (grace-deferred scrubs keep the pins readable)
    Compaction.writeGen(sdocs, s"$root/docs", readerGraceMs = 600000L)
    Dedup.appendToShingleIndex(spark, s"$root/text",
      sdocs.filter(col("doc_id") % 2 === 0), "doc_id", "text", n = 3,
      ingestTag = "b0", nBuckets = NB)
    val cp = System.getProperty("java.class.path")
    assert(cp.contains("classes"), s"test classpath not propagated: $cp")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val out = new StringBuilder
    val rc = Process(Seq(javaBin, "-Xmx1g", "-cp", cp,
      "graft.tools.ReplayChild", s"$root/export"))
      .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') }))
    assert(rc == 0, s"fresh-JVM replay failed (rc=$rc):\n$out")
    val line = out.toString.linesIterator.find(_.startsWith("REPLAY:"))
      .getOrElse(fail(s"no REPLAY line from child:\n$out"))
    val ids = line.split(":", 3)(2).split(",").filter(_.nonEmpty)
      .map(_.toLong).toSeq.sorted
    assert(ids == artifact,
      s"fresh-JVM replay must reproduce the committed kept set: " +
        s"got $ids, committed $artifact")
  }

  test("fresh-JVM replay of the EMBED recipe: both embedding-side pins resolve cross-process") {
    // the round-13 capstone, proven across a process boundary like the
    // standard recipe: embed_export_v1's two index reads are the NEW
    // pinned probes (semanticAgainstIndexAt + ivfProbeIndexDetAt) —
    // the child JVM re-registers the recipe at class load, resolves
    // the cell and det-IVF pins from storage, and re-verifies the
    // fingerprint after every input was mutated over here
    import scala.sys.process._
    val root = java.nio.file.Files.createTempDirectory("graft_texpe").toString
    // coprime per-dimension moduli: the vector of vec_id repeats only
    // with period 17·19·23·29 ≫ the id range, so no two ids carry
    // identical embeddings and the 0.95-cos canon keeps a real subset
    val mods = Seq(17, 19, 23, 29)
    def vecs(ids: Seq[Long]) = ids.toDF("vec_id").withColumn("embedding",
      array(mods.zipWithIndex.map { case (m, d) =>
        (pmod(col("vec_id") * (d * 7 + 3), lit(m)).cast("double") / m.toDouble
          - 0.5) // centered: positive-orthant vectors are all high-cos
          .cast("float")
      }: _*))
    val all = vecs(1L to 140L)
    val corpus = all.filter(col("vec_id") % 10 =!= 0)
    Compaction.writeGen(all.filter(col("vec_id") % 10 === 0), s"$root/vecs")
    graft.ops.SemDedup.writeCellIndex(corpus, "vec_id", "embedding",
      centroidEvery = 7, s"$root/cells")
    graft.ops.SemDedup.rebuildCellIndex(spark, s"$root/cells",
      centroidEvery = 7) // v2
    graft.ops.Similarity.ivfWriteIndexDet(corpus, "vec_id", "embedding",
      centroidEvery = 7, indexPath = s"$root/ann")
    graft.ops.Similarity.rebuildIvfIndexDet(spark, s"$root/ann") // v2
    TrainExport.commit(spark, s"$root/export", TrainExport.EmbedRecipe,
      params = Map("threshold" -> "0.95", "k" -> "5", "nprobe" -> "2"),
      tables = Map("vecs" -> s"$root/vecs"),
      indexes = Map("cells" -> s"$root/cells", "ann" -> s"$root/ann"))
    val artifact = spark.read.parquet(s"$root/export/data")
      .select("qid").as[Long].collect().sorted.toSeq
    assert(artifact.nonEmpty, "vacuous fixture: the embed export kept nothing")
    // mutate every input: the appended %20==0 vectors are a subset of
    // the batch — an unpinned replay would self-drop and self-rank
    Compaction.writeGen(all.filter(col("vec_id") % 5 === 0), s"$root/vecs",
      readerGraceMs = 600000L)
    graft.ops.SemDedup.appendToCellIndex(spark, s"$root/cells",
      all.filter(col("vec_id") % 20 === 0), "vec_id", "embedding", "b0")
    graft.ops.Similarity.ivfAppendToIndex(spark, s"$root/ann",
      all.filter(col("vec_id") % 20 === 0), "vec_id", "embedding", "b0")
    val cp = System.getProperty("java.class.path")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val out = new StringBuilder
    val rc = Process(Seq(javaBin, "-Xmx1g", "-cp", cp,
      "graft.tools.ReplayChild", s"$root/export"))
      .!(ProcessLogger(l => out.synchronized { out.append(l).append('\n') }))
    assert(rc == 0, s"fresh-JVM embed replay failed (rc=$rc):\n$out")
    val line = out.toString.linesIterator.find(_.startsWith("REPLAY:"))
      .getOrElse(fail(s"no REPLAY line from child:\n$out"))
    val ids = line.split(":", 3)(2).split(",").filter(_.nonEmpty)
      .map(_.toLong).toSeq.sorted
    assert(ids == artifact,
      s"fresh-JVM embed replay must reproduce the committed qid multiset")
  }

  test("two racing commits into one export dir: one winner, and data/ holds exactly the winner's rows") {
    // the review-found race: a loser writing data/ directly (mode
    // overwrite) AFTER the winner's manifest CAS would silently break
    // the fingerprint/pins/data agreement. With staged writes only the
    // CAS winner renames into data/ — so whatever the interleaving,
    // the committed fingerprint must re-verify against data/.
    val root = java.nio.file.Files.createTempDirectory("graft_texp7").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    // different thresholds → different kept sets → different
    // fingerprints: if the loser's rows leaked into data/, the winner's
    // committed fingerprint cannot match them
    def attempt(threshold: String): Either[Throwable, TrainExport.ExportManifest] =
      try Right(TrainExport.commit(spark, s"$root/export", "spec_export_v1",
        params = recipeParams.updated("threshold", threshold),
        tables = Map("docs" -> s"$root/docs"),
        indexes = Map("text" -> s"$root/text")))
      catch { case t: Throwable => Left(t) }
    @volatile var r1: Either[Throwable, TrainExport.ExportManifest] = null
    @volatile var r2: Either[Throwable, TrainExport.ExportManifest] = null
    val t1 = new Thread(() => r1 = attempt("0.9"))
    val t2 = new Thread(() => r2 = attempt("0.1"))
    t1.start(); t2.start(); t1.join(); t2.join()
    val results = Seq(r1, r2)
    assert(results.count(_.isRight) == 1,
      s"exactly one commit must win: $results")
    assert(results.collect { case Left(t) => t.getMessage }
      .forall(m => m.contains("race") || m.contains("immutable")),
      s"loser must fail with the commit-race message: $results")
    val won = results.collectFirst { case Right(m) => m }.get
    // the committed manifest round-trips and describes data/ exactly:
    // replay re-verifies the fingerprint against a fresh recipe run,
    // and the artifact's own rows re-hash to the committed fingerprint
    assert(TrainExport.manifest(spark, s"$root/export") == won)
    val replayed = keptIds(TrainExport.replay(spark, s"$root/export"))
    assert(replayed == keptIds(spark.read.parquet(s"$root/export/data")),
      "data/ does not match the committed manifest (loser's rows leaked in)")
    // no staged temp dirs left behind by either side
    val leftovers = new java.io.File(s"$root/export").listFiles()
      .map(_.getName).filter(_.startsWith(".data.tmp."))
    assert(leftovers.isEmpty, s"staging leak: ${leftovers.mkString(",")}")
  }

  test("retention leases: a leased export replays after the exact pruning cycles that break an unleased one; RTBF forget still wins") {
    val (root, m) = freshExport("graft_texpl")
    val artifact = keptIds(spark.read.parquet(s"$root/export/data"))
    val id = TrainExport.lease(spark, s"$root/export")
    assert(id == TrainExport.leaseId(s"$root/export"))
    // leasing is idempotent — a crashed-and-retried lease call converges
    TrainExport.lease(spark, s"$root/export")
    // TABLE: two zero-grace publishes — the cycle that scrubs the pin
    // in the "table retention message" test above
    Compaction.writeGen(docs(25L to 35L), s"$root/docs")
    Compaction.writeGen(docs(25L to 36L), s"$root/docs")
    // INDEX: two zero-orphan-grace rebuilds — the cycle from the
    // "index retention message" test
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    Dedup.rebuildShingleIndex(spark, s"$root/text", orphanGraceMs = 0L)
    // with the leases held, both pins survived and replay is
    // hash-identical to the committed artifact
    assert(Compaction.generations(spark, s"$root/docs").contains(m.tables("docs").gen),
      "leased table generation must survive the pruning cycles")
    assert(keptIds(TrainExport.replay(spark, s"$root/export")) == artifact,
      "leased export must replay after cycles that prune unleased pins")
    // RTBF precedence: forget physically erases THROUGH the lease;
    // replay then fails loudly with the established retention messages.
    // Index first (replay validates tables before indexes).
    Forget.fromShingleIndexViaRebuild(spark, s"$root/text", Seq(26L))
    val e1 = intercept[RuntimeException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e1.getMessage.contains("pinned index 'text' is gone"),
      s"wrong failure: ${e1.getMessage}")
    Compaction.forgetRows(spark, s"$root/docs", col("doc_id") === 26L)
    val e2 = intercept[IllegalArgumentException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e2.getMessage.contains("pinned table 'docs' is gone"),
      s"wrong failure: ${e2.getMessage}")
    // release is clean even though the pins are already erased
    TrainExport.releaseLeases(spark, s"$root/export")
  }

  test("lease mechanics: same-id re-acquire converges, conflicting pin fails, release restores normal retention") {
    val root = java.nio.file.Files.createTempDirectory("graft_texpl2").toString
    val t = s"$root/tbl"
    Compaction.writeGen(docs(0L to 4L), t) // g1
    Compaction.acquireLease(spark, t, 1L, "holder_a")
    Compaction.acquireLease(spark, t, 1L, "holder_a") // idempotent
    Compaction.writeGen(docs(0L to 5L), t) // g2
    val e = intercept[IllegalArgumentException](
      Compaction.acquireLease(spark, t, 2L, "holder_a"))
    assert(e.getMessage.contains("already pins"), e.getMessage)
    // two publishes push g1 below the grace floor — leased, it survives
    Compaction.writeGen(docs(0L to 6L), t) // g3
    assert(Compaction.generations(spark, t) == Seq(1L, 2L, 3L))
    assert(Compaction.readTableAt(spark, t, 1L).count() == 5L)
    // released, the next publish prunes it under the normal rank rules
    Compaction.releaseLease(spark, t, "holder_a")
    Compaction.writeGen(docs(0L to 7L), t) // g4
    assert(Compaction.generations(spark, t) == Seq(3L, 4L),
      "a released generation must re-enter normal retention")
    // unreadable generations cannot be leased
    val e2 = intercept[IllegalArgumentException](
      Compaction.acquireLease(spark, t, 1L, "holder_b"))
    assert(e2.getMessage.contains("cannot lease"), e2.getMessage)
    // lease ids are store object names: the charset guard is a
    // path-traversal guard and must hold on RELEASE too (a '/' in a
    // released id would delete outside the table root)
    Seq("../evil", "a/b", "", "..").foreach { bad =>
      assert(intercept[IllegalArgumentException](
        Compaction.releaseLease(spark, t, bad))
        .getMessage.contains("leaseId"), s"'$bad' must be rejected")
      assert(intercept[IllegalArgumentException](
        graft.sources.IndexLifecycle.releaseLease(spark, t, bad))
        .getMessage.contains("leaseId"), s"'$bad' must be rejected")
    }
  }

  test("export-of-export lineage: upstream pins validate first, two-hop replay green, upstream erasure fails naming the upstream") {
    val root = java.nio.file.Files.createTempDirectory("graft_texpu").toString
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Compaction.writeGen(docs(0L to 9L), s"$root/docs")
    TrainExport.registerRecipe("spec_up_base_v1") { (_, in, _) =>
      in.table("docs").select(col("doc_id"))
        .filter(col("doc_id") % 2 === 0)
    }
    TrainExport.commit(spark, s"$root/base", "spec_up_base_v1",
      params = Map.empty, tables = Map("docs" -> s"$root/docs"),
      indexes = Map.empty)
    // the derived export consumes the BASE EXPORT as a table input —
    // commit must resolve it to an upstream pin, not a table pin
    TrainExport.registerRecipe("spec_up_derived_v1") { (_, in, _) =>
      in.table("base").withColumn("x2", col("doc_id") * 2)
    }
    val dm = TrainExport.commit(spark, s"$root/derived",
      "spec_up_derived_v1", params = Map.empty,
      tables = Map("base" -> s"$root/base"), indexes = Map.empty)
    val baseM = TrainExport.manifest(spark, s"$root/base")
    assert(dm.tables.isEmpty && dm.upstreams.keySet == Set("base"))
    assert(dm.upstreams("base").resultFp == baseM.resultFp)
    assert(dm.upstreams("base").recipeVersion == baseM.recipeVersion)
    // the v3 manifest round-trips and describe surfaces the lineage
    assert(TrainExport.manifest(spark, s"$root/derived") == dm)
    assert(TrainExport.describe(spark, s"$root/derived")
      .filter(col("kind") === "upstream").count() == 1L)
    // two-hop replay green
    val rows = TrainExport.replay(spark, s"$root/derived")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(0L, 2L, 4L, 6L, 8L))
    // upstream erasure (the physical effect of an upstream forget):
    // one row scrubbed from the shipped data -> the derived replay
    // fails NAMING the upstream export, before the recipe executes
    val scrubbed = spark.read.parquet(s"$root/base/data")
      .filter(col("doc_id") =!= 0L)
    scrubbed.write.parquet(s"$root/rewrite")
    fs.delete(new Path(s"$root/base/data"), true)
    assert(fs.rename(new Path(s"$root/rewrite"), new Path(s"$root/base/data")))
    val e = intercept[RuntimeException](
      TrainExport.replay(spark, s"$root/derived"))
    assert(e.getMessage.contains("upstream export 'base'") &&
      e.getMessage.contains("no longer ships"), e.getMessage)
    // committing a NEW derived export from the tampered upstream also
    // fails loudly at commit (never pins bytes that contradict the
    // upstream manifest)
    val e2 = intercept[IllegalArgumentException](
      TrainExport.commit(spark, s"$root/derived2", "spec_up_derived_v1",
        params = Map.empty, tables = Map("base" -> s"$root/base"),
        indexes = Map.empty))
    assert(e2.getMessage.contains("upstream export 'base'") &&
      e2.getMessage.contains("does not match its manifest"), e2.getMessage)
    // upstream manifest gone entirely -> "is gone", naming the upstream
    fs.delete(new Path(s"$root/base/${TrainExport.ManifestName}"), false)
    val e3 = intercept[RuntimeException](
      TrainExport.replay(spark, s"$root/derived"))
    assert(e3.getMessage.contains("upstream export 'base' is gone"),
      e3.getMessage)
  }

  test("lineage validation is TRANSITIVE (r15 verdict #5): tampering with a 3-deep chain's ROOT fails the leaf's replay naming the root") {
    val root = java.nio.file.Files.createTempDirectory("graft_texp3").toString
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Compaction.writeGen(docs(0L to 9L), s"$root/docs")
    TrainExport.registerRecipe("spec_chain_a_v1") { (_, in, _) =>
      in.table("docs").select(col("doc_id"))
        .filter(col("doc_id") % 2 === 0)
    }
    TrainExport.registerRecipe("spec_chain_b_v1") { (_, in, _) =>
      in.table("a").withColumn("x2", col("doc_id") * 2)
    }
    TrainExport.registerRecipe("spec_chain_c_v1") { (_, in, _) =>
      in.table("b").withColumn("x4", col("x2") * 2)
    }
    TrainExport.commit(spark, s"$root/a", "spec_chain_a_v1",
      params = Map.empty, tables = Map("docs" -> s"$root/docs"),
      indexes = Map.empty)
    TrainExport.commit(spark, s"$root/b", "spec_chain_b_v1",
      params = Map.empty, tables = Map("a" -> s"$root/a"),
      indexes = Map.empty)
    TrainExport.commit(spark, s"$root/c", "spec_chain_c_v1",
      params = Map.empty, tables = Map("b" -> s"$root/b"),
      indexes = Map.empty)
    // three-hop replay green
    assert(TrainExport.replay(spark, s"$root/c")
      .select("x4").as[Long].collect().sorted.toSeq ==
      Seq(0L, 8L, 16L, 24L, 32L))
    // tamper the ROOT export's shipped data (one row scrubbed): the
    // LEAF's replay must fail naming A — on r15 code B's pins (A) were
    // only checked when B itself was replayed, so C replayed green
    // over a tampered chain
    val scrubbed = spark.read.parquet(s"$root/a/data")
      .filter(col("doc_id") =!= 0L)
    scrubbed.write.parquet(s"$root/rewrite")
    fs.delete(new Path(s"$root/a/data"), true)
    assert(fs.rename(new Path(s"$root/rewrite"), new Path(s"$root/a/data")))
    val e = intercept[RuntimeException](
      TrainExport.replay(spark, s"$root/c"))
    assert(e.getMessage.contains(s"$root/a") &&
      e.getMessage.contains("no longer ships"), e.getMessage)
    // the middle hop still validates on its own contract too
    val e2 = intercept[RuntimeException](
      TrainExport.replay(spark, s"$root/b"))
    assert(e2.getMessage.contains("upstream export 'a'"), e2.getMessage)
  }

  test("model pins: a recipe's DSIR/LR-style model input is content-fingerprinted at commit and validated at replay") {
    // the r12 verdict's gap #3: model artifacts are plain parquet dirs
    // with no generation/version — without a pin, replay silently
    // resolves them to current disk state
    val root = java.nio.file.Files.createTempDirectory("graft_texpm").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Seq((0L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "w")
      .write.parquet(s"$root/model")
    TrainExport.registerRecipe("spec_model_export_v1") { (s, in, _) =>
      val m = in.model("m")
      in.table("docs")
        .withColumn("k", pmod(col("doc_id"), lit(3)))
        .join(broadcast(m), Seq("k"))
        .select(col("doc_id"), col("w"))
    }
    val m = TrainExport.commit(spark, s"$root/export", "spec_model_export_v1",
      params = Map.empty,
      tables = Map("docs" -> s"$root/docs"),
      indexes = Map.empty,
      models = Map("m" -> s"$root/model"))
    assert(m.models("m").contentFp != "empty")
    // the manifest round-trips the model pin
    assert(TrainExport.manifest(spark, s"$root/export") == m)
    // untouched model → hash-identical replay
    val replayed = TrainExport.replay(spark, s"$root/export")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(replayed == (25L to 34L))
    // mutate the model dir in place → replay fails with the
    // fingerprint message (even though the recipe would still run)
    Seq((0L, 11L), (1L, 20L), (2L, 30L)).toDF("k", "w")
      .write.mode("overwrite").parquet(s"$root/model")
    val e = intercept[IllegalArgumentException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e.getMessage.contains("model 'm'") &&
      e.getMessage.contains("changed since the commit"), e.getMessage)
    // model dir gone entirely → the retention-style message
    val fs = new org.apache.hadoop.fs.Path(s"$root/model")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/model"), true)
    val e2 = intercept[IllegalArgumentException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e2.getMessage.contains("pinned model 'm' is gone"), e2.getMessage)
  }

  test("rename failure AFTER the manifest CAS preserves the staged data for manual promotion") {
    // the review-found recovery hazard: the finally-block cleanup must
    // NOT delete staging when the CAS won but the rename failed —
    // between those two points staging is the committed export's only
    // data copy, and replay-based recovery depends on pin retention
    val (root, expected) = {
      val r = java.nio.file.Files.createTempDirectory("graft_texp9").toString
      Compaction.writeGen(docs(25L to 34L), s"$r/docs")
      Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
        s"$r/text", nBuckets = NB)
      Dedup.rebuildShingleIndex(spark, s"$r/text")
      (r, (30L to 34L).toSeq)
    }
    val realRename = TrainExport.renameImpl
    val e =
      try {
        TrainExport.renameImpl = (_, _, _) => false
        intercept[RuntimeException](
          TrainExport.commit(spark, s"$root/export", "spec_export_v1",
            params = recipeParams,
            tables = Map("docs" -> s"$root/docs"),
            indexes = Map("text" -> s"$root/text")))
      } finally TrainExport.renameImpl = realRename
    assert(e.getMessage.contains("manual promotion"), e.getMessage)
    // the manifest IS committed...
    val m = TrainExport.manifest(spark, s"$root/export")
    assert(m.recipe == "spec_export_v1")
    // ...data/ is absent, and staging survived with the winner's rows
    val entries = new java.io.File(s"$root/export").listFiles().map(_.getName)
    assert(!entries.contains("data"), entries.mkString(","))
    val staged = entries.filter(_.startsWith(".data.tmp."))
    assert(staged.length == 1, s"expected one preserved staging dir: ${entries.mkString(",")}")
    assert(keptIds(spark.read.parquet(s"$root/export/${staged.head}")) == expected)
    // manual promotion completes the commit; replay then verifies it
    assert(new java.io.File(s"$root/export/${staged.head}")
      .renameTo(new java.io.File(s"$root/export/data")))
    assert(keptIds(TrainExport.replay(spark, s"$root/export")) == expected)
  }

  test("control characters in input paths and recipe ids are rejected before they can commit an unparseable manifest") {
    val e1 = intercept[IllegalArgumentException](
      TrainExport.commit(spark, "/tmp/never", "spec_export_v1",
        params = recipeParams,
        tables = Map("docs" -> "/tmp/bad\npath"),
        indexes = Map.empty))
    assert(e1.getMessage.contains("single-line printable"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      TrainExport.registerRecipe("bad\rid")((_, _, _) => docs(Seq(1L))))
    assert(e2.getMessage.contains("plain identifier"), e2.getMessage)
  }

  test("rowFingerprint: invariant under partitioning and row order, sensitive to any row change and to duplicates") {
    val base = docs(0L until 50L)
    val fp = TrainExport.rowFingerprint(base)
    assert(fp == TrainExport.rowFingerprint(base.repartition(7)),
      "fingerprint must not depend on partitioning")
    assert(fp == TrainExport.rowFingerprint(base.orderBy(col("doc_id").desc)),
      "fingerprint must not depend on row order")
    assert(fp == TrainExport.rowFingerprint(
      docs((0L until 50L).reverse)), "fingerprint must not depend on input order")
    assert(fp != TrainExport.rowFingerprint(docs(0L until 49L)),
      "dropping a row must change the fingerprint")
    assert(fp != TrainExport.rowFingerprint(
      base.unionAll(docs(Seq(7L)))),
      "a duplicated row must change the fingerprint (multiset semantics)")
    assert(TrainExport.rowFingerprint(base.filter(lit(false))) == "empty")
  }

  test("writeGen readerGraceMs retains older generations' MARKERS as long as their dirs (round-12 fix)") {
    val t = java.nio.file.Files.createTempDirectory("graft_texp6")
      .toString + "/tbl"
    Compaction.writeGen(docs(0L to 4L), t) // g1
    Compaction.writeGen(docs(0L to 5L), t, readerGraceMs = 600000L) // g2
    Compaction.writeGen(docs(0L to 6L), t, readerGraceMs = 600000L) // g3
    assert(Compaction.generations(spark, t) == Seq(1L, 2L, 3L),
      "wall grace must keep g1 readable past the two-publish rank floor")
    assert(Compaction.readTableAt(spark, t, 1L).count() == 5L)
    // zero grace restores the pure rank-based retention
    Compaction.writeGen(docs(0L to 7L), t) // g4
    assert(Compaction.generations(spark, t) == Seq(3L, 4L),
      "zero grace must prune markers and dirs below the rank floor")
  }

  test("a failing contract ABORTS commit: no manifest, staging cleaned, dir reusable") {
    val root = java.nio.file.Files.createTempDirectory("graft_texc1").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    def commit(sheet: Seq[graft.ops.Validate.Check]) =
      TrainExport.commit(spark, s"$root/export", "spec_export_v1",
        params = recipeParams, tables = Map("docs" -> s"$root/docs"),
        indexes = Map("text" -> s"$root/text"), contract = sheet)
    // kept ids are 30..34 — a 0..10 range violates on every row
    val e = intercept[IllegalStateException](
      commit(Seq(graft.ops.Validate.InRange("doc_id", 0.0, 10.0))))
    assert(e.getMessage.contains("validation failed") &&
      e.getMessage.contains("in_range:doc_id (5 rows)"), e.getMessage)
    intercept[RuntimeException](TrainExport.manifest(spark, s"$root/export"))
    val leftovers = new java.io.File(s"$root/export").list()
    assert(leftovers == null || !leftovers.exists(_.startsWith(".data.tmp")),
      s"staging must be cleaned on a contract abort: ${leftovers.toSeq}")
    // the dir stays available: a conforming re-export commits fine
    val m = commit(Seq(graft.ops.Validate.InRange("doc_id", 0.0, 100.0)))
    assert(m.contract.length == 1)
    assert(keptIds(TrainExport.replay(spark, s"$root/export")) ==
      (30L to 34L))
  }

  test("the contract rides the manifest canonicalized; auditContract re-checks shipped data and flags tampering") {
    import graft.ops.Validate
    val root = java.nio.file.Files.createTempDirectory("graft_texc2").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    TrainExport.commit(spark, s"$root/export", "spec_export_v1",
      params = recipeParams, tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text" -> s"$root/text"),
      contract = Seq(Validate.NotNull("doc_id"),
        Validate.Unique(Seq("doc_id")),
        // non-string set values canonicalize to STRINGS in the manifest
        Validate.InSet("doc_id", Seq(30L, 31L, 32L, 33L, 34L))))
    val m = TrainExport.manifest(spark, s"$root/export")
    assert(m.contract == Seq(Validate.NotNull("doc_id"),
      Validate.Unique(Seq("doc_id")),
      Validate.InSet("doc_id", Seq("30", "31", "32", "33", "34"))),
      s"parsed contract: ${m.contract}")
    val audit = TrainExport.auditContract(spark, s"$root/export")
      .select("check_name", "status").as[(String, String)].collect().toMap
    assert(audit == Map("not_null:doc_id" -> "pass",
      "unique:doc_id" -> "pass", "in_set:doc_id" -> "pass"))
    // replay re-validates and still passes
    assert(keptIds(TrainExport.replay(spark, s"$root/export")) ==
      (30L to 34L))
    // tamper with the SHIPPED bytes: a duplicated id + an out-of-set id
    docs(Seq(30L, 30L, 99L)).select("doc_id")
      .write.mode("overwrite").parquet(s"$root/export/data")
    val tampered = TrainExport.auditContract(spark, s"$root/export")
      .select("check_name", "n_violations", "status")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(tampered("unique:doc_id") == ((2L, "fail")))
    assert(tampered("in_set:doc_id") == ((1L, "fail")))
    assert(tampered("not_null:doc_id") == ((0L, "pass")))
  }

  test("Satisfies in a contract and contract-free audits are rejected with clear messages") {
    import graft.ops.Validate
    val root = java.nio.file.Files.createTempDirectory("graft_texc3").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    val e = intercept[IllegalArgumentException](
      TrainExport.commit(spark, s"$root/export", "spec_export_v1",
        params = recipeParams, tables = Map("docs" -> s"$root/docs"),
        indexes = Map("text" -> s"$root/text"),
        contract = Seq(Validate.Satisfies("pos", col("doc_id") > 0))))
    assert(e.getMessage.contains("cannot be persisted"), e.getMessage)
    // nothing committed by the rejected attempt; commit without one
    TrainExport.commit(spark, s"$root/export", "spec_export_v1",
      params = recipeParams, tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text" -> s"$root/text"))
    val e2 = intercept[IllegalArgumentException](
      TrainExport.auditContract(spark, s"$root/export"))
    assert(e2.getMessage.contains("without a contract"), e2.getMessage)
  }

  test("lease operability: listLeases enumerates both planes; leaseReport joins an export's pins to live leases") {
    val (root, _) = freshExport("graft_texll")
    def repRows() = TrainExport.leaseReport(spark, s"$root/export")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3),
        r.getBoolean(4), r.getLong(5), !r.isNullAt(6))).toSeq.sortBy(_._1)
    // nothing leased yet: every pin is flagged unprotected
    assert(repRows() == Seq(("docs", "table", 1L, false, 0L, false),
      ("text", "index", 2L, false, 0L, false)))
    val id = TrainExport.lease(spark, s"$root/export")
    // both planes enumerate the holder (id, target, age, live)
    val tl = Compaction.listLeases(spark, s"$root/docs")
    assert(tl.map(l => (l.leaseId, l.gen, l.expired)) ==
      Seq((id, Some(1L), false)), s"table plane: $tl")
    assert(tl.head.ageMs.exists(_ >= 0L))
    val il = IndexLifecycle.listLeases(spark, s"$root/text")
    // index pins lease under <exportId>.<inputName> (the drain-export
    // multi-version fix) — the id remains derivable without state
    assert(il.map(l => (l.leaseId, l.gen, l.expired)) ==
      Seq((s"$id.text", Some(2L), false)), s"index plane: $il")
    // the report now shows this export's lease held on every pin
    assert(repRows() == Seq(("docs", "table", 1L, true, 1L, true),
      ("text", "index", 2L, true, 1L, true)))
    // an ORPHANED foreign lease is enumerable alongside (the audit an
    // operator runs to find who pins retention)
    Compaction.acquireLease(spark, s"$root/docs", 1L, "crashed_job")
    assert(Compaction.listLeases(spark, s"$root/docs").map(_.leaseId) ==
      Seq("crashed_job", id).sorted)
    assert(repRows().head == (("docs", "table", 1L, true, 2L, true)))
    Compaction.releaseLease(spark, s"$root/docs", "crashed_job")
    TrainExport.releaseLeases(spark, s"$root/export")
    assert(Compaction.listLeases(spark, s"$root/docs").isEmpty)
    assert(IndexLifecycle.listLeases(spark, s"$root/text").isEmpty)
    assert(repRows().forall(r => !r._4 && r._5 == 0L))
  }

  test("lease expiry: a live lease pins and refreshes; an expired one frees its generation on the next cycle") {
    val root = java.nio.file.Files.createTempDirectory("graft_texle").toString
    val t = s"$root/tbl"
    val conf = spark.sparkContext.hadoopConfiguration
    Compaction.writeGen(docs(0L to 4L), t) // g1
    Compaction.acquireLease(spark, t, 1L, "consumer")
    try {
      conf.setLong(Compaction.LeaseMaxAgeKey, 3600000L) // 1 h: live
      Compaction.writeGen(docs(0L to 5L), t) // g2
      Compaction.writeGen(docs(0L to 6L), t) // g3 prunes g1 unleased
      assert(Compaction.generations(spark, t).contains(1L),
        "an UNEXPIRED lease must keep pinning under an expiry policy")
      // keep-alive: re-acquiring the same (id, gen) refreshes the age
      Thread.sleep(250)
      val before = Compaction.listLeases(spark, t).head.ageMs.get
      assert(before >= 200L)
      Compaction.acquireLease(spark, t, 1L, "consumer")
      val after = Compaction.listLeases(spark, t).head.ageMs.get
      assert(after < before, s"refresh must reset the age ($before -> $after)")
      // the consumer crashes: its lease ages past the policy
      Thread.sleep(10)
      conf.setLong(Compaction.LeaseMaxAgeKey, 1L)
      assert(Compaction.listLeases(spark, t).head.expired,
        "listLeases must flag the orphan under the policy")
      Compaction.writeGen(docs(0L to 7L), t) // the next prune cycle
      assert(!Compaction.generations(spark, t).contains(1L),
        "an expired lease must stop pinning")
      assert(Compaction.listLeases(spark, t).isEmpty,
        "the expired marker is cleaned so its leaseId unblocks")
    } finally conf.unset(Compaction.LeaseMaxAgeKey)
  }

  test("index lease expiry mirrors the table plane") {
    val root = java.nio.file.Files.createTempDirectory("graft_texli").toString
    val idx = s"$root/ix"
    val conf = spark.sparkContext.hadoopConfiguration
    Dedup.writeShingleIndex(docs(0L to 9L), "doc_id", "text", n = 3, idx,
      nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, idx) // v1 convert, v2 = [base]
    IndexLifecycle.acquireLease(spark, idx, 2L, "consumer")
    try {
      conf.setLong(Compaction.LeaseMaxAgeKey, 3600000L)
      // the cycle that scrubs an unleased v2 (r13 lease spec recipe)
      Dedup.rebuildShingleIndex(spark, idx)
      Dedup.rebuildShingleIndex(spark, idx, orphanGraceMs = 0L)
      IndexLifecycle.manifestAt(spark, idx, 2L) // live lease: pinnable
      conf.setLong(Compaction.LeaseMaxAgeKey, 1L)
      Thread.sleep(10)
      assert(IndexLifecycle.listLeases(spark, idx).head.expired)
      Dedup.rebuildShingleIndex(spark, idx, orphanGraceMs = 0L)
      intercept[RuntimeException](IndexLifecycle.manifestAt(spark, idx, 2L))
      assert(IndexLifecycle.listLeases(spark, idx).isEmpty,
        "the expired index marker is cleaned")
    } finally conf.unset(Compaction.LeaseMaxAgeKey)
  }

  test("recipe provenance: replay names code drift crisply; v1 manifests keep the fingerprint-only contract; newer headers fail with upgrade") {
    def register(v: Int): Unit =
      TrainExport.registerRecipe("spec_export_ver", version = v) {
        (s, in, p) => in.table("docs").select("doc_id")
      }
    register(1)
    val root = java.nio.file.Files.createTempDirectory("graft_texrv").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    val m = TrainExport.commit(spark, s"$root/export", "spec_export_ver",
      params = Map.empty, tables = Map("docs" -> s"$root/docs"),
      indexes = Map.empty)
    assert(m.recipeVersion.contains(1))
    assert(TrainExport.manifest(spark, s"$root/export").recipeVersion
      .contains(1))
    // code drift: v2 registered in this JVM — the failure names the
    // DRIFT, before any pin or recipe executes
    register(2)
    val e = intercept[IllegalArgumentException](
      TrainExport.replay(spark, s"$root/export"))
    assert(e.getMessage.contains("changed since commit (v1 → v2)"),
      e.getMessage)
    // the committed version restored: replay green again
    register(1)
    assert(keptIds(TrainExport.replay(spark, s"$root/export")) ==
      (25L to 34L))
    // a v1-FORMAT manifest (no recipeVersion line, old header) stays
    // replayable even under a drifted registration — the pre-r14
    // fingerprint-only contract
    val mf = java.nio.file.Paths.get(s"$root/export/_graft_export")
    val v2Text = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    val v1Text = v2Text.linesIterator
      .filterNot(_.startsWith("recipeVersion="))
      .mkString("\n").replace("graft-export-v2", "graft-export-v1")
    java.nio.file.Files.write(mf, v1Text.getBytes("UTF-8"))
    register(7)
    assert(TrainExport.manifest(spark, s"$root/export").recipeVersion.isEmpty)
    assert(keptIds(TrainExport.replay(spark, s"$root/export")) ==
      (25L to 34L))
    // an unknown NEWER header fails on the header with an upgrade
    // diagnosis, not on some arbitrary first key
    java.nio.file.Files.write(mf,
      v1Text.replace("graft-export-v1", "graft-export-v9").getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException](
      TrainExport.manifest(spark, s"$root/export"))
    assert(e2.getMessage.contains("upgrade the reader"), e2.getMessage)
    register(1) // leave the registry as other tests expect
  }

  test("auditContract(dir, sheet): a proposed tighter contract flags the shipped artifact; the persisted audit is untouched") {
    import graft.ops.Validate
    val root = java.nio.file.Files.createTempDirectory("graft_texc4").toString
    Compaction.writeGen(docs(25L to 34L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L until 30L), "doc_id", "text", n = 3,
      s"$root/text", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/text")
    TrainExport.commit(spark, s"$root/export", "spec_export_v1",
      params = recipeParams, tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text" -> s"$root/text"),
      contract = Seq(Validate.NotNull("doc_id")))
    // the shipped rows are 30..34; the persisted v1 contract passes
    val a1 = TrainExport.auditContract(spark, s"$root/export")
    assert(a1.filter(col("status") === "fail").count() == 0)
    // "would v2's tighter sheet pass on v1's data?" — no: 32..34 escape
    val v2 = Seq(Validate.NotNull("doc_id"): Validate.Check,
      Validate.InRange("doc_id", 0.0, 31.0))
    val a2 = TrainExport.auditContract(spark, s"$root/export", v2)
      .filter(col("status") === "fail")
      .select("check_name", "n_violations").collect()
    assert(a2.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("in_range:doc_id", 3L)), s"got ${a2.mkString(",")}")
    // the persisted audit is byte-identical after the what-if
    assert(TrainExport.auditContract(spark, s"$root/export").collect()
      .toSeq == a1.collect().toSeq)
    // Satisfies cannot ride the canonicalization here either
    intercept[IllegalArgumentException](
      TrainExport.auditContract(spark, s"$root/export",
        Seq(Validate.Satisfies("pos", col("doc_id") > 0))))
    // an uncommitted dir is not auditable
    intercept[RuntimeException](
      TrainExport.auditContract(spark, s"$root/nothing", v2))
  }

  test("describe: table plane shows generations/claims/leases; index plane shows versions/segments/leases") {
    val root = java.nio.file.Files.createTempDirectory("graft_texd").toString
    val t = s"$root/tbl"
    Compaction.writeGen(docs(0L to 4L), t) // g1
    Compaction.writeGen(docs(0L to 5L), t) // g2
    Compaction.acquireLease(spark, t, 2L, "op_audit")
    val d = Compaction.describe(spark, t).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3)))
    assert(d.contains(("generation", "g000000001", "retained")), d.mkString(","))
    assert(d.contains(("generation", "g000000002", "current")))
    assert(d.contains(("lease", "op_audit", "held")))
    // readable generations carry file/byte counts; leases do not
    val cur = Compaction.describe(spark, t)
      .filter(col("status") === "current").collect()(0)
    assert(!cur.isNullAt(4) && cur.getLong(5) > 0L, "files/bytes expected")
    Compaction.releaseLease(spark, t, "op_audit")

    val idx = s"$root/ix"
    Dedup.writeShingleIndex(docs(0L to 9L), "doc_id", "text", n = 3, idx,
      nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, idx) // v1 convert, v2 = [base]
    Dedup.appendToShingleIndex(spark, idx, docs(10L to 12L), "doc_id",
      "text", n = 3, ingestTag = "b9", nBuckets = NB) // v3 = [base, b9]
    IndexLifecycle.acquireLease(spark, idx, 2L, "op_audit")
    val di = IndexLifecycle.describe(spark, idx)
    val kinds = di.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3)))
    assert(kinds.contains(("version", "v3", "current")), kinds.mkString(","))
    assert(kinds.contains(("version", "v2", "retained")))
    assert(kinds.contains(("lease", "op_audit", "held")))
    // the current version records its live segment set
    val v3 = di.filter(col("name") === "v3").collect()(0)
    assert(v3.getLong(5) == 2L, s"segments [base, b9] expected: $v3")
    IndexLifecycle.releaseLease(spark, idx, "op_audit")
  }

  test("a drain-shaped export (one index path pinned at two versions) is leasable (r13 shared-id defect)") {
    TrainExport.registerRecipe("spec_multi_pin") { (s, in, p) =>
      in.table("docs").select("doc_id")
    }
    val root = java.nio.file.Files.createTempDirectory("graft_texmp").toString
    Compaction.writeGen(docs(0L to 9L), s"$root/docs")
    Dedup.writeShingleIndex(docs(0L to 9L), "doc_id", "text", n = 3,
      s"$root/ix", nBuckets = NB)
    Dedup.rebuildShingleIndex(spark, s"$root/ix") // v1 convert, v2
    Dedup.appendToShingleIndex(spark, s"$root/ix", docs(10L to 12L),
      "doc_id", "text", n = 3, ingestTag = "b0", nBuckets = NB) // v3
    val m = TrainExport.commit(spark, s"$root/export", "spec_multi_pin",
      params = Map.empty, tables = Map("docs" -> s"$root/docs"),
      indexes = Map("text_a" -> s"$root/ix", "text_b" -> s"$root/ix"),
      indexVersions = Map("text_a" -> 2L, "text_b" -> 3L))
    assert(m.indexes("text_a").version == 2L &&
      m.indexes("text_b").version == 3L)
    // under the r13 shared lease id the SECOND index acquire threw
    // "already pins v2, not v3" — a drain export could not be leased
    TrainExport.lease(spark, s"$root/export")
    TrainExport.lease(spark, s"$root/export") // still idempotent
    val rep = TrainExport.leaseReport(spark, s"$root/export")
      .filter(col("kind") === "index").collect()
    assert(rep.length == 2 && rep.forall(_.getBoolean(4)),
      s"both version pins must show held: ${rep.mkString(",")}")
    // both leased versions survive the cycle that scrubs unleased pins
    Dedup.rebuildShingleIndex(spark, s"$root/ix")
    Dedup.rebuildShingleIndex(spark, s"$root/ix", orphanGraceMs = 0L)
    IndexLifecycle.manifestAt(spark, s"$root/ix", 2L)
    IndexLifecycle.manifestAt(spark, s"$root/ix", 3L)
    TrainExport.releaseLeases(spark, s"$root/export")
    assert(IndexLifecycle.listLeases(spark, s"$root/ix").isEmpty)
  }

  test("TrainExport.describe renders the committed manifest as a frame") {
    val (root, m) = freshExport("graft_texdd")
    val d = TrainExport.describe(spark, s"$root/export")
    val kinds = d.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(kinds.contains(("recipe", "spec_export_v1")), kinds.mkString(","))
    assert(kinds.contains(("recipe_version", "v1")))
    assert(kinds.contains(("table", "docs")))
    assert(kinds.contains(("index", "text")))
    assert(kinds.count(_._1 == "param") == recipeParams.size)
    val tbl = d.filter(col("kind") === "table").collect()(0)
    assert(tbl.getLong(3) == m.tables("docs").gen)
    val fp = d.filter(col("kind") === "result_fp").collect()(0)
    assert(fp.getString(1) == m.resultFp)
  }

  test("attachCurate(exportable = true) rejects a contradictory compaction cap at attach time, before any batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamingDedup.attachCurate(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text",
        "/tmp/graft_never_idx", "/tmp/graft_never_model",
        "/tmp/graft_never_out", maxSegments = 3, exportable = true))
    assert(e.getMessage.contains("exportable") &&
      e.getMessage.contains("maxSegments"), e.getMessage)
    // the default-configured exportable loop is the green path — it is
    // exercised end-to-end by the streaming_curate_export fixture
    // (LlmShared.streamingCurateExportFor passes exportable = true and
    // nothing else)
  }
}
