package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.sources.IndexLifecycle

/** The CAS-versioned index lifecycle's concurrency contract, proven on
  * the shingle family (the mechanics are shared by all families):
  *
  *  1. deterministic interleavings of the two races the CAS exists to
  *     close — a rebuild missing a concurrent append (lost segment)
  *     and an append replayed after a rebuild absorbed it (duplicated
  *     postings);
  *  2. a threaded two-writer soak (appender loop vs rebuild loop vs a
  *     concurrent prober), the index mirror of OperatorsSpec's
  *     writeGen soak.
  */
class IndexLifecycleSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  /** Deterministic tiny corpus: doc id → 8 tokens, ids disjoint across
    * batches by construction.
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

  private val NB = 4 // buckets: tiny corpus, tiny layout

  private def newIndex(prefix: String, base: Seq[Long]): String = {
    val idx = java.nio.file.Files
      .createTempDirectory(prefix).toString + "/index"
    Dedup.writeShingleIndex(docs(base), "doc_id", "text", n = 3, idx,
      nBuckets = NB)
    // convert up front: the one-time flat→generational moves are a
    // quiet-window operation, and these tests race writers afterwards
    Dedup.rebuildShingleIndex(spark, idx, nBuckets = NB)
    idx
  }

  private def append(idx: String, ids: Seq[Long], tag: String): Unit =
    Dedup.appendToShingleIndex(spark, idx, docs(ids),
      "doc_id", "text", n = 3, ingestTag = tag, nBuckets = NB)

  /** (doc, shingle) set of the index's CURRENT version. */
  private def postings(idx: String): Set[(Long, String)] =
    spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet

  /** Duplicate (doc, shingle) rows — must ALWAYS be empty: duplicated
    * postings inflate jaccard `common` counts silently.
    */
  private def dupPostings(idx: String): Seq[(Long, String)] =
    spark.read.parquet(IndexLifecycle.resolveDir(spark, idx))
      .groupBy("doc", "s").count().filter(col("count") > 1)
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSeq

  private def expected(ids: Seq[Long]): Set[(Long, String)] = {
    val ref = java.nio.file.Files
      .createTempDirectory("graft_ixref").toString + "/index"
    Dedup.writeShingleIndex(docs(ids), "doc_id", "text", n = 3, ref,
      nBuckets = NB)
    spark.read.parquet(ref)
      .select(col("doc"), col("s")).as[(Long, String)].collect().toSet
  }

  test("rebuild fenced by a mid-build append: retries and re-absorbs — no lost segment") {
    val base = 0L until 30L
    val batch = 100L until 115L
    val idx = newIndex("graft_ixfence1", base)
    var buildRuns = 0
    IndexLifecycle.rebuild(spark, idx) { (src, _, dst) =>
      buildRuns += 1
      if (buildRuns == 1) {
        // an append lands AFTER this rebuild pinned its input listing
        // and BEFORE its publish — exactly the lost-segment window a
        // max-wins fence cannot see
        append(idx, batch, "b1")
      }
      import org.apache.spark.sql.expressions.Window
      src.select(col("doc"), col("s")).distinct()
        .withColumn("n_sh",
          count(lit(1)).over(Window.partitionBy("doc")).cast("int"))
        .withColumn("bucket", pmod(xxhash64(col("s")), lit(NB)).cast("int"))
        .withColumn("ingest", lit("base"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("ingest", "bucket").parquet(dst)
      spark.emptyDataset[String].toDF("s")
        .coalesce(1).write.mode("overwrite").parquet(dst + "/_graft_hot")
    }
    assert(buildRuns == 2,
      s"the appended segment must FENCE the first build ($buildRuns runs)")
    assert(postings(idx) == expected(base ++ batch),
      "retried rebuild must absorb the mid-build append")
    assert(dupPostings(idx).isEmpty)
  }

  test("append whose segment a rebuild absorbed is not re-sealed — no duplicate postings") {
    val base = 0L until 30L
    val batch = 200L until 212L
    val idx = newIndex("graft_ixfence2", base)
    append(idx, batch, "b1") // sealed + published normally
    // replay of the SAME tag (the at-least-once window), interleaved
    // with a rebuild that reads the previously-sealed segment and
    // publishes DURING the replay's seal: the replay's CAS loses, sees
    // tag b1 in the winner's absorbed list, and must stop — blindly
    // re-sealing would duplicate every posting of the batch
    // a plain same-tag replay first: idempotent, content unchanged
    append(idx, batch, "b1")
    assert(postings(idx) == expected(base ++ batch))
    // now the RACED replay: the rebuild is injected between the
    // replay's manifest read and its commit via the writeSeg callback
    var first = true
    IndexLifecycle.appendSegment(spark, idx, "b1") { (dir, tmp) =>
      if (first) {
        first = false
        // rebuild absorbs the CURRENT index (which contains b1 from
        // the original append) and publishes — the replay is now the
        // stale loser
        Dedup.rebuildShingleIndex(spark, idx, nBuckets = NB)
      }
      import org.apache.spark.sql.expressions.Window
      val hot = spark.read.parquet(dir + "/_graft_hot")
      Dedup.shingles(docs(batch), "doc_id", "text", 3, Int.MaxValue)
        .join(hot, Seq("s"), "left_anti")
        .withColumn("n_sh",
          count(lit(1)).over(Window.partitionBy("doc")).cast("int"))
        .withColumn("bucket", pmod(xxhash64(col("s")), lit(NB)).cast("int"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    }
    assert(postings(idx) == expected(base ++ batch),
      "absorbed replay must keep exactly one copy of the batch")
    assert(dupPostings(idx).isEmpty,
      "absorbed replay re-sealed its segment — postings duplicated")
    // and the winning rebuild collapsed everything to base
    assert(IndexLifecycle.segmentsOf(
      new org.apache.hadoop.fs.Path(IndexLifecycle.resolveDir(spark, idx))
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(IndexLifecycle.resolveDir(spark, idx)))
      == Seq("base"))
  }

  test("forget fenced by a concurrent rebuild: re-runs on the winner's output, deletion converges") {
    import graft.ops.Forget
    val base = 0L until 30L
    val idx = newIndex("graft_ixmf", base)
    val victims = Seq(3L, 7L, 11L)
    // raced RTBF: a rebuild publishes BETWEEN the forget's in-place
    // rewrite and its version commit — the rebuild read pre-forget
    // state, so its output revives the victims' postings; the fenced
    // mutate must re-run the (idempotent) rewrite against the winning
    // dir until its commit sticks
    var first = true
    val removed = IndexLifecycle.mutate(spark, idx) { dir =>
      if (first) {
        first = false
        // the rebuild reads the PRE-forget state and publishes a new
        // dir that still carries the victims — the revival this test
        // exists to prove the mutate loop repairs
        Dedup.rebuildShingleIndex(spark, idx, nBuckets = NB)
      }
      Forget.rewriteWithout(spark, dir,
        Seq("ingest", "bucket"), "doc", victims)
    }
    assert(removed > 0L)
    val survivors = postings(idx)
    assert(survivors == expected(base.filterNot(victims.contains)),
      "raced forget left revived or extra postings")
    assert(!survivors.exists(p => victims.contains(p._1)))
    assert(dupPostings(idx).isEmpty)
    // idempotent: converged state has nothing left to remove
    assert(Forget.fromShingleIndex(spark, idx, victims) == 0L)
  }

  test("two concurrent rebuilders: CAS picks one winner per version, loser retries, content converges") {
    val base = 0L until 30L
    val idx = newIndex("graft_ixrr", base)
    append(idx, 300L until 310L, "b1")
    @volatile var bad: Throwable = null
    def rebuilder() = new Thread(() => {
      try {
        var done = 0
        while (done < 3) {
          // rebuild retries internally on a lost CAS; a surviving
          // FencedWriteException after its internal retries would
          // bubble up here and fail the test
          Dedup.rebuildShingleIndex(spark, idx, nBuckets = NB,
            readerGraceMs = 120000L)
          done += 1
        }
      } catch { case t: Throwable => bad = t }
    })
    val (r1, r2) = (rebuilder(), rebuilder())
    r1.start(); r2.start(); r1.join(); r2.join()
    assert(bad == null, s"rebuild race failure: $bad")
    assert(postings(idx) == expected(base ++ (300L until 310L)),
      "racing rebuilders corrupted the index")
    assert(dupPostings(idx).isEmpty)
    // exactly one current version; segments collapsed to base
    val dir = IndexLifecycle.resolveDir(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(IndexLifecycle.segmentsOf(fs,
      new org.apache.hadoop.fs.Path(dir)) == Seq("base"))
  }

  test("two-writer index soak: appender loop vs rebuild loop vs prober — nothing lost, nothing duplicated, probes never torn") {
    val base = 0L until 40L
    val idx = newIndex("graft_ixsoak", base)
    val batches = (0 until 6).map(k => (k + 1) * 1000L until (k + 1) * 1000L + 12L)
    @volatile var bad: Throwable = null
    @volatile var churning = true
    val appender = new Thread(() => {
      try batches.zipWithIndex.foreach { case (ids, k) =>
        append(idx, ids, s"b$k")
      } catch { case t: Throwable => bad = t }
      finally churning = false
    })
    val rebuilder = new Thread(() => {
      try {
        while (churning) {
          // concurrent-writer deployment: wall-time retention so the
          // prober's resolved dir outlives back-to-back publishes
          Dedup.rebuildShingleIndex(spark, idx, nBuckets = NB,
            readerGraceMs = 120000L)
        }
      } catch { case t: Throwable => bad = t }
    })
    var probes = 0
    val prober = new Thread(() => {
      try {
        while (churning) {
          // probe docs overlap base content → deterministic matches
          Dedup.jaccardAgainstIndex(spark, idx, docs(0L until 5L),
            "doc_id", "text", n = 3, threshold = 0.99,
            nBuckets = NB).count()
          probes += 1
        }
      } catch { case t: Throwable => bad = t }
    })
    appender.start(); rebuilder.start(); prober.start()
    appender.join(); rebuilder.join(); prober.join()
    assert(bad == null, s"non-fence failure under index churn: $bad")
    assert(probes >= 1, "prober never completed a read during churn")
    // final convergence: one more rebuild collapses any still-open
    // segments; content must equal a fresh build over base ∪ batches
    Dedup.rebuildShingleIndex(spark, idx, nBuckets = NB)
    assert(postings(idx) == expected(base ++ batches.flatten),
      "soak lost or invented postings")
    assert(dupPostings(idx).isEmpty, "soak duplicated postings")
  }
}
