package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Chunking, Search}
import graft.util.Tables

class SearchSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  test("bm25: hand-computed scores on a tiny corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),     // tf(cat)=2, len 3
      (2L, "cat fish"),        // tf(cat)=1, len 2
      (3L, "bird bird bird"))  // no hit
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq(7 -> "cat"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))

    // reference BM25 computed independently (same formula, plain Scala)
    val n = 3.0; val dft = 2.0; val avglen = (3 + 2 + 3) / 3.0
    def score(tf: Double, len: Double): Long = {
      val idf = math.log((n - dft + 0.5) / (dft + 0.5) + 1.0)
      val tfn = tf * (Search.k1 + 1.0) /
        (tf + Search.k1 * (1.0 - Search.b + Search.b * (len / avglen)))
      math.floor(idf * tfn * 1e6).toLong
    }
    assert(got.length == 2)                       // doc 3 has no query term
    assert(got(0) == ((7, 1L, 1, score(2, 3))))   // higher tf wins rank 1
    assert(got(1) == ((7, 2L, 2, score(1, 2))))
  }

  test("bm25: top-k on the corpus is dense-ranked, hit-only, deterministic") {
    val docs = Tables(spark, sfDir, "documents")
    val qs = Search.registeredQueries
    val run1 = Search.bm25TopK(docs, "doc_id", "text", qs, 5).collect()
    val run2 = Search.bm25TopK(docs, "doc_id", "text", qs, 5).collect()
    assert(run1.toSeq == run2.toSeq)              // partition-order independent
    val byQ = run1.groupBy(_.getInt(0))
    assert(byQ.keySet == qs.map(_._1).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).toSeq == (1 to rows.length)) // dense ranks
      assert(rows.map(_.getLong(3)).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true  // scores non-increasing
      })
    }
    // every hit actually contains at least one query term
    val hitIds = run1.map(_.getLong(1)).toSet
    val terms = qs.flatMap(_._2.split(" ")).distinct
    val withTerm = docs
      .filter(terms.map(t => col("text").contains(t)).reduce(_ || _))
      .select("doc_id").as[Long].collect().toSet
    assert(hitIds.subsetOf(withTerm))
  }

  test("misra-gries: heavy-hitter guarantee under adversarial partitioning") {
    import graft.functions.MisraGries
    val cap = 4
    // 10_000 tokens: "hot" has frequency 3000 > n/(cap+1) = 2000; the
    // rest is a long tail of sub-threshold noise items
    val tokens = Seq.fill(3000)("hot") ++
      (0 until 7000).map(i => s"noise_${i % 700}")
    val n = tokens.length
    for (parts <- Seq(1, 4, 13)) {       // partitioning must not matter
      // deterministic spread across partitions (no shuffle randomness)
      val df = spark.createDataset(tokens.zipWithIndex)(
          org.apache.spark.sql.Encoders.product[(String, Int)])
        .repartition(parts, col("_2"))
        .select(col("_1").as("t"))
      val mg = udaf(MisraGries(cap))
      val got = df.agg(mg(col("t")).as("m"))
        .select(explode(col("m"))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= cap)
      assert(got.contains("hot"), s"hot item evicted at parts=$parts")
      // every estimate is an under-count by at most n/(cap+1)
      val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong)
      got.foreach { case (k, est) =>
        assert(est <= exact(k))
        assert(exact(k) - est <= n / (cap + 1))
      }
    }
    // exact regime: capacity ≥ distinct items ⇒ the sketch IS the counts
    val small = spark.createDataset(Seq("a", "b", "a", "c", "a", "b"))(
      org.apache.spark.sql.Encoders.STRING).toDF("t")
    val mg10 = udaf(MisraGries(10))
    val ex = small.agg(mg10(col("t")).as("m"))
      .select(explode(col("m"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ex == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("streaming incremental index: per-batch merges converge to the one-shot index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString + "/idx"
    val input = MemoryStream[(Long, String)]
    // ingest pipeline: each micro-batch's term stats merge into the
    // stored index (read-modify-write of a vocabulary-sized table —
    // cost ∝ batch + vocabulary, never the corpus)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val stats = graft.ops.Search.termStats(batch, "doc_id", "text")
        val merged =
          if (new java.io.File(dir).exists)
            graft.ops.Search.mergeTermStats(spark.read.parquet(dir), stats)
          else stats
        val out = merged.collect() // vocabulary-sized
        spark.createDataFrame(
            spark.sparkContext.parallelize(out.toIndexedSeq), merged.schema)
          .write.mode("overwrite").parquet(dir)
      }
      .start()
    val docs = Seq(
      1L -> "cat dog cat", 2L -> "dog fish", 3L -> "cat cat cat",
      4L -> "fish", 5L -> "dog dog cat")
    try {
      input.addData(docs.take(2): _*); q.processAllAvailable()
      input.addData(docs.slice(2, 4): _*); q.processAllAvailable()
      input.addData(docs.drop(4): _*); q.processAllAvailable()
    } finally q.stop()
    val incremental = spark.read.parquet(dir)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val oneShot = graft.ops.Search.termStats(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(incremental == oneShot)
    assert(incremental.map(_._1) == Seq("cat", "dog", "fish"))
  }

  test("chunking: overlap-strip reconstruction, bounds, short docs") {
    val size = 50; val overlap = 10; val stride = size - overlap
    val docs = Tables(spark, sfDir, "documents")
    val chunks = Chunking.chunk(docs, "doc_id", "text", size, overlap)
      .collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).toSeq
      }
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(chunks.keySet == texts.keySet)
    for ((id, rs) <- chunks) {
      val text = texts(id)
      // chunk ids dense from 0; starts advance by exactly the stride
      assert(rs.map(_.getInt(1)) == rs.indices)
      assert(rs.map(_.getInt(2)) == rs.indices.map(_ * stride + 1))
      // every chunk is non-empty, ≤ size, and a verbatim slice
      rs.foreach { r =>
        val (start, end, c) = (r.getInt(2), r.getInt(3), r.getString(4))
        assert(c.nonEmpty && c.length <= size)
        assert(end == start + c.length - 1)
        assert(c == text.substring(start - 1, end))
      }
      // dropping the overlap from every chunk after the first rebuilds
      // the document exactly — nothing lost, nothing duplicated
      val rebuilt = rs.head.getString(4) +
        rs.tail.map(_.getString(4).drop(overlap)).mkString
      assert(rebuilt == text)
      // a doc shorter than size yields exactly one chunk
      if (text.length <= size) assert(rs.length == 1)
    }
  }

  test("tfidf: ubiquitous terms score zero, distinctive terms rank first") {
    val docs = Seq(
      (1L, "the rocket the engine the"), // 'the' in every doc, df=3
      (2L, "the garden flower"),
      (3L, "the garden gnome"))
      .toDF("doc_id", "text")
    val got = Search.tfidfTopK(docs, "doc_id", "text", 5)
      .select("doc_id", "term", "tf", "score_u", "rn")
      .as[(Long, String, Long, Long, Int)].collect()
    // 'the' has df = N → idf_u = floor(ln((3+1)/(3+1))·1e6) = 0
    got.filter(_._2 == "the").foreach { r => assert(r._4 == 0L, r) }
    // each doc's rank-1 term is one of its df=1 exclusives (idf max),
    // with doc 1 preferring 'engine' over 'rocket' on the term tiebreak
    val rank1 = got.filter(_._5 == 1).map(r => r._1 -> r._2).toMap
    assert(rank1(1L) == "engine" && rank1(2L) == "flower" &&
      rank1(3L) == "gnome", rank1.toString)
    // k bound: never more than 5 rows per doc, ranks dense from 1
    got.groupBy(_._1).values.foreach { g =>
      assert(g.length <= 5 &&
        g.map(_._5).sorted.toSeq == (1 to g.length))
    }
    // shared 'garden' (df=2) outranks shared-everywhere 'the' in doc 2/3
    val d2 = got.filter(r => r._1 == 2L).sortBy(_._5).map(_._2)
    assert(d2.indexOf("garden") < d2.indexOf("the"))
  }

  test("bm25 index: probe ≡ one-shot over the union; replay idempotent; forget + rebuild") {
    import graft.ops.Forget
    val docs = Tables(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val seg = docs.filter(col("doc_id") % 20 === 0)
    val qs = Search.registeredQueries
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25idx_spec").toString + "/index"
    Search.writeBm25Index(base, "doc_id", "text", idx)
    Search.appendToBm25Index(spark, idx, seg, "doc_id", "text", "b0")
    def probe() = Search.bm25AgainstIndex(spark, idx, qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    val got = probe()
    val oneShot = Search.bm25TopK(base.unionByName(seg),
        "doc_id", "text", qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(got == oneShot, "index probe diverged from the one-shot pass")
    assert(got.nonEmpty)
    // the streaming replay-window closure: excluding a segment must
    // drop it from BOTH the postings AND the stats fold — a probe
    // excluding b0 must equal the one-shot pass over base ALONE (any
    // stats/postings asymmetry would shift every score)
    val exB0 = Search.bm25AgainstIndex(spark, idx, qs, 10,
        excludeIngest = Some("b0"))
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    val baseOnly = Search.bm25TopK(base, "doc_id", "text", qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(exB0 == baseOnly,
      "excluded-segment probe must equal the base-only one-shot pass")
    // at-least-once replay: byte-identical postings, identical probe
    def rows() = spark.read.parquet(
        graft.sources.IndexLifecycle.resolveDir(spark, idx))
      .select("doc_id", "t", "tf", "len").collect().map(_.toString).sorted.toSeq
    val before = rows()
    Search.appendToBm25Index(spark, idx, seg, "doc_id", "text", "b0")
    assert(rows() == before, "replayed append must be a no-op")
    assert(probe() == oneShot)
    // RTBF: forgotten docs leave the rankings; dft and postings are
    // exact immediately (the stale-N idf drift only perturbs absolute
    // scores, so compare MEMBERSHIP here, exact scores after rebuild)
    val victims = got.map(_._2).toSeq.distinct.sorted.take(3)
    assert(Forget.fromBm25Index(spark, idx, victims) > 0L)
    val afterForget = probe()
    assert(victims.forall(v => !afterForget.exists(_._2 == v)),
      "forgotten docs still ranked")
    // rebuild refreshes the corpus stats: probe must now equal the
    // one-shot pass over the SURVIVING population exactly
    Search.rebuildBm25Index(spark, idx)
    val survivors = base.unionByName(seg)
      .filter(!col("doc_id").isin(victims: _*))
    val oneShotAfter = Search.bm25TopK(survivors, "doc_id", "text", qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(probe() == oneShotAfter,
      "rebuilt index diverged from the surviving one-shot pass")
    val dir = graft.sources.IndexLifecycle.resolveDir(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.IndexLifecycle.segmentsOf(fs,
      new org.apache.hadoop.fs.Path(dir)) == Seq("base"))
  }

  test("bm25 RTBF erasure is byte-level: no victim-derived term survives anywhere under the index after forgetViaRebuild") {
    // the BM25 postings store RAW terms (column t) — the victims'
    // distinctive tokens must not survive in any file under the index
    // root once the reader-isolated forget has scrubbed the retired
    // dirs (the same contract StreamingCompactionSpec proves for the
    // shingle family's fingerprint sidecars)
    import graft.ops.Forget
    val secret = Seq("zqb1x", "zqb2y", "zqb3z")
    val corpus = Seq(
      (1L, s"alpha beta ${secret.mkString(" ")}"),
      (2L, s"alpha gamma ${secret.mkString(" ")}"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25rtbf").toString + "/index"
    Search.writeBm25Index(corpus, "doc_id", "text", idx, nBuckets = 4)
    val removed = Forget.fromBm25IndexViaRebuild(spark, idx, Seq(1L, 2L))
    assert(removed > 0L, "forget must remove the victims' postings")
    // scan EVERY byte of EVERY file under the index root — postings,
    // stats sidecars, params, markers, anything retained after prune
    import scala.jdk.CollectionConverters._
    val victimBytes = secret.map(_.getBytes("UTF-8"))
    val offenders = java.nio.file.Files
      .walk(java.nio.file.Paths.get(idx)).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter { f =>
        val bytes = java.nio.file.Files.readAllBytes(f)
        victimBytes.exists(tok =>
          bytes.sliding(tok.length).exists(_.sameElements(tok)))
      }.map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"victim-derived terms still at rest under the index: $offenders")
    // the survivor is untouched and the probe equals a fresh build
    // over the surviving population (stats recomputed from survivors)
    val left = spark.read.parquet(
        graft.sources.IndexLifecycle.resolveDir(spark, idx))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(left == Set(3L), s"survivors: $left")
    val qs = Seq((1, "alpha"), (2, "delta"))
    val got = Search.bm25AgainstIndex(spark, idx, qs, 10, nBuckets = 4)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    val fresh = Search.bm25TopK(corpus.filter(col("doc_id") === 3L),
        "doc_id", "text", qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    assert(got == fresh,
      "post-forget probe diverged from the surviving one-shot pass")
  }

  test("bm25 probe-at-version: pinned snapshots replay exactly while the live index grows; pruned versions fail loudly") {
    import graft.sources.IndexLifecycle
    val docs = Tables(spark, sfDir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val b0 = docs.filter(col("doc_id") % 20 === 0)
    val b1 = docs.filter(col("doc_id") % 20 === 10)
    val qs = Search.registeredQueries
    val idx = java.nio.file.Files
      .createTempDirectory("graft_bm25at_spec").toString + "/index"
    Search.writeBm25Index(base, "doc_id", "text", idx)
    Search.rebuildBm25Index(spark, idx) // convert → v1, rebuild → v2
    Search.appendToBm25Index(spark, idx, b0, "doc_id", "text", "b0") // v3
    Search.appendToBm25Index(spark, idx, b1, "doc_id", "text", "b1") // v4
    def shot(pop: org.apache.spark.sql.DataFrame) =
      Search.bm25TopK(pop, "doc_id", "text", qs, 10)
        .select("qid", "doc_id", "rn", "score_u")
        .as[(Int, Long, Int, Long)].collect().toSet
    def at(v: Long) = Search.bm25AgainstIndexAt(spark, idx, v, qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet
    // each pinned version scores exactly the corpus prefix that was
    // committed as of that version — stats and postings both pinned
    assert(at(2L) == shot(base), "v2 must replay the pre-append snapshot")
    assert(at(3L) == shot(base.unionByName(b0)))
    assert(at(4L) == shot(base.unionByName(b0).unionByName(b1)))
    // the live probe is the newest pin
    assert(at(4L) == Search.bm25AgainstIndex(spark, idx, qs, 10)
      .select("qid", "doc_id", "rn", "score_u")
      .as[(Int, Long, Int, Long)].collect().toSet)
    // outside the window: loud, names readable versions, never falls back
    val e = intercept[RuntimeException](at(99L))
    assert(e.getMessage.contains("not readable"))
  }
}
