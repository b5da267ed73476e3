package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scaling smoke: run the heaviest operator families on a
  * synthetically replicated corpus (N× the sf0.1 documents/embeddings
  * tables, distinct ids per replica) and print per-scale wall times.
  * The point is the growth CURVE, not the absolute numbers: a bucketed
  * candidate-join operator should scale near-linearly in corpus size,
  * an accidental all-pairs would go quadratic. Results recorded in
  * PLANS.md.
  *
  * Usage: runMain graft.tools.ScaleSmoke [sfDir] [replicas...]
  */
object ScaleSmoke {
  /** Per-replica id offset shared by every replicator AND the
    * replica-membership filters below (e.g. inc_cc's "replica 0 only"
    * new-edge batch) — one constant so a step change cannot silently
    * decouple them.
    */
  private val ReplicaStep = 10000000L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // pass a lone 0 to skip the replica sweep (e.g. SCALE_OPS=seg runs)
    val reps = (if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                else Seq(1, 2, 4)).filter(_ > 0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Embeddings get a per-replica diagonal ±1 sign flip (a hash bit of
    // (component index, replica)). That's an orthogonal transform, so
    // cosines WITHIN a replica are preserved exactly — true near-dup
    // pairs survive untouched — while twins across replicas agree on
    // only ~half the signs (expected cosine ≈ 0, far under threshold).
    // Verbatim replication would hand every vector n-1 identical twins
    // and make the pair count quadratic by construction, exactly the
    // artifact the doc perturbation below avoids.
    def replicateEmb(df: DataFrame, n: Int): DataFrame = {
      val step = ReplicaStep
      df.crossJoin(spark.range(n).toDF("__r"))
        .withColumn("vec_id", col("vec_id") + col("__r") * step)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            when(col("__r") === 0 || pmod(hash(i, col("__r")), lit(2)) === 0, x)
              .otherwise(-x)))
        .drop("__r")
    }
    // Texts must be perturbed per replica — verbatim copies would make
    // every replica a near-dup of its siblings and the OUTPUT (pair
    // cliques) would grow quadratically by construction, hiding the
    // operator's own scaling. Tagging every token keeps replica sets
    // mutually dissimilar: true pairs stay within one replica, so
    // output grows linearly and wall time measures the plan.
    def replicateDocs(df: DataFrame, n: Int): DataFrame = {
      val step = ReplicaStep
      df.crossJoin(spark.range(n).toDF("__r"))
        .withColumn("doc_id", col("doc_id") + col("__r") * step)
        .withColumn("text",
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("__r")))))
        .drop("__r")
    }
    // SCALE_OPS=prefix1,prefix2 limits the sweep to matching tags so a
    // new operator's curve doesn't pay for re-running the whole zoo
    val only = sys.env.get("SCALE_OPS").map(_.split(",").toSet)
    def timed(tag: String)(f: => Long): Unit =
      if (only.forall(_.exists(tag.startsWith))) {
        val t0 = System.nanoTime()
        val rows = f
        println(f"SCALE $tag rows=$rows%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        // release operator-owned persists between points so a curve
        // measures the plan, not accumulating pinned cache pressure
        graft.util.Caches.sweep()
      }

    // rounds-to-convergence + per-round wall time of the star
    // contraction inside the tag's operator (round-12: the perennial
    // top-5 bench rows er_entities/dedup_clusters argue contraction-
    // schedule changes from this curve, not a single total)
    def ccStats(tag: String): Unit =
      if (only.forall(_.exists(tag.startsWith)))
        graft.ops.Cluster.lastRun.foreach { s =>
          println(s"SCALE $tag ccRounds=${s.rounds} starEdges=${s.edges} " +
            s"roundSecs=${s.roundSecs.map(x => f"$x%.2f").mkString(",")}")
        }

    // Adversarial df-skew: one 3-token phrase appended to every other
    // document, so one shingle's posting list is 50% of the corpus (the
    // stop-phrase case the df-cap exists for). The cap must drop it via
    // the partial-agg'd groupBy + anti-join BEFORE any pair join; the
    // hot curve tracking the unplanted one proves no stage is
    // proportional to that posting list landing in one task.
    def plantHot(df: DataFrame): DataFrame =
      df.withColumn("text",
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" zqhot vxhot wkhot")))
          .otherwise(col("text")))

    // Events replicate by USER (id offset per replica): per-user event
    // histories stay intact within a replica, so funnel stage sets and
    // cohort membership grow linearly in users — wall time measures the
    // chained per-user aggregates, not a synthetic clique.
    def replicateEvents(df: DataFrame, n: Int): DataFrame = {
      val step = ReplicaStep
      df.crossJoin(spark.range(n).toDF("__r"))
        .withColumn("user_id", col("user_id") + col("__r") * step)
        .drop("__r")
    }
    // Lineitem replicates verbatim: the approx-percentile sketch sees
    // n× the values of the identical distribution (cuts stay put; the
    // sketch merge tree and the bucket-assign scan are what scale).
    def replicateRows(df: DataFrame, n: Int): DataFrame =
      df.crossJoin(spark.range(n).toDF("__r")).drop("__r")

    // Customers replicate with a DOUBLE-digit replica tag on the name:
    // a single-digit tag would leave cross-replica twins at distance 1
    // (one substitution) and hand every record n-1 fake matches; two
    // changed characters puts twins at distance 2 > the ER threshold,
    // so match structure grows linearly in replicas.
    def replicateCustomers(df: DataFrame, n: Int): DataFrame = {
      val step = ReplicaStep
      df.crossJoin(spark.range(n).toDF("__r"))
        .withColumn("c_custkey", col("c_custkey") + col("__r") * step)
        .withColumn("c_name",
          concat(col("c_name"), lit("_"), col("__r"), col("__r")))
        .drop("__r")
    }

    // Shared dirty-feed derivation for the ER linkage curves: one
    // md5-picked character deleted per master name, ids offset into a
    // namespace disjoint from EVERY replicated master key (derive the
    // offset from the replica layout — the er_link hard-coded-offset
    // collision class, fixed once, must not be re-introduced per site).
    def crmFeed(masters: DataFrame, idOffset: Long): DataFrame = {
      val p = (pmod(conv(substring(md5(
          concat(lit("crm:"), col("c_custkey").cast("string"))),
          1, 8), 16, 10).cast("long"),
        length(col("c_name")).cast("long")) + 1).cast("int")
      masters.select(
        (col("c_custkey") + idOffset).as("f_id"),
        concat(col("c_name").substr(lit(1), p - 1),
          col("c_name").substr(p + 1, length(col("c_name"))))
          .as("f_name"),
        col("c_nationkey").as("f_nation"))
    }

    val docs = graft.util.Tables(spark, sfDir, "documents")
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
    val events = graft.util.Tables(spark, sfDir, "events")
    val lineitem = graft.util.Tables(spark, sfDir, "lineitem")
    val customer = graft.util.Tables(spark, sfDir, "customer")
    val orders = graft.util.Tables(spark, sfDir, "orders")

    // Segment-growth cost model (round-10 VERDICT #3): steady-state
    // streaming appends accumulate one `ingest=` segment per trigger,
    // and probes pay per-segment listing, stats-sidecar reads and
    // parquet footer sets. The curve holds the CORPUS fixed and varies
    // only how many segments it is split across — any probe growth is
    // pure segment-count overhead, not data. Then maybeRebuild(8)
    // collapses (a no-op at ≤8) and the probe must return to the
    // one-segment number: the policy that keeps steady-state streaming
    // probes flat at amortized O(rebuild/maxSegments) per batch.
    // Run: SCALE_OPS=seg runMain graft.tools.ScaleSmoke <sfDir> 0
    if (only.exists(_.contains("seg"))) {
      val q0 = graft.ops.Search.registeredQueries
      for (sc <- Seq(1, 4, 16, 64, 256)) {
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft_scale_seg_s$sc").toString + "/index"
        timed(s"seg_build s$sc") {
          graft.ops.Search.writeBm25Index(
            docs.filter(pmod(col("doc_id"), lit(sc)) === 0),
            "doc_id", "text", idx)
          (1 until sc).foreach { r =>
            graft.ops.Search.appendToBm25Index(spark, idx,
              docs.filter(pmod(col("doc_id"), lit(sc)) === r),
              "doc_id", "text", ingestTag = s"s$r")
          }
          spark.read.parquet(
            graft.sources.IndexLifecycle.resolveDir(spark, idx)).count()
        }
        timed(s"seg_probe_warm s$sc")(
          graft.ops.Search.bm25AgainstIndex(spark, idx, q0, 10).count())
        timed(s"seg_probe s$sc")(
          graft.ops.Search.bm25AgainstIndex(spark, idx, q0, 10).count())
        timed(s"seg_maybe_rebuild s$sc") {
          val ran = graft.sources.IndexLifecycle.maybeRebuild(spark, idx,
            maxSegments = 8)(graft.ops.Search.bm25RebuildClosure(spark))
          assert(ran == (sc > 8),
            s"maybeRebuild(8) must fire iff segments > 8 (sc=$sc, ran=$ran)")
          if (ran) 1L else 0L
        }
        timed(s"seg_probe_after s$sc")(
          graft.ops.Search.bm25AgainstIndex(spark, idx, q0, 10).count())
      }
    }

    // appendGen cost vs TABLE SIZE (r17 write face): the append's
    // claim is O(new data) — fresh rows write as new part files and
    // the current generation's files carry forward by hard link
    // (metadata per file, no bytes) — so with the APPEND BATCH FIXED
    // the append column must stay ~flat while the table (and the
    // naive rewrite, measured beside it for contrast) grows with x.
    // The seed column prices the snapshots; it is expected to scale.
    // Run: SCALE_OPS=appendgen runMain graft.tools.ScaleSmoke <sfDir> 0
    if (only.exists(_.contains("appendgen"))) {
      val orders = graft.util.Tables(spark, sfDir, "orders")
      val batchRows = orders.filter(col("o_orderkey") % 101 === 0)
      for (x <- Seq(1, 4, 16, 32)) {
        val t = java.nio.file.Files
          .createTempDirectory(s"graft_scale_app_x$x").toString + "/tbl"
        val base = orders.crossJoin(spark.range(x).toDF("__r"))
          .withColumn("o_orderkey",
            col("o_orderkey") + col("__r") * 100000000L)
          .drop("__r")
        timed(s"appendgen_seed x$x") {
          graft.sources.Compaction.writeGen(base.repartition(32), t)
          graft.sources.Compaction.readTable(spark, t).count()
        }
        val b1 = batchRows.withColumn("o_orderkey",
          col("o_orderkey") + lit(9000000000L))
        timed(s"appendgen_append x$x") {
          graft.sources.Compaction.appendGen(b1, t)
          b1.count()
        }
        val b2 = batchRows.withColumn("o_orderkey",
          col("o_orderkey") + lit(9100000000L))
        timed(s"appendgen_rewrite x$x") {
          // the naive union-rewrite of the SAME batch, for contrast
          graft.sources.Compaction.writeGen(
            graft.sources.Compaction.readTable(spark, t).unionByName(b2), t)
          b2.count()
        }
      }
    }

    // The same probe-vs-segment-count curve for the SHINGLE family —
    // a second measured instance of the cost model, and (round 10) the
    // one whose append path now runs the absorbed-replay pre-check on
    // every seal, so the build column also prices that check at real
    // segment counts. Corpus fixed (docs %10≠0, uncapped so the probe
    // result is IDENTICAL at every split), probe batch fixed
    // (%10==0 ∧ %7==0), segments vary.
    // Run: SCALE_OPS=segsh runMain graft.tools.ScaleSmoke <sfDir> 0
    if (only.exists(_.contains("segsh"))) {
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val probeB = docs.filter(col("doc_id") % 10 === 0 &&
        col("doc_id") % 7 === 0)
      def probe(idx: String): Long =
        graft.ops.Dedup.jaccardAgainstIndex(spark, idx, probeB,
          "doc_id", "text", n = 3, threshold = 0.5).count()
      for (sc <- Seq(1, 4, 16, 64)) {
        val idx = java.nio.file.Files
          .createTempDirectory(s"graft_scale_segsh_s$sc").toString + "/index"
        timed(s"segsh_build s$sc") {
          graft.ops.Dedup.writeShingleIndex(
            corpus.filter(pmod(col("doc_id"), lit(sc)) === 0),
            "doc_id", "text", n = 3, idx)
          (1 until sc).foreach { r =>
            graft.ops.Dedup.appendToShingleIndex(spark, idx,
              corpus.filter(pmod(col("doc_id"), lit(sc)) === r),
              "doc_id", "text", n = 3, ingestTag = s"s$r")
          }
          spark.read.parquet(
            graft.sources.IndexLifecycle.resolveDir(spark, idx)).count()
        }
        timed(s"segsh_probe_warm s$sc")(probe(idx))
        timed(s"segsh_probe s$sc")(probe(idx))
        timed(s"segsh_maybe_rebuild s$sc") {
          val ran = graft.ops.Dedup.maybeRebuildShingleIndex(spark, idx,
            maxSegments = 8)
          assert(ran == (sc > 8),
            s"maybeRebuild(8) must fire iff segments > 8 (sc=$sc, ran=$ran)")
          if (ran) 1L else 0L
        }
        timed(s"segsh_probe_after s$sc")(probe(idx))
      }
    }

    // STREAMING-LOOP per-trigger cost over a LONG drain (r14 verdict
    // #4): 32 triggers of a fixed-size batch through attachCurate
    // against an offline index built over the xN corpus, per-trigger
    // wall time printed for BOTH compaction modes:
    //  - compact (maxSegments=8, the default in-loop policy): one
    //    segment accumulates per trigger and maybeRebuild fires every
    //    ~8 triggers — expect a SAWTOOTH whose flat part stays flat in
    //    trigger number (probes on the measured-knee plateau) and
    //    whose spikes are the amortized rebuild;
    //  - exportable (cap forced 0 for drain-export pins): segments
    //    accumulate unboundedly — expect per-trigger cost to grow with
    //    trigger number at the measured probe-vs-segment slope, the
    //    price the drain-export contract pays until its post-drain
    //    rebuild.
    // Batches are mutually dissimilar (per-trigger token tags) and
    // dissimilar from the corpus, so every trigger's survivors append:
    // the honest steady-state segment-growth regime.
    // Run: SCALE_OPS=stream runMain graft.tools.ScaleSmoke <sfDir> 8 32
    if (only.exists(_.contains("stream"))) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val triggers = 32
      // fixed batch base: the ORIGINAL %20==0 slice (size independent
      // of the corpus replica count), collected once — the MemoryStream
      // transport harness, not the operator (LlmShared doctrine)
      val baseRows = docs.filter(col("doc_id") % 20 === 0)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      def batchRows(t: Int): Seq[(Long, String)] =
        baseRows.map { case (id, text) =>
          (id + (100L + t) * ReplicaStep,
            text.split(" ").map(tok => s"${tok}_T$t").mkString(" "))
        }
      for (n <- reps) {
        val corpus = replicateDocs(docs, n).filter(col("doc_id") % 10 =!= 0)
        for (mode <- Seq("compact", "exportable")) {
          val root = java.nio.file.Files
            .createTempDirectory(s"graft_scale_stream_${mode}_x$n").toString
          val idx = root + "/index"
          graft.ops.Dedup.writeShingleIndex(corpus, "doc_id", "text",
            n = 3, idx, maxDf = 5)
          graft.ops.Dsir.writeModel(
            corpus.filter(col("doc_id") % 7 =!= 0),
            corpus.filter(col("doc_id") % 7 === 0),
            "doc_id", "text", root + "/model")
          val input = MemoryStream[(Long, String)]
          val q = graft.streaming.StreamingDedup.attachCurate(
              input.toDS().toDF("doc_id", "text"), "doc_id", "text",
              idx, root + "/model", root + "/out", n = 3,
              threshold = 0.8,
              maxSegments = if (mode == "exportable") 0 else 8,
              exportable = mode == "exportable")
            .option("checkpointLocation", root + "/ckpt")
            .start()
          try {
            for (t <- 0 until triggers) {
              val t0 = System.nanoTime()
              input.addData(batchRows(t): _*)
              q.processAllAvailable()
              val sec = (System.nanoTime() - t0) / 1e9
              val segs = graft.sources.IndexLifecycle.segmentCount(spark, idx)
              println(f"SCALE stream_$mode x$n trigger=$t%02d " +
                f"sec=$sec%.2f segs=$segs%d")
            }
          } finally q.stop()
          graft.util.Caches.sweep()
        }
      }
    }

    // the dedicated blocks above own these tags; when ONLY they were
    // requested, skip the main sweep entirely — its locally-blocks run
    // unconditional prep (index builds, generational snapshots) that
    // `timed`'s per-tag gate cannot suppress
    val dedicated = Set("seg", "segsh", "stream")
    val mainReps =
      if (only.exists(_.forall(dedicated.contains))) Seq.empty else reps
    for (n <- mainReps) {
      val d = replicateDocs(docs, n)
      val e = replicateEmb(emb, n)
      timed(s"jaccard x$n")(
        graft.ops.Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8, maxDf = 5).count())
      timed(s"jaccard_hot x$n")(
        graft.ops.Dedup.jaccardPairs(plantHot(d), "doc_id", "text", 3, 0.8,
          maxDf = 5).count())
      timed(s"minhash_lsh x$n")(
        graft.ops.Dedup.minhashLsh(d, "doc_id", "text", 3, 16, 4, 0.8, maxDf = 5).count())
      timed(s"simhash x$n")(
        graft.ops.Dedup.simhashPairs(d, "doc_id", "text", 3).count())
      timed(s"embed_lsh x$n")(
        graft.ops.Dedup.embeddingPairsLsh(e, "vec_id", "embedding", 64, 0.9).count())
      // SemDeDup hot-cell: plant a 20%-of-corpus near-dup pile on
      // centroid 0 (tiny per-vector one-component jitter keeps the
      // points distinct, mutually near-cos-1, and sub-clusterable —
      // exact duplicates are upstream exact-dedup's job and CANNOT be
      // split by re-clustering). Uncapped within-cell compare is
      // quadratic in the pile; the capped variant re-blocks the hot
      // cell into ≤maxCell sub-cells and must track the unplanted
      // curve. Pile ids avoid ≡0 (mod 50) so none become centroids.
      def plantHotCell(df: DataFrame): DataFrame = {
        val c0 = df.filter(col("vec_id") === 0)
          .select(col("embedding").as("__c0"))
        val pile = df.filter(pmod(col("vec_id"), lit(5)) === 3)
          .withColumn("vec_id", col("vec_id") + 900000001L)
          .filter(pmod(col("vec_id"), lit(50)) =!= 0)
          .crossJoin(broadcast(c0))
          // pile = 11 MODES around c0 (one component bumped +0.08 per
          // mode) plus per-member hash jitter (‖δ‖ ≈ 0.005). Mutual
          // cos ≈ 0.99 across modes — one semantic-dup family — but
          // the blob is multi-modal, so nearest-sub-centroid
          // assignment tiles it into ~modes sub-cells. (A unimodal
          // blob centered on c0 CANNOT be split by one Voronoi pass:
          // c0 is in the sub-centroid set and its cell swallows the
          // pile — measured; that regime needs more top-level
          // centroids, the operator's other documented knob.)
          .withColumn("embedding",
            transform(col("__c0"), (x, i) =>
              (x
                + when(i === (pmod(col("vec_id"), lit(11)) * 5).cast("int"),
                    lit(0.08)).otherwise(lit(0.0))
                + (pmod(hash(col("vec_id"), i), lit(1000)) - 500)
                  .cast("double") * lit(2e-5)).cast("float")))
          .drop("__c0")
        df.unionByName(pile)
      }
      timed(s"semdedup x$n")(
        graft.ops.SemDedup.semanticPairs(e, "vec_id", "embedding",
          50, 0.4).count())
      timed(s"semdedup_hot x$n")(
        graft.ops.SemDedup.semanticPairs(plantHotCell(e), "vec_id",
          "embedding", 50, 0.4).count())
      timed(s"semdedup_hot_capped x$n")(
        graft.ops.SemDedup.semanticPairsCapped(plantHotCell(e), "vec_id",
          "embedding", 50, 0.4, maxCell = 100, subEvery = 13).count())
      // UNIMODAL pile (hash jitter only, no mode structure): in dim 64
      // the member jitters are mutually near-orthogonal, so
      // |δx − δs|² ≈ |δx|² + |δs|² and every member's nearest
      // sub-centroid is the ONE with the smallest own-jitter — a
      // single sub-block swallows the pile and the capped sub-split
      // stays quadratic (the round-7 negative result, measured). The
      // auto variant detects the still-hot block structurally and
      // switches it to anchor star edges: linear in pile size.
      def plantPile(df: DataFrame): DataFrame = {
        val c0 = df.filter(col("vec_id") === 0)
          .select(col("embedding").as("__c0"))
        val pile = df.filter(pmod(col("vec_id"), lit(5)) === 3)
          .withColumn("vec_id", col("vec_id") + 900000001L)
          .filter(pmod(col("vec_id"), lit(50)) =!= 0)
          .crossJoin(broadcast(c0))
          .withColumn("embedding",
            transform(col("__c0"), (x, i) =>
              (x + (pmod(hash(col("vec_id"), i), lit(1000)) - 500)
                .cast("double") * lit(2e-5)).cast("float")))
          .drop("__c0")
        df.unionByName(pile)
      }
      timed(s"semdedup_pile_capped x$n")(
        graft.ops.SemDedup.semanticPairsCapped(plantPile(e), "vec_id",
          "embedding", 50, 0.4, maxCell = 100, subEvery = 13).count())
      timed(s"semdedup_pile_auto x$n")(
        graft.ops.SemDedup.semanticPairsAuto(plantPile(e), "vec_id",
          "embedding", 50, 0.4, maxCell = 100, subEvery = 13).count())
      // PQ + exact refine: candidate pool |probes|·refine·k is fixed
      // per probe, so the curve must track the ADC scan (linear in
      // corpus), not the refine join
      timed(s"pq_refine x$n")(
        graft.ops.Pq.adcTopKRefined(e, "vec_id", "embedding", m = 8,
          subDim = 8, centroidEvery = 50 * n, probePred = _ % 100 === 0,
          k = 10, refine = 4).count())
      // token-budget take: one group-key shuffle + running-sum window;
      // budget scaled with n so the kept set grows linearly too
      timed(s"token_budget x$n")(
        graft.ops.Sampling.tokenBudgetSample(d, "doc_id", "lang",
          size(graft.ops.TextAnalysis.tokens(col("text"))),
          salt = "tb", budget = 3000L * n).count())
      // leakage-safe split: pair gen + CC (the dedup family's curve)
      // plus a broadcast left join and a map-only bucket
      timed(s"leakage_split x$n")(
        graft.ops.Sampling.leakageSafeSplit(d, "doc_id",
          graft.ops.Cluster.dedupClusters(
            graft.ops.Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.8,
              maxDf = 5).select("i", "j")),
          salt = "split", trainBps = 8000).count())
      timed(s"exact_dedup x$n")(
        graft.ops.Dedup.exact(d, "doc_id", "text").count())
      // md5-twin hyperplane LSH ANN: fixed probe count (pred ∝ 1/n),
      // so the curve must track the signature pass (linear in corpus)
      // plus the bucket-pruned candidate join — never all-pairs
      timed(s"lsh_md5 x$n")(
        graft.ops.Similarity.lshTopKMd5(e,
          e.filter(col("vec_id") % (100L * n) === 0),
          "vec_id", "embedding", k = 10).count())
      // 3-stage curation composition (repetition gate → exact-dedup
      // canon → benchmark decontamination): replica token-tagging keeps
      // 5-grams distinct across replicas, so the benchmark hit
      // structure grows linearly and the curve measures the chained
      // plans (cost ≈ sum of stages, each linear)
      timed(s"pipeline_curate x$n") {
        val corpus = d.filter(col("doc_id") % 7 =!= 0)
        val rep = graft.ops.TextAnalysis.repetition(corpus, "doc_id", "text")
        val kept = corpus.join(rep, "doc_id")
          .filter(floor(col("dup_trigram_ratio") * 1e6) <= 20000L &&
            floor(col("top_token_ratio") * 1e6) <= 120000L)
        val canon = kept.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id"))
        val deduped = kept.join(canon.select("doc_id"), Seq("doc_id"), "left_semi")
        val dirty = graft.ops.Dedup.ngramOverlap(d, "doc_id", "text", n = 5,
            benchPred = _ % 7 === 0)
          .select(col("doc").as("doc_id"))
        deduped.join(dirty, Seq("doc_id"), "left_anti").count()
      }
      // DSIR importance resampling: both model passes shuffle 256
      // bucket rows REGARDLESS of corpus size (the feature-hashing
      // point), scoring is explode + broadcast join + one partial
      // agg, the take is TakeOrdered — the whole family must track
      // the map-side feature explode, i.e. stay ~linear
      timed(s"dsir_weights x$n")(
        graft.ops.Dsir.importanceWeights(
          d.filter(col("doc_id") % 7 =!= 0),
          d.filter(col("doc_id") % 7 === 0), "doc_id", "text").count())
      timed(s"dsir_take x$n")(
        graft.ops.Dsir.importanceTake(
          graft.ops.Dsir.importanceWeights(
            d.filter(col("doc_id") % 7 =!= 0),
            d.filter(col("doc_id") % 7 === 0), "doc_id", "text"),
          n = 100).count())
      // per-benchmark contamination audit: one shingle pass + df
      // partial agg + inverted-index join — jaccardPairs economics
      timed(s"contamination x$n")(
        graft.ops.Dedup.contaminationReport(d, "doc_id", "text", n = 5,
          benchPred = _ % 7 === 0).count())
      // incremental semantic dedup: index build is the offline linear
      // pass; the PROBE (fixed-size batch against the n× index) is the
      // per-ingest cost and must stay near-flat — touched cells are
      // bounded by the batch, the partition filter prunes the rest of
      // the corpus at the file level
      val cellIdx = java.nio.file.Files
        .createTempDirectory(s"graft_scale_cell_x$n").toString + "/index"
      timed(s"sem_index_build x$n") {
        graft.ops.SemDedup.writeCellIndex(
          e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
          centroidEvery = 49 * n, indexPath = cellIdx)
        spark.read.parquet(cellIdx).count()
      }
      timed(s"sem_incremental x$n")(
        graft.ops.SemDedup.semanticAgainstIndex(spark, cellIdx,
          emb.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.4).count())
      // BM25: query terms re-tagged per replica so hit-list work scales
      // with the corpus too (untagged terms would only ever hit replica
      // 0 and the curve would measure just the index build)
      timed(s"bm25 x$n") {
        val qtags = (0 until n).flatMap { r =>
          graft.ops.Search.registeredQueries.map { case (qid, q) =>
            (qid * 100 + r, q.split(" ").map(t => s"${t}_$r").mkString(" "))
          }
        }
        graft.ops.Search.bm25TopK(d, "doc_id", "text", qtags, 10).count()
      }
      // k-means assignment with k held constant (centroidEvery ∝ n):
      // the map-only broadcast pass should be linear in the corpus
      timed(s"kmeans_assign x$n")(
        graft.ops.KMeansStep.assign(e, "vec_id", "embedding", 50 * n).count())
      // BPE training: fixed round count, each round one partial-agg'd
      // pair count + map-only rewrite → linear in the corpus
      timed(s"bpe_train x$n")(
        graft.ops.Bpe.train(d, "text", 4).size.toLong)
      // connected components over the replica's near-dup pairs: replica
      // tagging keeps components within one replica, so the edge count
      // and the component structure grow linearly — wall time measures
      // the per-round join plans plus the (fixed) round count, since
      // component DIAMETER does not grow with corpus size.
      timed(s"cc_clusters x$n") {
        val pairs = graft.ops.Dedup
          .jaccardPairs(d, "doc_id", "text", 3, 0.8, maxDf = 5)
          .select("i", "j")
        graft.ops.Cluster.dedupClusters(pairs).count()
      }
      ccStats(s"cc_clusters x$n")
      // span dedup over n× docs (replica token-tagging keeps k-grams
      // distinct across replicas: duplication structure grows linearly)
      timed(s"span_coverage x$n")(
        graft.ops.SpanDedup.spanCoverage(d, "doc_id", "text", 8).count())
      // the ACTION half (rewriteWithoutSpans): the k-row removable
      // fan-out + (doc,pos) anti-join + per-doc reassembly must track
      // span_coverage's linear curve — a quadratic here would mean the
      // canonical-argmin or the interval union degraded to pair work.
      // Aggregate over length(text), NOT count(): a bare count lets
      // column pruning drop the sort_array/array_join reassembly and
      // the curve measures nothing
      timed(s"span_rewrite x$n")(
        graft.ops.SpanDedup.rewriteWithoutSpans(d, "doc_id", "text", 8)
          .agg(sum(length(col("text")))).head.getLong(0))
      // behavioral analytics over n× users: three chained user-keyed
      // min-aggs (funnel) / cohort equi-join with no forced broadcast
      timed(s"funnel x$n")(
        graft.analytics.BehaviorQueries.funnel(replicateEvents(events, n)).count())
      timed(s"cohort x$n")(
        graft.analytics.BehaviorQueries
          .cohortRetention(replicateEvents(events, n)).count())
      // entity resolution over n× customers: deletion-variant equi-join
      // candidates + levenshtein verify + star-contraction components
      timed(s"er_pairs x$n")(
        graft.ops.EntityResolution.matchPairs(replicateCustomers(customer, n),
          "c_custkey", "c_name", "c_nationkey").count())
      timed(s"er_entities x$n")(
        graft.ops.EntityResolution.entities(replicateCustomers(customer, n),
          "c_custkey", "c_name", "c_nationkey").count())
      ccStats(s"er_entities x$n")
      // depth-2 neighborhood with the hot-variant cap (the production
      // configuration — templated names make a few 2-delete variants
      // collide across much of a block; the cap keeps the candidate
      // join ∝ cold-key collisions)
      timed(s"er_pairs2 x$n")(
        graft.ops.EntityResolution.matchPairs(replicateCustomers(customer, n),
          "c_custkey", "c_name", "c_nationkey", maxDist = 2,
          maxDf = 64).count())
      // two-table linkage over n× customers vs an equally replicated
      // dirty feed (one md5-picked char deleted per name): candidates
      // are the cross-table (block, variant) equi-join — linear like
      // er_pairs, never |A|·|B|
      timed(s"er_link x$n") {
        val m = replicateCustomers(customer, n)
        val feed = crmFeed(m, (n + 1).toLong * ReplicaStep)
        graft.ops.EntityResolution.linkPairs(
          m, "c_custkey", "c_name", "c_nationkey",
          feed, "f_id", "f_name", "f_nation", maxDist = 1).count()
      }
      // approx-percentile production twin over n× values: GK sketch
      // merge + map-only bucket assign — the exact twin's per-group
      // value buffering is the memory cliff this path exists to avoid
      timed(s"equidepth_approx x$n")(
        graft.analytics.StatsQueries
          .equidepthApprox(replicateRows(lineitem, n)).count())
      // EXACT percentiles the scale-correct way: one range-exchange
      // sort + a bounded ranked-row fetch (no per-group value buffer)
      timed(s"equidepth_sorted x$n") {
        val li = replicateRows(lineitem, n)
        val probs = (1 to 15).map(_ / 16.0)
        graft.analytics.StatsQueries
          .exactCutsSorted(li, "l_extendedprice", probs).length.toLong
      }
      // PQ with codebook size held constant (centroidEvery ∝ n, like
      // kmeans_assign): encode is a broadcast join + partial-agg'd min
      // per (vector, subspace) — must be linear in the corpus; ADC adds
      // one broadcast LUT join + partial-agg'd sum per (probe, vector)
      timed(s"pq_adc x$n")(
        graft.ops.Pq.adcTopK(e, "vec_id", "embedding", m = 8, subDim = 8,
          centroidEvery = 50 * n, probePred = _ % (100L * n) === 0,
          k = 10).count())
      // IVF-PQ: same codebook scaling, fixed nlist/nprobe — the scored
      // candidate set is nprobe/nlist of the corpus, so the curve should
      // track pq_adc at ~nprobe/nlist the slope once fit cost amortizes
      timed(s"ivfpq x$n")(
        graft.ops.Pq.ivfPqTopK(e, e.filter(col("vec_id") % (100L * n) === 0),
          "vec_id", "embedding", k = 10, nlist = 16, nprobe = 4,
          m = 8, subDim = 8, centroidEvery = 50 * n, maxFit = 500L).count())
      // JL projection: map-only fan-out + one partial-agg'd integer
      // groupBy on (id, j) — strictly linear or the plan is wrong
      timed(s"jl_project x$n")(
        graft.ops.Embeddings.randomProject(e, "vec_id", "embedding",
          kOut = 16, salt = "jl").count())
      // perceptual image dedup on the low-entropy synthetic corpus:
      // every replica's images share the same gradient structure, so
      // UNCAPPED pairs are quadratic by construction (cross-replica
      // hash collisions are real near-dups under the metric) — the
      // curve certified is the hot-bucket-capped one, whose fan-out is
      // bounded per (band, value) bucket.
      timed(s"phash_capped x$n")(
        graft.ops.Multimodal.phashPairs(
          graft.ops.Multimodal.asPhashImageTable(d), maxDist = 3,
          maxBucket = 32).count())
      // export + gate + keyword ops: all single-exchange window/agg
      // plans — curves must stay ~linear in corpus size
      timed(s"shuffle_shards x$n")(
        graft.ops.Sampling.shuffleShards(d, "doc_id", "shuf", 64).count())
      timed(s"quality_gate x$n") {
        val q = graft.ops.TextAnalysis.quality(d, "text")
          .withColumn("score_u",
            floor(col("quality_score") * 1e6).cast("long"))
        graft.ops.Sampling.qualityGate(q, "doc_id", "source",
          col("score_u"), 3000).count()
      }
      timed(s"tfidf x$n")(
        graft.ops.Search.tfidfTopK(d, "doc_id", "text", 5).count())
      // data-quality validation: the N-check report is ONE scan + a
      // single-row reduce (plus one grouped exchange for its Unique),
      // quarantine routing is map-only, and FK is one left join against
      // DISTINCT parent keys (parent held fixed, child n×) — all three
      // curves must be linear in rows or the plan regressed
      locally {
        import graft.ops.Validate
        val rowSheet = Seq[Validate.Check](
          Validate.InRange("n_chars", 0.0, 500.0),
          Validate.InSet("lang", Seq("en", "fr", "de", "es")),
          Validate.MatchesRegex("source", "^src[0-9]+$"),
          Validate.NotNull("text"))
        timed(s"validate_report x$n")(
          Validate.report(d, rowSheet :+ Validate.Unique(Seq("doc_id")))
            .count())
        timed(s"validate_quarantine x$n")(
          Validate.quarantine(d, rowSheet).count())
        timed(s"validate_fk x$n")(
          Validate.foreignKey(replicateRows(lineitem, n),
            Seq("l_orderkey"), orders, Seq("o_orderkey")).count())
      }
      // incremental CC: fold a FIXED new-edge batch (replica-0 pairs
      // touching doc_id%13==0) into the labeling of everything else —
      // cost must track the touched frontier, not the n× corpus
      // (near-flat, like sem_incremental). Pair gen + base labeling
      // are prep, outside the clock.
      locally {
        val pairs = graft.ops.Dedup
          .jaccardPairs(d, "doc_id", "text", 3, 0.8, maxDf = 5)
          .select("i", "j")
        val newE = pairs.filter(
            (col("i") % 13 === 0 || col("j") % 13 === 0) &&
              col("i") < ReplicaStep)
          .localCheckpoint(eager = true)
        val labels = graft.ops.Cluster
          .connectedComponents(pairs.exceptAll(newE))
          .localCheckpoint(eager = true)
        timed(s"inc_cc x$n")(
          graft.ops.Cluster.incrementalComponents(labels, newE).count())
        ccStats(s"inc_cc x$n")
      }
      // Persisted ER variant index: build over n× masters, probe a
      // FIXED dirty-feed batch (one-char-deleted twins of the replica-0
      // masters). A generic batch's variants hash into every bucket, so
      // the probe scans the whole (linearly growing) index — the honest
      // expectation is a shallow linear scan curve with FIXED join
      // output (the double-digit replica name tags keep cross-replica
      // twins at distance 2 > the threshold).
      locally {
        val m = replicateCustomers(customer, n)
        val erIdx = java.nio.file.Files
          .createTempDirectory(s"graft_scale_er_x$n").toString + "/index"
        timed(s"er_index_build x$n") {
          graft.ops.EntityResolution.writeVariantIndex(
            m, "c_custkey", "c_name", "c_nationkey", erIdx)
          spark.read.parquet(erIdx).count()
        }
        val feed = crmFeed(m.filter(col("c_custkey") < ReplicaStep),
          (n + 1).toLong * ReplicaStep)
        timed(s"er_index_probe x$n")(
          graft.ops.EntityResolution.linkAgainstIndex(spark, erIdx, feed,
            "f_id", "f_name", "f_nation", maxDist = 1).count())
      }
      // Persisted BM25 postings index: build over n× docs, probe the
      // FIXED replica-0-tagged query set. Expectation: linear build,
      // near-flat probe (hit lists fixed; only the touched buckets'
      // linear growth shows).
      locally {
        val bmIdx = java.nio.file.Files
          .createTempDirectory(s"graft_scale_bm25_x$n").toString + "/index"
        timed(s"bm25_index_build x$n") {
          graft.ops.Search.writeBm25Index(d, "doc_id", "text", bmIdx)
          spark.read.parquet(bmIdx).count()
        }
        val q0 = graft.ops.Search.registeredQueries.map { case (qid, q) =>
          (qid, q.split(" ").map(t => s"${t}_0").mkString(" "))
        }
        timed(s"bm25_index_probe x$n")(
          graft.ops.Search.bm25AgainstIndex(spark, bmIdx, q0, 10).count())
      }
      // Persisted span-fingerprint index: build over n× docs, probe a
      // FIXED batch (replica-0 %20==10 docs). Same shape expectation as
      // er_index_probe: the batch's k-grams bucket everywhere, so the
      // probe pays a linear bucket scan; the combined-count join output
      // stays fixed (per-replica token tags keep spans replica-local).
      locally {
        val spanIdx = java.nio.file.Files
          .createTempDirectory(s"graft_scale_span_x$n").toString + "/index"
        timed(s"span_index_build x$n") {
          graft.ops.SpanDedup.writeSpanIndex(
            d.filter(col("doc_id") % 20 =!= 10), "doc_id", "text", 8, spanIdx)
          spark.read.parquet(spanIdx).count()
        }
        timed(s"span_index_probe x$n")(
          graft.ops.SpanDedup.coverageAgainstIndex(spark, spanIdx,
            d.filter(col("doc_id") < ReplicaStep &&
              col("doc_id") % 20 === 10),
            "doc_id", "text", 8).count())
      }
      // TrainExport commit + replay over n× inputs (r13 verdict #5):
      // the commit pays recipe + staged write + fingerprint, the
      // replay pays the same plus pin validation — both must track the
      // recipe's own (linear) cost; a super-linear stage here would
      // mean the manifest machinery, not the recipe, is the bottleneck.
      // Prep (generational snapshot + index build) sits outside the
      // clocks; the index holds the corpus minus the %20==10 slice so
      // the canon anti-join does real work at every scale.
      locally {
        graft.ops.TrainExport.registerRecipe("scale_export_v1") { (s, in, p) =>
          val batch = in.table("docs")
          val t = in.index("text")
          val drop = graft.ops.Dedup.jaccardAgainstIndexAt(s, t.path,
              t.version, batch, "doc_id", "text", n = 3, threshold = 0.8)
            .select(col("i").as("doc_id")).distinct()
          batch.join(drop, Seq("doc_id"), "left_anti").select("doc_id")
        }
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_scale_texp_x$n").toString
        graft.sources.Compaction.writeGen(d, s"$root/docs")
        graft.ops.Dedup.writeShingleIndex(
          d.filter(col("doc_id") % 20 =!= 10), "doc_id", "text", 3,
          s"$root/text", maxDf = 5)
        graft.ops.Dedup.rebuildShingleIndex(spark, s"$root/text")
        timed(s"train_commit x$n") {
          graft.ops.TrainExport.commit(spark, s"$root/export",
            "scale_export_v1", params = Map.empty,
            tables = Map("docs" -> s"$root/docs"),
            indexes = Map("text" -> s"$root/text"))
          spark.read.parquet(s"$root/export/data").count()
        }
        timed(s"train_replay x$n")(
          graft.ops.TrainExport.replay(spark, s"$root/export").count())
      }
    }
    spark.stop()
  }
}
