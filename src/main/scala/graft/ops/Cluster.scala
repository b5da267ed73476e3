package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise dedup verdicts ([[Dedup.jaccardPairs]], MinHash/SimHash
  * candidates) into per-document cluster assignments so a pipeline can
  * keep ONE canonical document per duplicate cluster. Pairs alone can't
  * do that: {A~B, B~C} must collapse to one cluster {A,B,C} even though
  * (A,C) was never scored.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al. 2014,
  * "Connected Components in MapReduce and Beyond") — the canonical
  * shared-nothing CC. Each round rewrites the EDGE set with two
  * grouped-min passes:
  *   large-star: every node links its LARGER neighbors to the minimum
  *   of its neighborhood; small-star: every node links its smaller
  *   neighbors (and itself) to that minimum. Both are one partial-agg'd
  *   groupBy-min + one equi-join — pure shuffle-on-key plans, nothing
  *   driver-side but the (exact) fixpoint test. Convergence is
  *   O(log² n) rounds REGARDLESS of component diameter; at fixpoint the
  *   edges form stars from every node to its component minimum.
  *
  * History: rounds 2–4 used hash-min label propagation, which needs
  * component-DIAMETER rounds. Near-clique dup clusters (diameter ≤ ~3)
  * never exposed that; round 5's entity-resolution graphs (chains of
  * single-edit neighbors) did — at sf0.1 the ER graph still had 2012
  * clusters after 20 propagation rounds vs the true 1997, i.e. a
  * SILENTLY WRONG fixpoint under any fixed round cap, and adding
  * pointer-jumping compression still left minima crawling along graph
  * edges. Star contraction rewrites the edges themselves, so reach
  * multiplies per round.
  *
  * At 100 TB: edges ∝ verified near-dup pairs (already candidate-bounded
  * by LSH), both star passes are partial-agg'd groupBy-mins; a giant
  * component (spam template cluster) skews one grouping key only until
  * its first contraction round collapses it onto the minimum.
  */
object Cluster {

  /** The conf key that switches the iteration frames from
    * executor-local to RELIABLE checkpointing. See [[materialize]].
    * The checkpoint dir is SparkContext-global: configure ONE root per
    * context (sessions sharing a context must agree on it).
    */
  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** Instrumentation from the most recent [[connectedComponents]] run
    * on this thread: contraction rounds to the fixpoint, final
    * star-edge count, and per-round wall seconds (materialize +
    * fixpoint test). Diagnostic only — ScaleSmoke's cc modes print it
    * so any contraction-schedule change argues from a measured
    * rounds×cost curve instead of a single total.
    */
  final case class CcRunStats(rounds: Int, edges: Long,
                              roundSecs: Seq[Double])

  private val lastRunTL = new ThreadLocal[CcRunStats]

  def lastRun: Option[CcRunStats] = Option(lastRunTL.get)

  private val ckptLock = new Object

  /** Test seam for the rejected-but-kept tail contraction schedule —
    * lets CcPropertySpec exercise the smallStar-only branch without
    * forking a JVM for the env var. JVM-GLOBAL MUTABLE STATE: assumes
    * the suite runs single-JVM with sequential test execution (the
    * repo's sbt default — no parallel suites); the owning spec flips
    * it inside try/finally so no other test observes it set. Would a
    * concurrent runner ever be adopted, thread this through a
    * components() parameter instead.
    */
  private[graft] var tailScheduleForTest = false

  /** Materialize an iteration frame and truncate its lineage — every
    * round of the star-contraction loop must cut the plan or round k
    * replays rounds 1..k-1.
    *
    * Default: eager `localCheckpoint` — blocks live on the executors
    * that computed them. Fast (no distributed write), but
    * NON-RECOMPUTABLE: lineage is gone, so losing one executor mid-job
    * kills a long CC run. Fine on local[*] and for short loops.
    *
    * Opt-in reliable mode for cluster deployments: set
    * `spark.graft.checkpointDir` to a fault-tolerant path (HDFS /
    * object store) and iteration frames go through `df.checkpoint` —
    * files survive executor loss, so a 100-TB CC job rides out node
    * churn at the cost of one distributed write per round. Set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or sweep
    * the dir) to reclaim finished rounds' files.
    */
  private def materialize(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(CheckpointDirConf) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call, so set
        // it only when the configured ROOT actually differs from the
        // context's current one (getCheckpointDir returns the
        // fs-qualified root/UUID path — compare the qualified parent).
        // The checkpoint dir is SparkContext-GLOBAL: two sessions
        // configuring DIFFERENT roots on one context would ping-pong
        // it and land frames under each other's roots — one reliable
        // root per context is the deployment contract (documented on
        // CheckpointDirConf); the lock only keeps the compare-and-set
        // itself race-free.
        ckptLock.synchronized {
          val want = new org.apache.hadoop.fs.Path(dir)
          val wantQ = want.getFileSystem(sc.hadoopConfiguration)
            .makeQualified(want).toString
          val curRoot = sc.getCheckpointDir.map(c =>
            new org.apache.hadoop.fs.Path(c).getParent.toString)
          if (!curRoot.contains(wantQ)) sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }

  /** A materialized edge frame plus the exact row count and a
    * commutative xxhash64 XOR digest of its (`u`, `v`) rows, both
    * harvested from the materialization job itself.
    */
  private final case class MatEdges(df: DataFrame, n: Long, hx: Option[Long])

  /** [[materialize]] with the fixpoint-test inputs folded into the
    * materializing action (round-18, guide §1.2 "don't compute things
    * you throw away" applied to JOBS): the loop previously paid one
    * `count()` job per round on the just-checkpointed frame, plus an
    * `exceptAll` job on every count tie. A `Dataset.observe` below the
    * checkpoint harvests the row count and an order-independent
    * `bit_xor(xxhash64(u, v))` digest from the SAME job that builds the
    * checkpoint blocks (verified: the eager-checkpoint action fires the
    * observation; a lazy checkpoint + external count does NOT). The
    * digest is only a NEGATIVE gate — unequal digests prove the edge
    * sets differ, skipping the exceptAll job on false ties (counts tie,
    * edges moved — every pre-convergence plateau round); equal digests
    * still run the exact `exceptAll` confirmation, so convergence
    * remains EXACT and a hash collision costs one extra round's work,
    * never a wrong fixpoint. XOR is collision-safe against duplicate
    * rows here because every loop frame closes with `distinct()`.
    */
  private def materializeCounted(df: DataFrame): MatEdges = {
    val obs = org.apache.spark.sql.Observation()
    val out = materialize(df.observe(obs,
      count(lit(1)).as("n"),
      bit_xor(xxhash64(col("u"), col("v"))).as("hx")))
    val m = obs.get
    MatEdges(out, m("n").asInstanceOf[Long],
      Option(m("hx")).map(_.asInstanceOf[Long]))
  }

  /** Assign every node appearing in `edges` (columns `i`, `j`) the min
    * node id of its connected component. Returns (`node`, `cluster`).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // canonical undirected edge set, self-loops dropped
    var eM = materializeCounted(edges
      .select(least(col("i"), col("j")).as("u"),
        greatest(col("i"), col("j")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var e = eM.df
    // every node that appears in any pair — the label domain (fixed
    // across rounds; star contraction may drop a node from the edge
    // set once it is directly attached to its minimum). Consumed
    // exactly once (the closing label join), so it is NOT persisted:
    // the r18 job audit found the old persist built an InMemoryRelation
    // inside the one job that read it and the unpersist ran before that
    // job even started — pure overhead.
    val nodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .distinct()

    // large-star: u links every STRICTLY LARGER neighbor to
    // m = min(N(u) ∪ {u}); small-star: u links its ≤ neighbors and
    // itself to the minimum of that set. Both: partial-agg'd
    // groupBy-min + equi-join, emitted edges deduped.
    def largeStar(cur: DataFrame): DataFrame = {
      val adj = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = adj.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      adj.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // no distinct here: duplicate edges cannot change any grouped
      // min, and smallStar's closing distinct canonicalizes the round —
      // dropping it removes one exchange per round
    }
    def smallStar(cur: DataFrame): DataFrame = {
      val o = cur.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = o.groupBy("u").agg(min(col("v")).as("m"))
      o.join(mins, "u")
        .select(col("v").as("n"), col("m"))
        .union(mins.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
    }

    var iter = 0
    var converged = false
    val roundSecs = Seq.newBuilder[Double]
    // Contraction-schedule experiment knob (round 13, PLANS.md):
    // GRAFT_CC_SCHEDULE=tail switches to smallStar-ONLY rounds once the
    // edge count stops shrinking round-over-round (half the grouped-min
    // passes per tail round). A smallStar fixpoint is NOT necessarily
    // the CC fixpoint — an already-oriented chain (3→2, 2→1) is
    // smallStar-stable without being stars — so a tail round that
    // changes nothing triggers one full alternation VERIFY round, and
    // only THAT round changing nothing converges. MEASURED AND
    // REJECTED as a default (PLANS.md round-13 table): the stall
    // trigger fires exactly on the final converging rounds, so the
    // mandatory verify round ADDS a round everywhere (er_entities 4→5,
    // inc_cc 2→3 at x1–x8) and never saves one. The knob stays for
    // reproducing the experiment; CcPropertySpec pins the tail
    // schedule's correctness on the oriented-chain counterexample.
    val tailSchedule = tailScheduleForTest ||
      sys.env.get("GRAFT_CC_SCHEDULE").contains("tail")
    var shrinkStopped = false
    var mustVerify = false
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      val smallOnly = tailSchedule && shrinkStopped && !mustVerify
      // ONE star cycle per materialization. Chaining TWO cycles per
      // checkpoint was measured and rejected: the deeper
      // unmaterialized plan (4 grouped-min passes + 2 distincts in one
      // query) planned strictly worse — 5.5 s vs 1.7 s for
      // dedup_clusters at sf0.1.
      val nextM = materializeCounted(
        if (smallOnly) smallStar(e) else smallStar(largeStar(e)))
      val next = nextM.df
      // exact fixpoint test on the (pair-bounded) edge set: count and
      // digest come free with the materialization (materializeCounted);
      // an exceptAll job runs only when BOTH tie, and its emptiness —
      // never the digest — is what declares convergence (a hash compare
      // alone could terminate early on a collision)
      val same = nextM.n == eM.n && nextM.hx == eM.hx &&
        next.exceptAll(e).limit(1).count() == 0
      if (same) {
        if (smallOnly) mustVerify = true // stable under smallStar only
        else converged = true
      } else mustVerify = false
      if (nextM.n >= eM.n) shrinkStopped = true
      roundSecs += (System.nanoTime() - t0) / 1e9
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] iter=$iter edges=${nextM.n} smallOnly=$smallOnly " +
          s"converged=$converged")
      e.unpersist(blocking = false)
      eM = nextM
      e = next
      iter += 1
    }
    lastRunTL.set(CcRunStats(iter, eM.n, roundSecs.result()))

    // fixpoint edges are stars (node → component min); the min itself
    // appears only on the v side and labels itself
    nodes
      .join(e.select(col("u").as("node"), col("v").as("c")), Seq("node"), "left")
      .groupBy("node")
      .agg(coalesce(min(col("c")), first(col("node"))).as("cluster"))
  }

  /** INCREMENTAL components: fold a batch of NEW edges into an
    * existing (`node`, `cluster`) labeling without re-walking the
    * historical edge set — the label-merge step a continuously-
    * ingesting dedup pipeline needs after each probe
    * ([[graft.streaming.StreamingDedup]] finds the new pairs; this
    * updates the cluster table they feed).
    *
    * Correctness: a fixpoint labeling IS a star edge set (node → its
    * component minimum), and star edges are CC-equivalent to the
    * original graph — so components of (stars ∪ newEdges) equal
    * components of (oldEdges ∪ newEdges), with the SAME labels,
    * because the merged component's minimum is the min over the merged
    * stars and min-propagation re-derives it. The result is therefore
    * byte-identical to a one-shot recompute (hash-oracle-checked by
    * `dedup_clusters_incremental`).
    *
    * Cost: ∝ new edges + the members of the components they TOUCH.
    * Untouched components never enter the contraction loop — their
    * rows pass through via one anti-join — so steady-state ingest pays
    * for the merge frontier, not the corpus. New nodes (appearing only
    * in `newEdges`) are labeled by the loop like any other.
    */
  def incrementalComponents(oldLabels: DataFrame,
                            newEdges: DataFrame): DataFrame = {
    val e = newEdges.select(col("i"), col("j"))
    val endpoints = e.select(col("i").as("node"))
      .union(e.select(col("j").as("node"))).distinct()
    val touched = oldLabels.join(endpoints, "node")
      .select("cluster").distinct()
    val affected = oldLabels.join(touched, "cluster")
    val stars = affected.filter(col("node") =!= col("cluster"))
      .select(col("node").as("i"), col("cluster").as("j"))
    val merged = connectedComponents(stars.unionByName(e))
    // USING-join moves the join column first — restate the contract
    // column order explicitly
    oldLabels.join(touched, Seq("cluster"), "left_anti")
      .select(col("node"), col("cluster"))
      .unionByName(merged)
  }

  /** Cluster assignment + canonical-document choice over near-dup pairs:
    * (`doc_id`, `cluster`, `keep`) where keep=1 marks the cluster's
    * canonical (min-id) member — the row a dedup pipeline retains.
    */
  def dedupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .select(col("node").as("doc_id"), col("cluster"),
        (col("node") === col("cluster")).cast("int").as("keep"))

  /** Canonical-member selection: per near-dup cluster, the member with
    * the best quality score — the curation step that follows
    * clustering (min-id `keep` treats all duplicates as equal; real
    * pipelines keep the cleanest copy and drop the rest). `quality` is
    * any (id, score) frame, e.g. TextAnalysis.quality's quality_score.
    *
    * The ranking key is the floor-quantized micro-unit BIGINT of the
    * score (the repo-wide cross-engine contract — round()/raw-double
    * ranks flip between engines at rendering boundaries), with the id
    * as tiebreak. The per-cluster window parallelizes across clusters;
    * a cluster is a near-dup family, inherently small next to the
    * corpus.
    */
  def keepBest(clusters: DataFrame, quality: DataFrame,
               idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = clusters
      .join(quality.select(col(idCol).as("__qid"),
          floor(col(scoreCol) * 1e6).as("__qu")),
        col("doc_id") === col("__qid"))
    val w = Window.partitionBy(col("cluster"))
    scored
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__qu").desc, col("doc_id"))))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("doc_id").as("best_id"),
        (col("__qu").cast("double") / 1e6).as("best_quality"),
        col("__n").as("n_members"))
  }
}
