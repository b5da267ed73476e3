package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Entity resolution / record linkage: find records that refer to the
  * same real-world entity despite textual drift (typos, truncations) —
  * the structured-data sibling of document dedup, and the same
  * scale discipline: NEVER an all-pairs compare.
  *
  * Candidate generation is deletion-neighborhood blocking (the
  * SymSpell construction): two strings within Levenshtein distance 1
  * ALWAYS share a string obtained by deleting at most one character
  * from each — so candidates are an EQUI-JOIN on (block, variant)
  * derived keys, and the variant join is provably recall-complete for
  * distance ≤ 1 (unlike LSH banding there is no recall loss, which is
  * why the oracle can verify against the plain within-block compare).
  * A conjunctive block key (here: nation) models the deterministic
  * attributes a linkage pass trusts.
  *
  * Scale shape: variants are a map-only explode (L+1 keys per record);
  * the candidate join is an equi-join whose fan-out is bounded by
  * variant-key collisions, not block size² — the nation-block
  * quadratic a naive blocker pays is exactly what this avoids. The
  * verify is a per-candidate levenshtein (codegen'd, both engines
  * implement plain unit-cost edit distance). Entity ids come from
  * [[Cluster.dedupClusters]]'s large-star/small-star contraction.
  */
object EntityResolution {

  /** The deletion neighborhood of `s`: s itself plus every string with
    * one character deleted, de-duplicated (repeated characters yield
    * identical variants).
    */
  def deletionVariants(s: Column): Column =
    array_distinct(concat(
      array(s),
      transform(sequence(lit(1), length(s)), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** The depth-2 deletion neighborhood: every string obtainable by
    * deleting UP TO 2 characters. Built as deletions-of-deletions —
    * each 1-deletion variant's own neighborhood already contains
    * itself, so the flattened union is exactly {0,1,2}-deletion
    * strings. ~1 + L + L(L−1)/2 distinct keys per record (≈170 for an
    * 18-char name): the SymSpell trade — candidate keys grow ~L²/2 so
    * the verify join stays an equi-join instead of block².
    */
  def deletionVariants2(s: Column): Column =
    array_distinct(flatten(
      transform(deletionVariants(s), v => deletionVariants(v))))

  /** Matched pairs (i < j) within the same `blockCol` whose `nameCol`
    * Levenshtein distance ≤ `maxDist` (1 or 2), via the
    * deletion-variant equi-join — the SymSpell guarantee generalizes:
    * lev(a, b) ≤ d ⇒ the depth-d deletion neighborhoods intersect, so
    * the join is recall-complete at both depths and the levenshtein
    * verify makes it exact. Returns (i, j, dist).
    *
    * `maxDf` is the hot-variant skew guard (the Dedup shingle-cap
    * story): a variant key shared by more than `maxDf` records in a
    * block is dropped from candidate generation before the self-join —
    * at depth 2 on templated names (e.g. "Customer#000000NNN") a few
    * 2-delete variants collide across large fractions of a block, and
    * without the cap those keys alone re-create the block² join the
    * construction exists to avoid. Setting it trades recall for a
    * fan-out bound (only pairs whose EVERY shared variant is hot can be
    * lost), so the oracle-checked queries leave it unset.
    */
  def matchPairs(df: DataFrame, idCol: String, nameCol: String,
                 blockCol: String, maxDist: Int = 1,
                 maxDf: Int = Int.MaxValue): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist 1 or 2, got $maxDist")
    val recs = df.select(col(idCol).as("id"), col(nameCol).as("nm"),
      col(blockCol).as("blk"))
    // the join key is the HASH of the variant, not the string: 8-byte
    // shuffle keys instead of ~name-length strings, and a collision
    // can only ADD a candidate the levenshtein verify then rejects —
    // the result set is provably unchanged
    val neigh =
      if (maxDist == 1) deletionVariants(col("nm"))
      else deletionVariants2(col("nm"))
    // only (id, blk, v) rides through the fan-out join — 8-byte ids,
    // never the name payload; names are fetched AFTER the distinct
    // collapses candidate multiplicity (a near pair shares many
    // variants, so each occurrence row would otherwise carry both
    // strings). Join-then-fetch is the shape that survives 100 TB.
    val variants = recs
      .select(col("id"), col("blk"), explode(neigh).as("v0"))
      .select(col("id"), col("blk"), xxhash64(col("v0")).as("v"))
    val pruned =
      if (maxDf == Int.MaxValue) variants
      else {
        // per-record variants are already distinct (array_distinct), so
        // count(*) per (blk, v) IS the record df; partial-agg'd groupBy
        // — no hot key can skew a partition on the way in
        val hot = variants.groupBy("blk", "v")
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf)
          .select("blk", "v")
        variants.join(hot, Seq("blk", "v"), "left_anti")
      }
    val cand = pruned.as("a").join(pruned.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    val names = recs.select(col("id"), col("nm"))
    cand
      .join(names.select(col("id").as("i"), col("nm").as("ni")), "i")
      .join(names.select(col("id").as("j"), col("nm").as("nj")), "j")
      .withColumn("dist", levenshtein(col("ni"), col("nj")))
      .filter(col("dist") <= maxDist)
      .select("i", "j", "dist")
  }

  /** Two-table record LINKAGE — [[matchPairs]] across heterogeneous
    * sources (master table vs a dirty feed): same deletion-variant
    * blocking, same recall-completeness theorem (lev(a, b) ≤ d ⇒ the
    * depth-d deletion neighborhoods intersect — substitutions share
    * the both-sides deletion, insert/deletes are one side's deletion),
    * but the candidate join is A×B with no i<j canonicalization (the
    * id namespaces are disjoint by contract). The hot-variant cap
    * applies PER SIDE: a variant hot in either table creates
    * df_A·df_B fan-out, so each side prunes its own hot keys before
    * the join. Output (i, j, dist) with i from A and j from B.
    */
  def linkPairs(a: DataFrame, idA: String, nameA: String, blockA: String,
                b: DataFrame, idB: String, nameB: String, blockB: String,
                maxDist: Int = 1, maxDf: Int = Int.MaxValue): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist 1 or 2, got $maxDist")
    def side(df: DataFrame, id: String, nm: String,
             blk: String): (DataFrame, DataFrame) = {
      val recs = df.select(col(id).as("id"), col(nm).as("nm"),
        col(blk).as("blk"))
      val neigh =
        if (maxDist == 1) deletionVariants(col("nm"))
        else deletionVariants2(col("nm"))
      val variants = recs
        .select(col("id"), col("blk"), explode(neigh).as("v0"))
        .select(col("id"), col("blk"), xxhash64(col("v0")).as("v"))
      val pruned =
        if (maxDf == Int.MaxValue) variants
        else {
          val hot = variants.groupBy("blk", "v")
            .agg(count(lit(1)).as("__df"))
            .filter(col("__df") > maxDf)
            .select("blk", "v")
          variants.join(hot, Seq("blk", "v"), "left_anti")
        }
      (recs, pruned)
    }
    val (ra, va) = side(a, idA, nameA, blockA)
    val (rb, vb) = side(b, idB, nameB, blockB)
    val cand = va.as("a").join(vb.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    cand
      .join(ra.select(col("id").as("i"), col("nm").as("ni")), "i")
      .join(rb.select(col("id").as("j"), col("nm").as("nj")), "j")
      .withColumn("dist", levenshtein(col("ni"), col("nj")))
      .filter(col("dist") <= maxDist)
      .select("i", "j", "dist")
  }

  /** Entity assignment: connected components over the match pairs —
    * every record tagged with its entity's minimum member id.
    */
  def entities(df: DataFrame, idCol: String, nameCol: String,
               blockCol: String): DataFrame =
    Cluster.dedupClusters(matchPairs(df, idCol, nameCol, blockCol)
      .select("i", "j"))

  // ------------------------------------------------- persisted index

  /** The ER deletion-variant index — [[linkPairs]]' master side made
    * persistent, the fifth index family on the
    * [[graft.sources.IndexLifecycle]] contract (shingle, cell, IVF,
    * phash, variants): the master table's deletion neighborhoods are
    * derived ONCE by an offline build and land directory-partitioned
    * `ingest=<tag>/bucket=<pmod(variant-hash, nBuckets)>` with columns
    * (id, nm, blk, v), so every incoming dirty-feed batch equi-joins
    * the finished keys instead of re-deriving ~L (or ~L²/2) variants
    * per master record per batch. Probes push their touched buckets as
    * a partition filter (the IVF-probe pattern); `nm` rides in the
    * index because the levenshtein verify needs the master string and
    * a separate fetch would rescan the master table.
    *
    * The hot-variant cap is INDEX-SIDE truth, like the shingle hot
    * list: hot (blk, v) keys (df > maxDf over the master) are excluded
    * from the index AND persisted in a `_graft_hot_variants` sidecar
    * that every probe and append applies to its own side — a
    * batch-local df says nothing about master-side fan-out.
    */
  private def hotVariantsSidecar(dir: String) = s"$dir/_graft_hot_variants"
  private def erParamsSidecar(dir: String) = s"$dir/_graft_er_params"

  /** maxDist and nBuckets are INDEX CONTRACT (the phash params
    * doctrine): a probe or append run with a different depth derives
    * neighborhoods the stored rows cannot meet (silent recall loss),
    * and a different bucket count prunes the wrong partitions (silent
    * candidate loss). The build persists both; every later operation
    * validates and fails loudly on a mismatch.
    */
  private def writeErParams(spark: org.apache.spark.sql.SparkSession,
                            dir: String, maxDist: Int,
                            nBuckets: Int, maxDf: Int): Unit = {
    import spark.implicits._
    Seq((maxDist, nBuckets, maxDf)).toDF("max_dist", "n_buckets", "max_df")
      .coalesce(1).write.mode("overwrite").parquet(erParamsSidecar(dir))
  }

  private def readErParams(spark: org.apache.spark.sql.SparkSession,
                           dir: String): (Int, Int, Int) = {
    val df = spark.read.parquet(erParamsSidecar(dir))
    if (!df.columns.contains("max_df")) sys.error(
      s"variant index at $dir carries a pre-round-10 params sidecar " +
        s"(${df.columns.mkString(",")} — no max_df): the capping policy " +
        "is not pinned. Rebuild it offline with writeVariantIndex.")
    val r = df.head()
    (r.getAs[Int]("max_dist"), r.getAs[Int]("n_buckets"),
      r.getAs[Int]("max_df"))
  }

  private def requireErParams(spark: org.apache.spark.sql.SparkSession,
                              dir: String, maxDist: Int,
                              nBuckets: Int): Unit = {
    val (md, nb, _) = readErParams(spark, dir)
    require(md == maxDist && nb == nBuckets,
      s"variant index at $dir was built with maxDist=$md, nBuckets=$nb " +
        s"— caller passed maxDist=$maxDist, nBuckets=$nBuckets; a " +
        "mismatched depth or bucketing would silently lose matches")
  }

  private def variantRows(df: DataFrame, id: String, nm: String,
                          blk: String, maxDist: Int): DataFrame = {
    val recs = df.select(col(id).as("id"), col(nm).as("nm"),
      col(blk).as("blk"))
    val neigh =
      if (maxDist == 1) deletionVariants(col("nm"))
      else deletionVariants2(col("nm"))
    recs.select(col("id"), col("nm"), col("blk"),
        explode(neigh).as("v0"))
      .select(col("id"), col("nm"), col("blk"), xxhash64(col("v0")).as("v"))
  }

  def writeVariantIndex(master: DataFrame, idCol: String, nameCol: String,
                        blockCol: String, indexPath: String,
                        maxDist: Int = 1, nBuckets: Int = 16,
                        maxDf: Int = Int.MaxValue): Unit = {
    require(maxDist == 1 || maxDist == 2, s"maxDist 1 or 2, got $maxDist")
    val vars = variantRows(master, idCol, nameCol, blockCol, maxDist)
    val hot = vars.groupBy("blk", "v").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select("blk", "v")
    vars.join(hot, Seq("blk", "v"), "left_anti")
      .withColumn("bucket", pmod(col("v"), lit(nBuckets)).cast("int"))
      .withColumn("ingest", lit("base"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("ingest", "bucket")
      .parquet(indexPath)
    hot.coalesce(1).write.mode("overwrite")
      .parquet(hotVariantsSidecar(indexPath))
    writeErParams(master.sparkSession, indexPath, maxDist, nBuckets, maxDf)
  }

  /** Append a grown master table's NEW records under `ingest=<tag>` —
    * batchId-keyed and replay-idempotent via
    * [[graft.sources.IndexLifecycle.appendSegment]]'s sealed-segment
    * contract, like every other family's append.
    */
  def appendToVariantIndex(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, batch: DataFrame,
                           idCol: String, nameCol: String,
                           blockCol: String, ingestTag: String,
                           maxDist: Int = 1, nBuckets: Int = 16): Unit =
    graft.sources.IndexLifecycle.appendSegment(spark, indexPath, ingestTag) {
      (dir, tmp) =>
        requireErParams(spark, dir, maxDist, nBuckets)
        val hot = spark.read.parquet(hotVariantsSidecar(dir))
        variantRows(batch, idCol, nameCol, blockCol, maxDist)
          .join(hot, Seq("blk", "v"), "left_anti")
          .withColumn("bucket", pmod(col("v"), lit(nBuckets)).cast("int"))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    }

  /** Fenced segment-merge rebuild: collapse every ingest segment back
    * to `ingest=base` and refresh the hot list over the UNION's
    * per-(block, variant) dfs. Variants dropped by a previous build's
    * cap are gone from the stored rows and stay gone (the same
    * monotone under-cap drift direction as the shingle rebuild);
    * uncapped builds (the oracle-checked configuration) rebuild
    * losslessly.
    */
  def rebuildVariantIndex(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String,
                          orphanGraceMs: Long =
                            graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                          readerGraceMs: Long = 0L): Unit =
    graft.sources.IndexLifecycle.rebuild(spark, indexPath,
      orphanGraceMs, readerGraceMs)(variantRebuildClosure(spark))

  /** [[graft.sources.IndexLifecycle.maybeRebuild]] with this family's
    * build body; every param comes from the index's own sidecar, so an
    * auto-fired rebuild can never drift from the offline build. Pass
    * the same `readerGraceMs` discipline as your explicit rebuilds.
    * Returns true iff a rebuild ran.
    */
  def maybeRebuildVariantIndex(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, maxSegments: Int,
                               orphanGraceMs: Long =
                                 graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                               readerGraceMs: Long = 0L): Boolean =
    graft.sources.IndexLifecycle.maybeRebuild(spark, indexPath,
      maxSegments, orphanGraceMs, readerGraceMs)(variantRebuildClosure(spark))

  /** Build body shared with [[Forget.fromVariantIndexViaRebuild]]. */
  private[graft] def variantRebuildClosure(
      spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, String, String) => Unit =
    (src, srcDir, dst) => {
      // every param comes from the SOURCE dir's sidecar and is
      // re-persisted into the new version: maxDist is immutable across
      // rebuilds (the stored rows ARE the depth-d neighborhoods),
      // nBuckets pins the layout probes prune by, and maxDf pins the
      // capping policy — a rebuild call site can no longer silently
      // retune any of them (writeVariantIndex is the retune path)
      val (maxDist, nBuckets, maxDf) = readErParams(spark, srcDir)
      val rows = src.select(col("id"), col("nm"), col("blk"), col("v"))
        .distinct()
      // hot is monotone across rebuilds (union with the prior sidecar,
      // same contract as the shingle family): a key a past build capped
      // has no rows left to recount, but its index side is gone for
      // good — keeping it hot spares every later batch the dead-end
      // variant derivation and equi-join work on a key that cannot
      // produce a candidate
      val oldHot = spark.read.parquet(hotVariantsSidecar(srcDir))
        .select("blk", "v")
      val hot = rows.groupBy("blk", "v").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDf).select("blk", "v")
        .unionByName(oldHot).distinct()
      rows.join(hot, Seq("blk", "v"), "left_anti")
        .withColumn("bucket", pmod(col("v"), lit(nBuckets)).cast("int"))
        .withColumn("ingest", lit("base"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("ingest", "bucket")
        .parquet(dst)
      hot.coalesce(1).write.mode("overwrite")
        .parquet(hotVariantsSidecar(dst))
      writeErParams(spark, dst, maxDist, nBuckets, maxDf)
    }

  /** Link a dirty-feed batch against the PERSISTED master index —
    * [[linkPairs]] with the master side read pre-derived: the batch
    * derives its own variants live (hot-filtered by the INDEX's
    * sidecar), its touched buckets prune the index scan at the
    * partition level, candidates come from the (blk, v) equi-join, and
    * the per-candidate levenshtein verify makes the result exact —
    * identical output to [[linkPairs]] over master ∪ appended
    * segments, at per-batch cost ∝ batch, never master × batch
    * re-derivation. Output (i = master id, j = batch id, dist).
    *
    * `excludeIngest`: the streaming loop passes its own batch tag so a
    * replayed trigger does not link against its previously-appended
    * self (the same at-least-once window every family's probe closes).
    */
  def linkAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, batch: DataFrame,
                       idCol: String, nameCol: String, blockCol: String,
                       maxDist: Int = 1, nBuckets: Int = 16,
                       excludeIngest: Option[String] = None): DataFrame =
    linkProbe(spark,
      graft.sources.IndexLifecycle.resolveDir(spark, indexPath),
      segments = None, batch, idCol, nameCol, blockCol, maxDist,
      nBuckets, excludeIngest)

  /** [[linkAgainstIndex]] PINNED to a retained manifest version — the
    * reproducible-export read for the identity family, the same
    * contract as [[Dedup.jaccardAgainstIndexAt]]: the batch links
    * against exactly the master population version `v`'s marker
    * recorded, even while onboarding keeps appending. Fails loudly
    * outside the retention window; forgotten records stay forgotten
    * (a forget scrubs retired dirs).
    */
  def linkAgainstIndexAt(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, version: Long,
                         batch: DataFrame,
                         idCol: String, nameCol: String, blockCol: String,
                         maxDist: Int = 1, nBuckets: Int = 16): DataFrame = {
    import org.apache.hadoop.fs.Path
    val m = graft.sources.IndexLifecycle.manifestAt(spark, indexPath, version)
    linkProbe(spark, new Path(new Path(indexPath), m.dir).toString,
      segments = Some(m.segments), batch, idCol, nameCol, blockCol,
      maxDist, nBuckets, excludeIngest = None)
  }

  private def linkProbe(spark: org.apache.spark.sql.SparkSession,
                        dir: String, segments: Option[Seq[String]],
                        batch: DataFrame,
                        idCol: String, nameCol: String, blockCol: String,
                        maxDist: Int, nBuckets: Int,
                        excludeIngest: Option[String]): DataFrame = {
    require(maxDist == 1 || maxDist == 2, s"maxDist 1 or 2, got $maxDist")
    requireErParams(spark, dir, maxDist, nBuckets)
    val hot = spark.read.parquet(hotVariantsSidecar(dir))
    // own the persist: the batch variant frame feeds the touched-bucket
    // collect AND the candidate join (Caches contract, swept by caller)
    val bv = graft.util.Caches.own(
      variantRows(batch, idCol, nameCol, blockCol, maxDist)
        .join(hot, Seq("blk", "v"), "left_anti")
        .withColumn("bucket", pmod(col("v"), lit(nBuckets)).cast("int")))
    val touched = bv.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val idxAll = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched: _*))
    val idx0 = segments.fold(idxAll)(segs =>
      idxAll.filter(col("ingest").isin(segs: _*)))
    // segment filter = cheap replay prune; the id anti-join closes the
    // rebuild-absorbed-the-tag case (see Dedup.jaccardAgainstIndex)
    val idx = excludeIngest.fold(idx0) { t =>
      idx0.filter(col("ingest") =!= lit(t))
        .join(batch.select(col(idCol).as("id")).distinct(),
          Seq("id"), "left_anti")
    }
    // candidates as bare id pairs — names join AFTER the distinct
    // collapses variant multiplicity (linkPairs' join-then-fetch
    // shape); ni comes from the already-pruned index subset, never a
    // master rescan
    val cand = idx.as("a").join(bv.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    val ni = idx.select(col("id").as("i"), col("nm").as("ni")).distinct()
    val nj = batch.select(col(idCol).as("j"), col(nameCol).as("nj"))
    cand.join(ni, "i").join(nj, "j")
      .withColumn("dist", levenshtein(col("ni"), col("nj")))
      .filter(col("dist") <= maxDist)
      .select("i", "j", "dist")
  }

  val queries: Seq[GQuery] = Seq(

    // The oracle verifies recall-completeness of the deletion-variant
    // equi-join: it computes the SAME result by the plain within-block
    // quadratic compare (fine at oracle scale; the point is that the
    // engine-side equi-join provably finds every distance-≤1 pair).
    GQuery("er_match_pairs",
      (s, d) => matchPairs(Tables(s, d, "customer"),
          "c_custkey", "c_name", "c_nationkey")
        .orderBy(col("i"), col("j")),
      Some("""SELECT a.c_custkey AS i, b.c_custkey AS j,
          CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM customer a JOIN customer b
          ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY i, j""")),

    // Distance ≤ 2 via the depth-2 deletion neighborhood, WITH the
    // hot-variant cap — the production configuration. On "Customer#…"
    // template names the uncapped depth-2 join measured 24 s at sf0.1
    // (a handful of shared-template 2-delete variants re-create most of
    // the block² the construction avoids); the cap bounds candidates to
    // cold-key collisions. The oracle REPLAYS the cap exactly: it
    // regenerates the same depth-2 neighborhoods (DuckDB list ops),
    // counts the same per-(block, variant) dfs, prunes the same hot
    // keys, and verifies the same surviving candidates — so the capped
    // semantics are hash-checked, not hand-waved. (Spark joins on
    // xxhash64(variant), the oracle on the variant string; a 64-bit
    // collision could only merge two variants' dfs — ~1e-9 at this
    // vocabulary, and the levenshtein verify rejects any false pair.)
    // The uncapped form is spec-checked ≡ quadratic in
    // EntityResolutionSpec (randomized + planted).
    //
    // Scope note (honest bench accounting): TPC-H customer names are a
    // single "Customer#NNNNNNNNN" template, so distance ≤ 2 is
    // DEGENERATELY dense — at sf0.1 every record has ~11 true partners
    // (163k pairs) and ~hundreds of distance-≤4 near-misses per block
    // that become candidates; the full-corpus run measured 25 s, all of
    // it real candidate volume, not skew (no variant df exceeded the
    // cap). Real name corpora are diverse and nowhere near this dense.
    // The registered query therefore runs on a 3-nation subset (the
    // oracle mirrors the predicate) — same code path, same per-block
    // behavior, bounded suite cost; the full-corpus form stays
    // available via the API and ScaleSmoke tracks its curve.
    GQuery("er_match_pairs2",
      (s, d) => matchPairs(Tables(s, d, "customer")
            .filter(col("c_nationkey") < 3),
          "c_custkey", "c_name", "c_nationkey", maxDist = 2, maxDf = 48)
        .orderBy(col("i"), col("j")),
      Some("""WITH recs AS (
          SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk
          FROM customer WHERE c_nationkey < 3),
        d1 AS (SELECT id, nm, blk, list_distinct(list_append(
            list_transform(range(1, len(nm) + 1),
              i -> nm[1:CAST(i - 1 AS INT)] || nm[CAST(i + 1 AS INT):]),
            nm)) AS vs
          FROM recs),
        d2 AS (SELECT id, nm, blk, list_distinct(flatten(
            list_transform(vs, v -> list_append(
              list_transform(range(1, len(v) + 1),
                i -> v[1:CAST(i - 1 AS INT)] || v[CAST(i + 1 AS INT):]),
              v)))) AS vs
          FROM d1),
        vx AS (SELECT id, nm, blk, unnest(vs) AS v FROM d2),
        hot AS (SELECT blk, v FROM vx GROUP BY blk, v
          HAVING count(*) > 48),
        pruned AS (SELECT vx.id, vx.nm, vx.blk, vx.v FROM vx
          ANTI JOIN hot ON vx.blk = hot.blk AND vx.v = hot.v),
        cands AS (SELECT DISTINCT a.id AS i, b.id AS j,
            a.nm AS ni, b.nm AS nj
          FROM pruned a JOIN pruned b
            ON a.blk = b.blk AND a.v = b.v AND a.id < b.id)
        SELECT i, j, CAST(levenshtein(ni, nj) AS INT) AS dist
        FROM cands WHERE levenshtein(ni, nj) <= 2
        ORDER BY i, j""")),

    // Two-table linkage against a synthetic dirty feed: every clean
    // customer name minus ONE deterministically-chosen character
    // (md5-picked position — the oracle replays the derivation), ids
    // offset into a disjoint namespace. Each record must link its own
    // dirty twin at distance 1; template-name near-misses are real
    // matches under the metric and appear in both engines identically.
    GQuery("er_link_tables",
      (s, d) => {
        val cust = Tables(s, d, "customer").filter(col("c_nationkey") < 3)
        val p = (pmod(conv(substring(md5(
            concat(lit("crm:"), col("c_custkey").cast("string"))),
            1, 8), 16, 10).cast("long"),
          length(col("c_name")).cast("long")) + 1).cast("int")
        val crm = cust.select(
          (col("c_custkey") + 1000000L).as("crm_id"),
          concat(col("c_name").substr(lit(1), p - 1),
            col("c_name").substr(p + 1, length(col("c_name"))))
            .as("crm_name"),
          col("c_nationkey").as("crm_nation"))
        linkPairs(cust, "c_custkey", "c_name", "c_nationkey",
            crm, "crm_id", "crm_name", "crm_nation", maxDist = 1)
          .orderBy(col("i"), col("j"))
      },
      Some {
        val hex32 = LlmShared.duckHex32("'crm:' || id")
        s"""WITH recs AS (
            SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk
            FROM customer WHERE c_nationkey < 3),
          pos AS (SELECT id, nm, blk,
            $hex32 % len(nm) + 1 AS p FROM recs),
          crm AS (SELECT id + 1000000 AS id, blk,
            nm[1:CAST(p - 1 AS INT)] || nm[CAST(p + 1 AS INT):] AS nm
            FROM pos)
          SELECT a.id AS i, b.id AS j,
            CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
          FROM recs a JOIN crm b ON a.blk = b.blk
          WHERE levenshtein(a.nm, b.nm) <= 1
          ORDER BY i, j"""
      }),

    // Incremental linkage against the PERSISTED variant index — the
    // growing-master-table use case: base index over half the masters,
    // the other half appended as an ingest segment (batchId-keyed,
    // replay-idempotent), then the dirty feed probes base ∪ appended
    // with the touched-bucket partition filter. The result is BY
    // CONSTRUCTION the same as linkPairs over the full master table,
    // so the oracle is er_link_tables' replay verbatim — which is the
    // point: the persisted/appended path changes the cost model, not
    // one pair. Fixture memoized per dataset dir; the registered query
    // times the probe (the per-batch production cost).
    GQuery("er_link_incremental",
      (s, d) => {
        val cust = Tables(s, d, "customer").filter(col("c_nationkey") < 3)
        val idx = graft.util.TempFixtures.dir(s"erlink:$d") { p =>
          writeVariantIndex(cust.filter(col("c_custkey") % 2 === 0),
            "c_custkey", "c_name", "c_nationkey", p)
          appendToVariantIndex(s, p,
            cust.filter(col("c_custkey") % 2 === 1),
            "c_custkey", "c_name", "c_nationkey", ingestTag = "b0")
        }
        val pck = (pmod(conv(substring(md5(
            concat(lit("crm:"), col("c_custkey").cast("string"))),
            1, 8), 16, 10).cast("long"),
          length(col("c_name")).cast("long")) + 1).cast("int")
        val crm = cust.select(
          (col("c_custkey") + 1000000L).as("crm_id"),
          concat(col("c_name").substr(lit(1), pck - 1),
            col("c_name").substr(pck + 1, length(col("c_name"))))
            .as("crm_name"),
          col("c_nationkey").as("crm_nation"))
        linkAgainstIndex(s, idx, crm, "crm_id", "crm_name", "crm_nation",
            maxDist = 1)
          .orderBy(col("i"), col("j"))
      },
      Some {
        val hex32 = LlmShared.duckHex32("'crm:' || id")
        s"""WITH recs AS (
            SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk
            FROM customer WHERE c_nationkey < 3),
          pos AS (SELECT id, nm, blk,
            $hex32 % len(nm) + 1 AS p FROM recs),
          crm AS (SELECT id + 1000000 AS id, blk,
            nm[1:CAST(p - 1 AS INT)] || nm[CAST(p + 1 AS INT):] AS nm
            FROM pos)
          SELECT a.id AS i, b.id AS j,
            CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
          FROM recs a JOIN crm b ON a.blk = b.blk
          WHERE levenshtein(a.nm, b.nm) <= 1
          ORDER BY i, j"""
      }),

    // Linkage PINNED to a manifest version (the reproducible-export
    // read for the identity family, same doctrine as search_bm25_at):
    // base index over the EVEN masters, rebuild publishes v2 ([base]),
    // then the ODD masters are appended (v3). The dirty feed derives
    // from ALL masters but links pinned at v2 — only even-master pairs
    // may appear; a listing-based read would also match every odd
    // master (its own corruption twin included) and hash-mismatch
    // loudly. The pin is what the oracle verifies.
    GQuery("er_link_at",
      (s, d) => {
        val cust = Tables(s, d, "customer").filter(col("c_nationkey") < 3)
        val idx = graft.util.TempFixtures.dir(s"erlinkat:$d") { p =>
          writeVariantIndex(cust.filter(col("c_custkey") % 2 === 0),
            "c_custkey", "c_name", "c_nationkey", p)
          // convert publishes v1 (flat content), rebuild v2 (fresh base)
          rebuildVariantIndex(s, p)
          appendToVariantIndex(s, p,
            cust.filter(col("c_custkey") % 2 === 1),
            "c_custkey", "c_name", "c_nationkey",
            ingestTag = "b0") // v3: [base, b0]
        }
        val pck = (pmod(conv(substring(md5(
            concat(lit("crm:"), col("c_custkey").cast("string"))),
            1, 8), 16, 10).cast("long"),
          length(col("c_name")).cast("long")) + 1).cast("int")
        val crm = cust.select(
          (col("c_custkey") + 1000000L).as("crm_id"),
          concat(col("c_name").substr(lit(1), pck - 1),
            col("c_name").substr(pck + 1, length(col("c_name"))))
            .as("crm_name"),
          col("c_nationkey").as("crm_nation"))
        linkAgainstIndexAt(s, idx, version = 2L, crm,
            "crm_id", "crm_name", "crm_nation", maxDist = 1)
          .orderBy(col("i"), col("j"))
      },
      Some {
        val hex32 = LlmShared.duckHex32("'crm:' || id")
        s"""WITH recs AS (
            SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk
            FROM customer WHERE c_nationkey < 3),
          pos AS (SELECT id, nm, blk,
            $hex32 % len(nm) + 1 AS p FROM recs),
          crm AS (SELECT id + 1000000 AS id, blk,
            nm[1:CAST(p - 1 AS INT)] || nm[CAST(p + 1 AS INT):] AS nm
            FROM pos)
          SELECT a.id AS i, b.id AS j,
            CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
          FROM recs a JOIN crm b ON a.blk = b.blk
          WHERE a.id % 2 = 0 AND levenshtein(a.nm, b.nm) <= 1
          ORDER BY i, j"""
      }),

    // RTBF for the variant index — the oracle is rebuild-without-ids:
    // surviving records' variant COUNTS (the stored v is xxhash64 and
    // not SQL-replayable, but one index row per distinct variant means
    // the per-record row count equals the deletion-neighborhood size,
    // which DuckDB recomputes closed-form). Survivors' rows are
    // untouched by construction — a record only ever contributed its
    // own variants. Build→forget memoized (one-shot mutation).
    GQuery("forget_variant_index",
      (s, d) => {
        val idx = graft.util.TempFixtures.dir(s"erforget:$d") { p =>
          val cust = Tables(s, d, "customer")
            .filter(col("c_nationkey") < 3)
          writeVariantIndex(cust, "c_custkey", "c_name", "c_nationkey", p)
          val ids = cust.filter(col("c_custkey") % 20 === 0)
            .select("c_custkey").collect().map(_.getLong(0)).toSeq
          // round-10: the reader-isolated path (victim-filtered fenced
          // rebuild). The oracle is unchanged: stored rows are
          // per-record facts and the build is uncapped, so in-place and
          // via-rebuild deletions coincide row-for-row.
          val removed = Forget.fromVariantIndexViaRebuild(s, p, ids)
          require(removed > 0L, "forget removed nothing — bad fixture")
        }
        val dir = graft.sources.IndexLifecycle.resolveDir(s, idx)
        s.read.parquet(dir)
          .groupBy(col("id"), col("nm"), col("blk"))
          .agg(count(lit(1)).as("n_variants"))
          .orderBy(col("id"))
      },
      Some("""WITH recs AS (
          SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk
          FROM customer WHERE c_nationkey < 3),
        d1 AS (SELECT id, nm, blk, list_distinct(list_append(
            list_transform(range(1, len(nm) + 1),
              i -> nm[1:CAST(i - 1 AS INT)] || nm[CAST(i + 1 AS INT):]),
            nm)) AS vs
          FROM recs)
        SELECT id, nm, blk, CAST(len(vs) AS BIGINT) AS n_variants
        FROM d1 WHERE id % 20 <> 0 ORDER BY id""")),

    GQuery("er_entities",
      (s, d) => entities(Tables(s, d, "customer"),
          "c_custkey", "c_name", "c_nationkey")
        .orderBy(col("doc_id")),
      Some("""WITH RECURSIVE e0 AS (
          SELECT a.c_custkey AS i, b.c_custkey AS j
          FROM customer a JOIN customer b
            ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
          WHERE levenshtein(a.c_name, b.c_name) <= 1),
        e AS (SELECT i AS a, j AS b FROM e0 UNION SELECT j, i FROM e0),
        reach(node, r) AS (
          SELECT a, b FROM e
          UNION
          SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a)
        SELECT node AS doc_id, least(node, min(r)) AS cluster,
               CAST(least(node, min(r)) = node AS INT) AS keep
        FROM reach GROUP BY node ORDER BY doc_id"""))
  )
}
