package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2B north-star ops): media
  * payloads as opaque BINARY columns with typed metadata, plus
  * decode / feature-extract / resize / resample / frame-sample stages.
  *
  * Two tiers of kernels share identical Spark-side plumbing (binary
  * columns, partition-wise `mapPartitions` batching — the Scala analogue
  * of arrow-batched UDF execution — and posexplode frame expansion):
  *  - REAL codecs for formats decodable with the JDK alone: PPM images
  *    ([[PpmImage]] — pixel decode, nearest-neighbor resize), baseline
  *    JPEG ([[JpegImage]] — the JDK's javax.imageio encoder/decoder;
  *    lossy, so dims are hash-oracled and pixel stats tolerance-spec'd),
  *    PNG ([[PngImage]] — same javax.imageio path but LOSSLESS, so the
  *    full decode/resize family is pixel-exact hash-oracled), animated
  *    GIF video ([[GifVideo]] — real container, pixel-exact frames),
  *    G.711 μ-law ([[MuLawAudio]]) and PCM16 WAV audio ([[WavAudio]] —
  *    sample decode, decimating resample); PPM/PNG/GIF/WAV are
  *    oracle-checked pixel/sample-exact;
  *  - ONE clearly-marked deterministic STUB where a codec needs native
  *    libraries this environment does not ship (MP3 — no pure-JVM
  *    decoder is obtainable offline) — swapping the stub for a real
  *    codec changes no plumbing, as the five real codecs demonstrate.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           checksum: Long, features: Array[Float])

  /** Wrap a text table as a media table: payload = utf-8 bytes. Stands in
    * for reading real image/audio blobs from parquet binary columns.
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode kernel: deterministic pseudo-features from the payload
    * bytes. A real implementation would decode pixels/samples here; the
    * signature (bytes in, fixed-width float features out) is the real
    * contract.
    */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-wise feature extraction: one kernel invocation per row,
    * batched per partition (no per-row task overhead; this is where an
    * arrow/pandas batch boundary would sit in PySpark).
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[MediaFeatures]
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        var crc = 0L
        var i = 0
        while (i < r.payload.length) { crc = crc * 31 + (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, r.mime, r.payload.length, crc,
          stubDecode(r.payload, dim))
      }
    }.toDF()
  }

  case class ResizedRow(doc_id: Long, mime: String, n_bytes: Int,
                        resized: Array[Byte])

  /** STUB resize kernel: deterministic stride-downsample of the payload
    * to ≤ `target` bytes (a real implementation would rescale pixels /
    * resample audio here — the contract is bytes-in, smaller-bytes-out,
    * batched per partition like [[extractFeatures]]).
    */
  def resize(media: DataFrame, target: Int): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ResizedRow]
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val out =
          if (n <= target) r.payload
          else {
            val stride = math.ceil(n.toDouble / target).toInt
            val res = new Array[Byte]((n + stride - 1) / stride)
            var i = 0
            while (i < res.length) { res(i) = r.payload(i * stride); i += 1 }
            res
          }
        ResizedRow(r.doc_id, r.mime, n, out)
      }
    }.toDF()
  }

  // ----- REAL image path (pure-JVM PPM codec, no native libs) ---------

  case class ImageStats(doc_id: Long, width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic image table: one synthetic P6 payload per document id
    * (PpmImage.synthesize — dimensions and pixels closed-form in doc_id,
    * so the DuckDB oracle regenerates them). Stands in for a parquet
    * binary column of real images.
    */
  def asImageTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRow(id, "image/x-portable-pixmap",
          PpmImage.encode(PpmImage.synthesize(id)))
      }
    }.toDF()
  }

  /** Image table with PLANTED perceptual duplicates for [[phashPairs]]:
    * id%10==7 carries an exact pixel copy of id−7's image; id%10==8
    * carries id−8's image with the source pixel that grid cell (2, 3)
    * samples blasted to white — a localized edit that flips at most the
    * two gradients adjacent to that cell (a crop/watermark stand-in).
    * Everything stays closed-form in doc_id, so the DuckDB oracle
    * regenerates pixels, hashes, bands and pairs exactly.
    */
  def asPhashImageTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val eid = if (id % 10 == 7) id - 7
                  else if (id % 10 == 8) id - 8 else id
        val img = PpmImage.synthesize(eid)
        if (id % 10 == 8) {
          val px = (2 * img.width) / 8
          val py = (3 * img.height) / 8
          val i = (py * img.width + px) * 3
          img.pixels(i) = 255.toByte
          img.pixels(i + 1) = 255.toByte
          img.pixels(i + 2) = 255.toByte
        }
        MediaRow(id, "image/x-portable-pixmap", PpmImage.encode(img))
      }
    }.toDF()
  }

  /** 56-bit difference hash (dHash) of one image: nearest-neighbor
    * downsample to an 8×8 grid (the [[PpmImage.resize]] sampling
    * formula: sx = x·w/8, sy = y·h/8, integer division), per-cell gray =
    * r+g+b (a monotone scale — gradient COMPARISONS are what the hash
    * keeps, so the /3 is dead weight), bit (y·7+x) = gray(x,y) <
    * gray(x+1,y) for x in 0..6 — 56 bits keeps the BIGINT positive on
    * both engines (bit 63 would not). Brightness shifts that don't wrap
    * mod 256 leave every gradient — hence the hash — untouched; that
    * robustness-to-global-edits is why perceptual dedup uses gradients
    * rather than pixel hashes.
    */
  def dhash56(img: PpmImage.Image): Long = {
    val g = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = y * img.height / 8
      var x = 0
      while (x < 8) {
        val sx = x * img.width / 8
        val i = (sy * img.width + sx) * 3
        g(y * 8 + x) = (img.pixels(i) & 0xff) + (img.pixels(i + 1) & 0xff) +
          (img.pixels(i + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    var h = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (g(y * 8 + x) < g(y * 8 + x + 1))
          h |= 1L << (y * 7 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** (id, h) dHash frame of an image table — map-only decode + hash. */
  def phashHashes(images: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val hashEnc = Encoders.product[(Long, Long)]
    images.as[MediaRow]
      .mapPartitions(it => it.map(r =>
        (r.doc_id, dhash56(PpmImage.decode(r.payload)))))
      .toDF("id", "h")
  }

  /** Explode (id, h) into per-band rows (id, h, b, v): the 56 bits
    * split into maxDist+1 bands — two hashes within the distance MUST
    * share a whole band (pigeonhole).
    */
  private[ops] def phashBandsOf(hashes: DataFrame, maxDist: Int): DataFrame = {
    val nBands = maxDist + 1
    val bandBits = 56 / nBands
    val mask = (1L << bandBits) - 1
    hashes.select(col("id"), col("h"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("h"), b * bandBits).bitwiseAND(lit(mask))
            .as("v"))): _*)).as("bk"))
      .select(col("id"), col("h"), col("bk.b").as("b"), col("bk.v").as("v"))
  }

  /** Perceptual near-duplicate image pairs: dHash per image (map-only
    * decode + hash), then hamming ≤ `maxDist` pairs via the pigeonhole
    * band join — the hash's 56 bits split into `maxDist + 1` bands, two
    * hashes within the distance MUST agree on at least one whole band,
    * so candidates come from an equi-join on (band, value) and the
    * popcount verify touches candidates only. NEVER all-pairs: the
    * image-side twin of simhashPairs, which is exactly how LAION-scale
    * image dedup buckets. Output (i, j, dist), i < j.
    *
    * `maxBucket` is the hot-bucket skew guard (the shingle df-cap story
    * on band values): a (band, value) bucket holding more than
    * `maxBucket` images is dropped from candidate generation BEFORE the
    * self-join — low-entropy corpora (near-uniform gradients, blank
    * frames) can park large fractions of the corpus in one bucket and
    * re-create the quadratic join the banding exists to avoid. Capping
    * trades recall bounded-ly: a pair is lost only if EVERY band it
    * agrees on is hot. The oracle-checked query leaves it unset (the
    * synthetic corpus is exactly such a low-entropy case and the exact
    * pair set is the point there).
    */
  def phashPairs(images: DataFrame, maxDist: Int = 3,
                 maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 0 && maxDist < 56, s"maxDist in [0, 56): $maxDist")
    // the decode+hash kernel feeds both self-join sides (and the hot
    // aggregate when capped) — own the persist so each payload is
    // decoded once per run, not 2-3× (the simhashPairs discipline)
    val bands = graft.util.Caches.own(
      phashBandsOf(phashHashes(images), maxDist))
    val pruned =
      if (maxBucket == Int.MaxValue) bands
      else {
        // partial-agg'd bucket sizes — the hot set is tiny metadata and
        // the anti-join drops hot buckets before any fan-out
        val hot = bands.groupBy("b", "v")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucket)
          .select("b", "v")
        bands.join(hot, Seq("b", "v"), "left_anti")
      }
    // verify-then-distinct (r17): dist is a pure function of the pair,
    // so the hamming filter commutes with the candidate dedup — and the
    // filter drops the (on low-entropy corpora, vastly) larger share of
    // candidate rows BEFORE the distinct's exchange instead of after it
    // (guide §2.3, shuffle fewer bytes). bit_count is one codegen'd
    // instruction per candidate row; re-evaluating it on band-duplicate
    // candidates costs nothing next to shuffling them.
    pruned.as("a").join(pruned.as("b"),
        col("a.b") === col("b.b") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  // ----- persisted perceptual-hash index (the image-side lifecycle:
  //       the shingle/cell/IVF index doctrine applied to dHash bands) --

  // xxhash64 mixes both fields: the arithmetic (b·2¹⁴ + v) mod 2^k
  // form degenerated to v mod 2^k for the power-of-two bucket counts
  // actually used, letting correlated low hash bits skew partitions
  private def phashBucket(nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("b"), col("v")), lit(nBuckets.toLong)).cast("int")

  private def phashParamsSidecar(indexPath: String) =
    s"$indexPath/_graft_phash_params"

  private def writePhashParams(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, maxDist: Int,
                               nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((maxDist, nBuckets)).toDF("max_dist", "n_buckets")
      .coalesce(1).write.mode("overwrite")
      .parquet(phashParamsSidecar(indexPath))
  }

  /** The banding and bucketing constants are INDEX CONTRACT: a probe
    * or append run with different values silently prunes the wrong
    * partitions or joins incompatible band spaces. The sidecar makes
    * the build-time values authoritative — every later operation
    * validates against it and fails loudly on a mismatch.
    */
  private def requirePhashParams(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, maxDist: Int,
                                 nBuckets: Int): Unit = {
    val r = spark.read.parquet(phashParamsSidecar(indexPath)).head()
    val (md, nb) = (r.getInt(0), r.getInt(1))
    require(md == maxDist && nb == nBuckets,
      s"phash index at $indexPath was built with maxDist=$md, " +
        s"nBuckets=$nb — caller passed maxDist=$maxDist, " +
        s"nBuckets=$nBuckets; mismatched banding/bucketing would " +
        "silently lose candidates")
  }

  /** Persist the corpus's dHash band rows, directory-partitioned
    * `ingest=<tag>/bucket=<k>` — the shingle-index layout for images:
    * `ingest=base` is the offline build, appended batches own their
    * tag (dynamic overwrite ⇒ at-least-once replay is idempotent), and
    * probes push their touched buckets as a partition filter so
    * unprobed directories are never listed or read. The banding
    * (maxDist) is part of the index contract: probe with the same
    * value, as `n` is for the shingle index.
    */
  def writePhashIndex(images: DataFrame, indexPath: String,
                      maxDist: Int = 3, nBuckets: Int = 64): Unit = {
    phashBandsOf(phashHashes(images), maxDist)
      .withColumn("bucket", phashBucket(nBuckets))
      .withColumn("ingest", lit("base"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("ingest", "bucket")
      .parquet(indexPath)
    writePhashParams(images.sparkSession, indexPath, maxDist, nBuckets)
  }

  /** Write an ingested batch's band rows under `ingest=<ingestTag>` —
    * the probe-then-append loop's write half, same replay contract as
    * [[graft.ops.Dedup.appendToShingleIndex]]: a replayed (batch, tag)
    * overwrites its own partitions instead of duplicating band rows
    * (duplicates would surface the same candidate twice — distinct()
    * hides that in pair output, but index bloat is real).
    */
  def appendToPhashIndex(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, batch: DataFrame,
                         ingestTag: String, maxDist: Int = 3,
                         nBuckets: Int = 64): Unit =
    graft.sources.IndexLifecycle.appendSegment(spark, indexPath, ingestTag) {
      (dir, tmp) =>
        // banding contract validated against the dir being appended to
        // (a racing rebuild may have changed nBuckets — the re-seal
        // must fail loudly rather than bucket into the wrong layout)
        requirePhashParams(spark, dir, maxDist, nBuckets)
        phashBandsOf(phashHashes(batch), maxDist)
          .withColumn("bucket", phashBucket(nBuckets))
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    }

  /** Segment-merge rebuild for the phash index — identical contract to
    * [[graft.ops.SemDedup.rebuildCellIndex]]: re-absorb every `ingest`
    * segment into a fresh `ingest=base` build behind
    * [[graft.sources.IndexLifecycle]]'s CAS-versioned publish (crash
    * mid-rebuild leaves the old version serving; concurrent appends
    * fence the commit). Band rows are pure functions of the stored
    * hashes, so the rebuild never re-decodes an image; distinct()
    * collapses the same image appended under different tags. Banding
    * (maxDist) is immutable across rebuilds; nBuckets may change
    * (pure layout), so the refreshed sidecar rides inside the new
    * version dir through the publish.
    */
  def rebuildPhashIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String,
                        orphanGraceMs: Long =
                          graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                        readerGraceMs: Long = 0L): Unit =
    graft.sources.IndexLifecycle.rebuild(spark, indexPath,
      orphanGraceMs, readerGraceMs)(phashRebuildClosure(spark))

  /** [[graft.sources.IndexLifecycle.maybeRebuild]] with this family's
    * build body; every param comes from the index's own sidecar. Pass
    * the same `readerGraceMs` discipline as your explicit rebuilds.
    * Returns true iff a rebuild ran.
    */
  def maybeRebuildPhashIndex(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String, maxSegments: Int,
                             orphanGraceMs: Long =
                               graft.sources.IndexLifecycle.DefaultOrphanGraceMs,
                             readerGraceMs: Long = 0L): Boolean =
    graft.sources.IndexLifecycle.maybeRebuild(spark, indexPath,
      maxSegments, orphanGraceMs, readerGraceMs)(phashRebuildClosure(spark))

  /** Build body shared with [[Forget.fromPhashIndexViaRebuild]]. */
  private[graft] def phashRebuildClosure(
      spark: org.apache.spark.sql.SparkSession)
      : (DataFrame, String, String) => Unit =
    (src, srcDir, dst) => {
      // both params come from the SOURCE dir's sidecar — rebuild call
      // sites can no longer silently retune banding or layout
      // (writePhashIndex is the retune path)
      val pr = spark.read.parquet(phashParamsSidecar(srcDir)).head()
      val (maxDist, nBuckets) =
        (pr.getAs[Int]("max_dist"), pr.getAs[Int]("n_buckets"))
      src.select(col("id"), col("h"), col("b"), col("v"))
        .distinct()
        .withColumn("bucket", phashBucket(nBuckets))
        .withColumn("ingest", lit("base"))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("ingest", "bucket")
        .parquet(dst)
      writePhashParams(spark, dst, maxDist, nBuckets)
    }

  /** Perceptual near-dups of a NEW image batch against a PERSISTED
    * index: batch hashed live, its touched buckets collected
    * driver-side (≤ nBuckets ints — bounded metadata, the IVF-probe
    * pattern) and pushed as a static partition filter, candidates from
    * the (band, value) equi-join across ALL ingest segments, popcount
    * verify on candidates only. Output (i = index id, j = batch id,
    * dist).
    */
  def phashAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, batch: DataFrame,
                        maxDist: Int = 3, nBuckets: Int = 64,
                        excludeIngest: Option[String] = None): DataFrame =
    phashProbe(spark,
      graft.sources.IndexLifecycle.resolveDir(spark, indexPath),
      segments = None, batch, maxDist, nBuckets, excludeIngest)

  /** [[phashAgainstIndex]] PINNED to a retained manifest version — the
    * reproducible-export read for the image-canon family (the same
    * contract as [[graft.ops.Dedup.jaccardAgainstIndexAt]] /
    * [[graft.ops.Search.bm25AgainstIndexAt]]): version `v`'s data dir
    * restricted to the segment set its marker recorded. Fails loudly
    * outside the retention window; forgotten rows stay forgotten.
    */
  def phashAgainstIndexAt(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, version: Long,
                          batch: DataFrame, maxDist: Int = 3,
                          nBuckets: Int = 64): DataFrame = {
    import org.apache.hadoop.fs.Path
    val m = graft.sources.IndexLifecycle.manifestAt(spark, indexPath, version)
    phashProbe(spark, new Path(new Path(indexPath), m.dir).toString,
      segments = Some(m.segments), batch, maxDist, nBuckets,
      excludeIngest = None)
  }

  private def phashProbe(spark: org.apache.spark.sql.SparkSession,
                         dir: String, segments: Option[Seq[String]],
                         batch: DataFrame, maxDist: Int, nBuckets: Int,
                         excludeIngest: Option[String]): DataFrame = {
    requirePhashParams(spark, dir, maxDist, nBuckets)
    // the batch kernel feeds the touched-bucket collect AND the join —
    // own the persist so each payload is decoded once
    val bb = graft.util.Caches.own(
      phashBandsOf(phashHashes(batch), maxDist)
        .withColumn("bucket", phashBucket(nBuckets)))
    val touched = bb.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    // excludeIngest: the streaming loop skips its OWN batch tag so a
    // replayed trigger (crash after append, before checkpoint commit)
    // does not match the batch against its previously-appended self.
    // Segment filter = cheap prune; the id anti-join is the correctness
    // closure for a rebuild absorbing the replayed tag into base (see
    // Dedup.jaccardAgainstIndex)
    val corpusAll = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched: _*))
    val corpus0 = segments.fold(corpusAll)(segs =>
      corpusAll.filter(col("ingest").isin(segs: _*)))
    val corpus = excludeIngest.fold(corpus0) { t =>
        corpus0.filter(col("ingest") =!= lit(t))
          .join(bb.select("id").distinct(), Seq("id"), "left_anti")
      }
      .select(col("id").as("jid"), col("h").as("jh"),
        col("b").as("jb"), col("v").as("jv"))
    bb.join(corpus, col("b") === col("jb") && col("v") === col("jv"))
      .select(col("jid").as("i"), col("id").as("j"),
        bit_count(col("jh").bitwiseXOR(col("h"))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** REAL decode kernel: parse the P6 header and pixel buffer, emit
    * dimensions + per-channel means — actual pixel-space work, batched
    * per partition like [[extractFeatures]].
    */
  def decodeImages(images: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ImageStats]
    images.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val img = PpmImage.decode(r.payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sr += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sb += img.pixels(i + 2) & 0xff
          i += 3
        }
        val n = (img.width * img.height).toDouble
        ImageStats(r.doc_id, img.width, img.height, sr / n, sg / n, sb / n)
      }
    }.toDF()
  }

  /** REAL resize kernel: decode → nearest-neighbor pixel resample →
    * re-encode. Output is a valid P6 payload at (w2, h2).
    */
  def resizeImages(images: DataFrame, w2: Int, h2: Int): DataFrame = {
    implicit val rowEnc = Encoders.product[MediaRow]
    images.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaRow(r.doc_id, r.mime,
          PpmImage.encode(PpmImage.resize(PpmImage.decode(r.payload), w2, h2)))
      }
    }.toDF()
  }

  // ----- REAL JPEG path (JDK javax.imageio — no native install) --------

  /** Deterministic JPEG table: the SAME synthetic pattern as the PPM
    * path, encoded through the JDK's baseline JPEG writer at quality
    * 1.0 — real lossy compression over real pixels.
    */
  def asJpegTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRow(id, "image/jpeg", JpegImage.encode(PpmImage.synthesize(id)))
      }
    }.toDF()
  }

  /** REAL JPEG decode kernel: inverse-DCT the payload back to pixels,
    * emit dimensions + per-channel means. Identical plumbing to
    * [[decodeImages]]; only the codec differs.
    */
  def decodeJpeg(images: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ImageStats]
    images.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val img = JpegImage.decode(r.payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sr += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sb += img.pixels(i + 2) & 0xff
          i += 3
        }
        val n = (img.width * img.height).toDouble
        ImageStats(r.doc_id, img.width, img.height, sr / n, sg / n, sb / n)
      }
    }.toDF()
  }

  /** REAL JPEG resize kernel: decode → nearest-neighbor resample (the
    * same pixel-space [[PpmImage.resize]] the PPM path uses) →
    * re-encode as JPEG.
    */
  def resizeJpeg(images: DataFrame, w2: Int, h2: Int): DataFrame = {
    implicit val rowEnc = Encoders.product[MediaRow]
    images.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaRow(r.doc_id, r.mime,
          JpegImage.encode(PpmImage.resize(JpegImage.decode(r.payload), w2, h2)))
      }
    }.toDF()
  }

  // ----- REAL PNG path (JDK javax.imageio — LOSSLESS) ------------------

  /** Deterministic PNG table: the SAME synthetic pattern as the PPM and
    * JPEG paths, through the JDK's PNG writer — real deflate-compressed
    * interchange bytes, but lossless, so every pixel survives exactly.
    */
  def asPngTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRow(id, "image/png", PngImage.encode(PpmImage.synthesize(id)))
      }
    }.toDF()
  }

  /** REAL PNG decode kernel: identical plumbing to [[decodeImages]] /
    * [[decodeJpeg]]; only the codec differs — and because PNG is
    * lossless, the emitted channel means are EXACTLY the closed-form
    * synthetic values, so the full stats row is hash-oracled.
    */
  def decodePng(images: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[ImageStats]
    images.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val img = PngImage.decode(r.payload)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.pixels.length) {
          sr += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sb += img.pixels(i + 2) & 0xff
          i += 3
        }
        val n = (img.width * img.height).toDouble
        ImageStats(r.doc_id, img.width, img.height, sr / n, sg / n, sb / n)
      }
    }.toDF()
  }

  /** REAL PNG resize kernel: decode → nearest-neighbor resample (the
    * same pixel-space [[PpmImage.resize]] as every other image path) →
    * re-encode as PNG. Lossless both trips ⇒ the resized pixel stats
    * replay closed-form in the oracle, unlike the JPEG twin.
    */
  def resizePng(images: DataFrame, w2: Int, h2: Int): DataFrame = {
    implicit val rowEnc = Encoders.product[MediaRow]
    images.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaRow(r.doc_id, r.mime,
          PngImage.encode(PpmImage.resize(PngImage.decode(r.payload), w2, h2)))
      }
    }.toDF()
  }

  // ----- REAL audio path (pure-JVM RIFF/PCM16 codec) -------------------

  case class AudioStats(doc_id: Long, sample_rate: Int, n_samples: Int,
                        duration_ms: Double, mean_abs: Double)

  /** Deterministic audio table: one synthetic PCM16 WAV per document id
    * (WavAudio.synthesize — sample count and every sample closed-form in
    * doc_id, SQL-regenerable).
    */
  def asAudioTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRow(id, "audio/wav", WavAudio.encode(WavAudio.synthesize(id)))
      }
    }.toDF()
  }

  /** REAL decode kernel: parse the RIFF header and PCM buffer, emit rate
    * / length / duration / mean absolute amplitude.
    */
  def decodeAudio(audio: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[AudioStats]
    audio.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val clip = WavAudio.decode(r.payload)
        var sum = 0L
        clip.samples.foreach(s => sum += math.abs(s.toLong))
        AudioStats(r.doc_id, clip.sampleRate, clip.samples.length,
          clip.samples.length * 1000.0 / clip.sampleRate,
          sum.toDouble / clip.samples.length)
      }
    }.toDF()
  }

  case class MulawStats(doc_id: Long, sample_rate: Int, n_samples: Int,
                        mean_abs: Double, max_err: Int)

  /** Deterministic μ-law table: the synthesized PCM16 clip compressed
    * through the REAL G.711 companding into a real wFormatTag=7 WAV.
    */
  def asMulawTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRow(id, "audio/basic",
          MuLawAudio.encode(WavAudio.synthesize(id)))
      }
    }.toDF()
  }

  /** REAL lossy-codec decode: expand μ-law back to PCM16, emit sample
    * stats of the DECODED signal plus the max companding error vs the
    * regenerated source — G.711's loss is deterministic integer math,
    * so every output column is SQL-replayable exactly (unlike JPEG).
    */
  def decodeMulaw(audio: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[MulawStats]
    audio.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val clip = MuLawAudio.decode(r.payload)
        val src = WavAudio.synthesize(r.doc_id)
        var sum = 0L
        var maxErr = 0
        var i = 0
        while (i < clip.samples.length) {
          sum += math.abs(clip.samples(i).toLong)
          val e = math.abs(clip.samples(i) - src.samples(i))
          if (e > maxErr) maxErr = e
          i += 1
        }
        MulawStats(r.doc_id, clip.sampleRate, clip.samples.length,
          sum.toDouble / clip.samples.length, maxErr)
      }
    }.toDF()
  }

  /** REAL resample kernel: decode → decimate by k → re-encode. */
  def resampleAudio(audio: DataFrame, k: Int): DataFrame = {
    implicit val rowEnc = Encoders.product[MediaRow]
    audio.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaRow(r.doc_id, r.mime,
          WavAudio.encode(WavAudio.decimate(WavAudio.decode(r.payload), k)))
      }
    }.toDF()
  }

  // ----- REAL video path (animated GIF via javax.imageio) -------------

  case class VideoStats(doc_id: Long, n_frames: Int, width: Int, height: Int,
                        mean_luma: Double)
  case class FrameStats(doc_id: Long, frame_idx: Int, mean_luma: Double)

  /** Deterministic video table: one synthetic animated GIF per document
    * id ([[GifVideo.synthesize]] — frame count, dimensions and every
    * pixel closed-form in doc_id, so the DuckDB oracle regenerates
    * them; GIF is lossless, so the oracle is exact like PPM/WAV).
    */
  def asVideoTable(documents: DataFrame): DataFrame = {
    implicit val outEnc = Encoders.product[MediaRow]
    implicit val idEnc = Encoders.scalaLong
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        MediaRow(id, "image/gif", GifVideo.encode(GifVideo.synthesize(id)))
      }
    }.toDF()
  }

  /** REAL container decode: parse every GIF frame, emit frame count /
    * dimensions / whole-clip mean luma (exact integer sums).
    */
  def decodeVideo(video: DataFrame): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[VideoStats]
    video.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val clip = GifVideo.decode(r.payload)
        var s = 0L
        clip.frames.foreach { f =>
          var i = 0
          while (i < f.length) { s += f(i) & 0xff; i += 1 }
        }
        val n = clip.frames.length.toLong * clip.width * clip.height
        VideoStats(r.doc_id, clip.frames.length, clip.width, clip.height,
          s.toDouble / n)
      }
    }.toDF()
  }

  /** REAL frame sampling: decode the container, keep every `stride`-th
    * frame, one output row per sampled frame with its mean luma — the
    * video analogue of [[resampleAudio]]'s decimation.
    */
  def sampleVideoFrames(video: DataFrame, stride: Int): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRow]
    implicit val outEnc = Encoders.product[FrameStats]
    video.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        val clip = GifVideo.decode(r.payload)
        clip.frames.indices.collect {
          case f if f % stride == 0 =>
            val buf = clip.frames(f)
            var s = 0L
            var i = 0
            while (i < buf.length) { s += buf(i) & 0xff; i += 1 }
            FrameStats(r.doc_id, f, s.toDouble / buf.length)
        }
      }
    }.toDF()
  }

  /** Frame sampling: slice the payload into `n` fixed-size "frames"
    * (stand-in for video frame extraction), one output row per frame.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("frame_size",
        ceil(octet_length(col("payload")).cast("double") / n).cast("int"))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, $n - 1), i -> substring(payload, i * frame_size + 1, frame_size))"))
          .as(Seq("frame_idx", "frame")))
      .filter(octet_length(col("frame")) > 0)
}
