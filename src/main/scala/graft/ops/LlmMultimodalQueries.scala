package graft.ops

import org.apache.spark.sql.functions._

import graft.util.{GQuery, Tables}

/** Multimodal (image/audio/video) codecs and
  * perceptual image dedup incl. the persisted phash index.
  *
  * Split out of LlmQueries (round 10); all shared SQL fragments and
  * memoized fixtures live in [[LlmShared]].
  */
object LlmMultimodalQueries {

  import LlmShared._

  val queries: Seq[GQuery] = Seq(

    // REAL image decode (pure-JVM P6 codec): synthetic images whose
    // dimensions and pixels are closed-form in doc_id, decoded back to
    // per-channel means — the oracle regenerates every pixel via lateral
    // generate_series and must agree on the exact integer sums.
    GQuery("multimodal_img_decode",
      (s, d) => Multimodal.decodeImages(
          Multimodal.asImageTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          avg((7*doc_id + 3*x + 5*y) % 256) AS mean_r,
          avg((11*doc_id + x + 2*y) % 256) AS mean_g,
          avg((13*doc_id + 3*x + y) % 256) AS mean_b
        FROM px GROUP BY doc_id, w, h ORDER BY doc_id""")),

    // Perceptual image dedup (dHash + pigeonhole band join — the
    // LAION-scale image-dedup shape): planted exact copies (id%10==7)
    // and one-pixel edits (id%10==8) must pair with their originals at
    // hamming 0 / ≤2. FULLY hash-oracle-checked — the synthetic pixels
    // are closed-form, so DuckDB regenerates grid grays, the 56-bit
    // gradient hash, the 4×14-bit bands, the candidate join and the
    // popcount verify; the decode→hash kernel itself is additionally
    // pinned by PhashSpec. Never all-pairs: candidates come from the
    // (band, value) equi-join only.
    GQuery("multimodal_phash_pairs",
      (s, d) => Multimodal.phashPairs(
          Multimodal.asPhashImageTable(
            Tables.spread(Tables(s, d, "documents"))), maxDist = 3)
        .orderBy(col("i"), col("j")),
      Some(s"""$phashBandsCte,
        cand AS (
          SELECT DISTINCT a.id AS i, a.h AS hi, b.id AS j, b.h AS hj
          FROM bands a JOIN bands b
            ON a.b = b.b AND a.v = b.v AND a.id < b.id)
        SELECT i, j, CAST(bit_count(xor(hi, hj)) AS INT) AS dist
        FROM cand WHERE bit_count(xor(hi, hj)) <= 3
        ORDER BY i, j""")),

    // The image index lifecycle's probe half: corpus dHash bands
    // PERSISTED bucket-partitioned (memoized offline build, the
    // shingle-index economics for images), the planted-dup batch
    // hashed live and probed — touched buckets pushed as a partition
    // filter, candidates across all ingest segments, popcount verify.
    // Oracle replays both sides' hashes and the band join; bucketing
    // never changes results (every batch (band, value) is included).
    GQuery("multimodal_phash_incremental",
      (s, d) => {
        val imgs = Multimodal.asPhashImageTable(Tables(s, d, "documents"))
        Multimodal.phashAgainstIndex(s, phashIndexFor(s, d),
            imgs.filter(col("doc_id") % 10 === 7 ||
              col("doc_id") % 10 === 8), maxDist = 3)
          .orderBy(col("i"), col("j"))
      },
      Some(s"""$phashBandsCte,
        corp AS (SELECT * FROM bands WHERE id % 10 <> 7 AND id % 10 <> 8),
        bat AS (SELECT * FROM bands WHERE id % 10 = 7 OR id % 10 = 8),
        cand AS (
          SELECT DISTINCT c.id AS i, c.h AS hi, q.id AS j, q.h AS hj
          FROM corp c JOIN bat q ON c.b = q.b AND c.v = q.v)
        SELECT i, j, CAST(bit_count(xor(hi, hj)) AS INT) AS dist
        FROM cand WHERE bit_count(xor(hi, hj)) <= 3
        ORDER BY i, j""")),

    // Probe PINNED to a manifest version — the image-canon family's
    // reproducible-export read (same doctrine as search_bm25_at /
    // dedup_jaccard_at): the same corpus index but generational
    // (rebuild → v2 = [base]), with the planted-dup batch itself
    // appended AFTER the pin (v3). The pinned probe must see only the
    // pre-append corpus; a listing-based read would match every batch
    // image against its own appended copy at hamming 0 and
    // hash-mismatch. Oracle = the incremental replay, identical by
    // construction.
    GQuery("multimodal_phash_at",
      (s, d) => {
        val imgs = Multimodal.asPhashImageTable(Tables(s, d, "documents"))
        val isBatch = col("doc_id") % 10 === 7 || col("doc_id") % 10 === 8
        val idx = graft.util.TempFixtures.dir(s"phashat:$d") { p =>
          Multimodal.writePhashIndex(imgs.filter(!isBatch), p)
          Multimodal.rebuildPhashIndex(s, p) // v1 convert, v2 fresh base
          Multimodal.appendToPhashIndex(s, p, imgs.filter(isBatch),
            ingestTag = "b0") // v3: [base, b0]
        }
        Multimodal.phashAgainstIndexAt(s, idx, version = 2L,
            imgs.filter(isBatch), maxDist = 3)
          .orderBy(col("i"), col("j"))
      },
      Some(s"""$phashBandsCte,
        corp AS (SELECT * FROM bands WHERE id % 10 <> 7 AND id % 10 <> 8),
        bat AS (SELECT * FROM bands WHERE id % 10 = 7 OR id % 10 = 8),
        cand AS (
          SELECT DISTINCT c.id AS i, c.h AS hi, q.id AS j, q.h AS hj
          FROM corp c JOIN bat q ON c.b = q.b AND c.v = q.v)
        SELECT i, j, CAST(bit_count(xor(hi, hj)) AS INT) AS dist
        FROM cand WHERE bit_count(xor(hi, hj)) <= 3
        ORDER BY i, j""")),

    // REAL nearest-neighbor resize: decode → resample to 4×4 → re-encode
    // → decode again. The oracle mirrors the integer sampling formula
    // sx = x2·w/4, sy = y2·h/4 pixel for pixel.
    GQuery("multimodal_img_resize",
      (s, d) => Multimodal.decodeImages(
          Multimodal.resizeImages(
            Multimodal.asImageTable(Tables.spread(Tables(s, d, "documents"))),
            w2 = 4, h2 = 4))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, (xs.x2 * w) // 4 AS sx, (ys.y2 * h) // 4 AS sy
          FROM g,
            LATERAL (SELECT unnest(range(4)) AS x2) xs,
            LATERAL (SELECT unnest(range(4)) AS y2) ys)
        SELECT doc_id, 4 AS width, 4 AS height,
          avg((7*doc_id + 3*sx + 5*sy) % 256) AS mean_r,
          avg((11*doc_id + sx + 2*sy) % 256) AS mean_g,
          avg((13*doc_id + 3*sx + sy) % 256) AS mean_b
        FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL JPEG decode (JDK javax.imageio): the same synthetic pattern
    // as the PPM pair, pushed through actual lossy DCT compression.
    // Dimensions survive the codec exactly → full hash oracle on the
    // decode path end-to-end; pixel means are lossy (≈±1 unit at
    // quality 1.0) → tolerance-checked in JpegSpec instead, the same
    // exact-twin/approximate-op split as MinHash vs its md5 twin.
    GQuery("multimodal_jpeg_dims",
      (s, d) => Multimodal.decodeJpeg(
          Multimodal.asJpegTable(Tables.spread(Tables(s, d, "documents"))))
        .select(col("doc_id"), col("width"), col("height"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS width,
          CAST(8 + doc_id % 7 AS INT) AS height
        FROM documents ORDER BY doc_id""")),

    // Full decoded statistics of the lossy payload — engine-specific by
    // nature (the JDK's IDCT), so rows-only here; JpegSpec pins the
    // channel means to the closed-form source within ±1.5 units.
    GQuery("multimodal_jpeg_decode",
      (s, d) => Multimodal.decodeJpeg(
          Multimodal.asJpegTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      None),

    // decode → nearest-neighbor 4×4 resample (the SAME pixel-space
    // kernel as multimodal_img_resize) → JPEG re-encode → decode:
    // output dimensions are contract-exact through two lossy trips.
    GQuery("multimodal_jpeg_resize",
      (s, d) => Multimodal.decodeJpeg(
          Multimodal.resizeJpeg(
            Multimodal.asJpegTable(Tables.spread(Tables(s, d, "documents"))),
            w2 = 4, h2 = 4))
        .select(col("doc_id"), col("width"), col("height"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 4 AS width, 4 AS height
        FROM documents ORDER BY doc_id""")),

    // REAL PNG decode (JDK javax.imageio): the same synthetic pattern
    // as the PPM/JPEG pairs through real deflate compression — and
    // because PNG is LOSSLESS, the full stats row (dims AND channel
    // means) carries the pixel-exact hash oracle, unlike the JPEG twin
    // whose pixel stats are tolerance-spec'd.
    GQuery("multimodal_png_decode",
      (s, d) => Multimodal.decodePng(
          Multimodal.asPngTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
          avg((7*doc_id + 3*x + 5*y) % 256) AS mean_r,
          avg((11*doc_id + x + 2*y) % 256) AS mean_g,
          avg((13*doc_id + 3*x + y) % 256) AS mean_b
        FROM px GROUP BY doc_id, w, h ORDER BY doc_id""")),

    // decode → nearest-neighbor 4×4 resample → PNG re-encode → decode:
    // lossless both trips, so the oracle mirrors the integer sampling
    // formula pixel for pixel (the full-fidelity version of
    // multimodal_jpeg_resize's dims-only check).
    GQuery("multimodal_png_resize",
      (s, d) => Multimodal.decodePng(
          Multimodal.resizePng(
            Multimodal.asPngTable(Tables.spread(Tables(s, d, "documents"))),
            w2 = 4, h2 = 4))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, (xs.x2 * w) // 4 AS sx, (ys.y2 * h) // 4 AS sy
          FROM g,
            LATERAL (SELECT unnest(range(4)) AS x2) xs,
            LATERAL (SELECT unnest(range(4)) AS y2) ys)
        SELECT doc_id, 4 AS width, 4 AS height,
          avg((7*doc_id + 3*sx + 5*sy) % 256) AS mean_r,
          avg((11*doc_id + sx + 2*sy) % 256) AS mean_g,
          avg((13*doc_id + 3*sx + sy) % 256) AS mean_b
        FROM px GROUP BY doc_id ORDER BY doc_id""")),

    // REAL video-container decode (animated GIF via javax.imageio):
    // frame count, dimensions and whole-clip mean luma. GIF is
    // palette-based and LOSSLESS, so unlike JPEG the pixel statistics
    // get a full hash oracle — the lateral ranges regenerate every
    // (frame, x, y) pixel closed-form.
    GQuery("multimodal_video_decode",
      (s, d) => Multimodal.decodeVideo(
          Multimodal.asVideoTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 2 + doc_id % 4 AS nf, 8 + doc_id % 9 AS w,
                 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, nf, w, h, fs.f AS f, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(nf)) AS f) fs,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(nf AS INT) AS n_frames, CAST(w AS INT) AS width,
          CAST(h AS INT) AS height,
          avg((17*doc_id + 37*f + 3*x + 5*y) % 256) AS mean_luma
        FROM px GROUP BY doc_id, nf, w, h ORDER BY doc_id""")),

    // REAL frame sampling (every 2nd frame) — the video analogue of
    // the audio decimation pair; per-frame mean luma, frame-exact.
    GQuery("multimodal_video_frames",
      (s, d) => Multimodal.sampleVideoFrames(
          Multimodal.asVideoTable(Tables.spread(Tables(s, d, "documents"))),
          stride = 2)
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH g AS (
          SELECT doc_id, 2 + doc_id % 4 AS nf, 8 + doc_id % 9 AS w,
                 8 + doc_id % 7 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, fs.f AS f, xs.x AS x, ys.y AS y
          FROM g,
            LATERAL (SELECT unnest(range(0, nf, 2)) AS f) fs,
            LATERAL (SELECT unnest(range(w)) AS x) xs,
            LATERAL (SELECT unnest(range(h)) AS y) ys)
        SELECT doc_id, CAST(f AS INT) AS frame_idx,
          avg((17*doc_id + 37*f + 3*x + 5*y) % 256) AS mean_luma
        FROM px GROUP BY doc_id, f ORDER BY doc_id, f""")),

    // REAL audio decode (pure-JVM RIFF/PCM16 codec): synthetic clips
    // whose sample values are closed-form in (doc_id, i); the oracle
    // regenerates every sample and must agree on the exact integer sums.
    GQuery("multimodal_audio_decode",
      (s, d) => Multimodal.decodeAudio(
          Multimodal.asAudioTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 400 + doc_id % 200 AS n FROM documents),
        sm AS (
          SELECT doc_id, n, si.i AS i
          FROM g, LATERAL (SELECT unnest(range(n)) AS i) si)
        SELECT doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
          CAST(n AS DOUBLE) * 1000 / 8000 AS duration_ms,
          avg(abs((31*doc_id + 7*i) % 65536 - 32768)) AS mean_abs
        FROM sm GROUP BY doc_id, n ORDER BY doc_id""")),

    // REAL lossy compression with a DETERMINISTIC loss: G.711 μ-law
    // companding (the telephony codec) is pure integer arithmetic, so
    // the oracle replays the full encode→decode round trip closed-form
    // — per-sample sign/clip/bias, segment by magnitude range, 4-bit
    // mantissa, mid-step reconstruction — and must agree on the exact
    // decoded sums AND the max companding error.
    GQuery("multimodal_mulaw_roundtrip",
      (s, d) => Multimodal.decodeMulaw(
          Multimodal.asMulawTable(Tables.spread(Tables(s, d, "documents"))))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 400 + doc_id % 200 AS n FROM documents),
        sm AS (
          SELECT doc_id, n, si.i AS i,
            CAST((31*doc_id + 7*si.i) % 65536 - 32768 AS INT) AS s
          FROM g, LATERAL (SELECT unnest(range(n)) AS i) si),
        enc AS (
          SELECT doc_id, n, s,
            s < 0 AS neg,
            LEAST(CASE WHEN s < 0 THEN -s ELSE s END, 32635) + 132 AS m1
          FROM sm),
        seg AS (
          SELECT doc_id, n, s, neg, m1,
            CASE WHEN m1 >= 16384 THEN 7 WHEN m1 >= 8192 THEN 6
                 WHEN m1 >= 4096 THEN 5 WHEN m1 >= 2048 THEN 4
                 WHEN m1 >= 1024 THEN 3 WHEN m1 >= 512 THEN 2
                 WHEN m1 >= 256 THEN 1 ELSE 0 END AS e
          FROM enc),
        dec AS (
          SELECT doc_id, n, s,
            CASE WHEN neg THEN -((((m1 >> (e+3)) & 15) * 8 + 132) << e) + 132
                 ELSE ((((m1 >> (e+3)) & 15) * 8 + 132) << e) - 132 END AS d
          FROM seg)
        SELECT doc_id, 8000 AS sample_rate, CAST(n AS INT) AS n_samples,
          avg(abs(d)) AS mean_abs,
          CAST(max(abs(d - s)) AS INT) AS max_err
        FROM dec GROUP BY doc_id, n ORDER BY doc_id""")),

    // REAL decimating resample (k=4): every 4th sample survives, rate
    // drops to 2000 Hz — the oracle samples the same indices.
    GQuery("multimodal_audio_resample",
      (s, d) => Multimodal.decodeAudio(
          Multimodal.resampleAudio(
            Multimodal.asAudioTable(Tables.spread(Tables(s, d, "documents"))),
            k = 4))
        .orderBy(col("doc_id")),
      Some("""WITH g AS (
          SELECT doc_id, 400 + doc_id % 200 AS n,
                 (400 + doc_id % 200 + 3) // 4 AS n2 FROM documents),
        sm AS (
          SELECT doc_id, n2, si.i AS i
          FROM g, LATERAL (SELECT unnest(range(n2)) AS i) si)
        SELECT doc_id, 2000 AS sample_rate, CAST(n2 AS INT) AS n_samples,
          CAST(n2 AS DOUBLE) * 1000 / 2000 AS duration_ms,
          avg(abs((31*doc_id + 7*(4*i)) % 65536 - 32768)) AS mean_abs
        FROM sm GROUP BY doc_id, n2 ORDER BY doc_id""")),

    GQuery("multimodal_features",
      (s, d) => Multimodal.extractFeatures(
          Multimodal.asMediaTable(Tables.spread(Tables(s, d, "documents"))))
        .select("doc_id", "mime", "n_bytes")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, 'application/octet-stream' AS mime,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes
        FROM documents ORDER BY doc_id""")),

    // Resized length is exactly reproducible relationally: ceil(n/stride)
    // with stride = ceil(n/target) — so the oracle checks the contract
    // even though the byte content is kernel-defined.
    GQuery("multimodal_resize",
      (s, d) => Multimodal.resize(
          Multimodal.asMediaTable(Tables.spread(Tables(s, d, "documents"))),
          target = 64)
        .select(col("doc_id"), col("n_bytes"),
          octet_length(col("resized")).as("resized_bytes"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        CAST(CASE WHEN octet_length(encode(text)) <= 64 THEN octet_length(encode(text))
          ELSE ceil(octet_length(encode(text))::DOUBLE
                    / ceil(octet_length(encode(text)) / 64.0)) END AS INT) AS resized_bytes
        FROM documents ORDER BY doc_id""")),

    GQuery("multimodal_frames",
      (s, d) => Multimodal.sampleFrames(
          Multimodal.asMediaTable(Tables.spread(Tables(s, d, "documents"))), n = 8)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).as("total_bytes"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE)
          / CAST(ceil(octet_length(encode(text)) / 8.0) AS INT)) AS BIGINT) AS n_frames,
        CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
        FROM documents ORDER BY doc_id""")),

    // RTBF for the perceptual-hash index — the fourth and last index
    // family (shingle/IVF/cell/phash all now have deletion
    // propagation). Build→forget memoized per dataset dir (one-shot
    // mutation, same contract as forget_shingle_index); the oracle is
    // rebuild-without-ids over the closed-form pixel replay: survivors'
    // hashes are per-image facts, so a forget cannot move them.
    GQuery("forget_phash_index",
      (s, d) => {
        val idx = graft.util.TempFixtures.dir(s"forgetph:$d") { p =>
          val corpus = Multimodal.asPhashImageTable(
              Tables(s, d, "documents"))
            .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 8)
          Multimodal.writePhashIndex(corpus, p, nBuckets = 16)
          val ids = corpus.filter(col("doc_id") % 20 === 0)
            .select("doc_id").collect().map(_.getLong(0)).toSeq
          val removed = Forget.fromPhashIndexViaRebuild(s, p, ids)
          require(removed > 0L, "forget removed nothing — bad fixture")
        }
        s.read.parquet(graft.sources.IndexLifecycle.resolveDir(s, idx))
          .select(col("id"), col("h"), col("b"), col("v"))
          .orderBy(col("id"), col("b"))
      },
      Some(s"""$phashBandsCte
        SELECT id, h, b, v FROM bands
        WHERE id % 10 <> 7 AND id % 10 <> 8 AND id % 20 <> 0
        ORDER BY id, b"""))
  )
}
