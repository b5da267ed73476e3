package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, PpmImage}
import graft.util.Tables

/** Perceptual image dedup: the dHash kernel's invariances and the
  * banded pair join's planted-duplicate recovery.
  */
class PhashSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  test("dhash56: codec round-trip stable, brightness-invariant, localized edit flips ≤2 bits") {
    val img = PpmImage.synthesize(42L)
    assert(Multimodal.dhash56(img) ==
      Multimodal.dhash56(PpmImage.decode(PpmImage.encode(img))),
      "encode/decode round-trip must not move the hash")
    // uniform brightness shift with no mod-256 wrap: every gradient
    // comparison — hence the hash — is unchanged (the robustness that
    // makes gradient hashes perceptual rather than exact)
    val w = 9; val h = 9
    val px = Array.tabulate(w * h * 3)(i => ((i * 37) % 200).toByte)
    val base = PpmImage.Image(w, h, px)
    val shifted = PpmImage.Image(w, h,
      px.map(b => ((b & 0xff) + 8).toByte))
    assert(Multimodal.dhash56(base) == Multimodal.dhash56(shifted))
    // blasting ONE sampled pixel can flip at most the two gradients
    // adjacent to its grid cell
    val edited = px.clone()
    val sx = 2 * w / 8; val sy = 3 * h / 8
    val i0 = (sy * w + sx) * 3
    edited(i0) = 255.toByte; edited(i0 + 1) = 255.toByte
    edited(i0 + 2) = 255.toByte
    val d = java.lang.Long.bitCount(
      Multimodal.dhash56(base) ^ Multimodal.dhash56(PpmImage.Image(w, h, edited)))
    assert(d <= 2, s"one-pixel edit moved $d bits")
  }

  test("phashPairs: planted exact and near duplicates recovered within the distance bound") {
    val docs = Tables(spark, sfDir, "documents")
    val pairs = Multimodal.phashPairs(
        Multimodal.asPhashImageTable(docs), maxDist = 3)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect()
    val ids = docs.select("doc_id").as[Long].collect().toSet
    val bases = ids.filter(_ % 10 == 0)
    bases.filter(b => ids(b + 7)).foreach { b =>
      assert(pairs.exists(p => p._1 == b && p._2 == b + 7 && p._3 == 0),
        s"exact copy pair ($b, ${b + 7}) at distance 0")
    }
    bases.filter(b => ids(b + 8)).foreach { b =>
      assert(pairs.exists(p => p._1 == b && p._2 == b + 8 && p._3 <= 2),
        s"one-pixel-edit pair ($b, ${b + 8}) within distance 2")
    }
    assert(pairs.forall(p => p._3 <= 3 && p._1 < p._2),
      "every pair verified within maxDist, canonical order")
  }

  test("persisted phash index: layout, bucket pruning, planted dups probed, replayed append is idempotent") {
    val docs = Tables(spark, sfDir, "documents")
    val imgs = Multimodal.asPhashImageTable(docs)
    val isPlanted = col("doc_id") % 10 === 7 || col("doc_id") % 10 === 8
    val idx = java.nio.file.Files
      .createTempDirectory("graft_phidx").toString + "/index"
    Multimodal.writePhashIndex(imgs.filter(!isPlanted), idx, nBuckets = 64)
    def ls(p: String): Set[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(p))
        .iterator.asScala.map(_.getFileName.toString).toSet
    }
    assert(ls(idx).contains("ingest=base"), s"layout: ${ls(idx)}")
    assert(ls(s"$idx/ingest=base").exists(_.startsWith("bucket=")))
    val probed = Multimodal.phashAgainstIndex(spark, idx,
      imgs.filter(isPlanted), maxDist = 3)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      ".*PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"no bucket partition filter in plan:\n$plan")
    val got = probed.select("i", "j", "dist")
      .as[(Long, Long, Int)].collect()
    val ids = docs.select("doc_id").as[Long].collect().toSet
    ids.filter(b => b % 10 == 0 && ids(b + 7)).foreach { b =>
      assert(got.exists(p => p._1 == b && p._2 == b + 7 && p._3 == 0),
        s"probe must find exact copy ($b, ${b + 7})")
    }
    ids.filter(b => b % 10 == 0 && ids(b + 8)).foreach { b =>
      assert(got.exists(p => p._1 == b && p._2 == b + 8 && p._3 <= 2),
        s"probe must find one-pixel edit ($b, ${b + 8})")
    }
    // append then REPLAY the same (batch, tag): dynamic overwrite must
    // leave the index byte-identical, and the next probe must see the
    // appended segment
    val batch = imgs.filter(col("doc_id") % 10 === 7)
    Multimodal.appendToPhashIndex(spark, idx, batch, "b0")
    val once = spark.read.parquet(idx)
      .select("id", "h", "b", "v", "ingest", "bucket")
      .collect().map(_.toString).sorted
    Multimodal.appendToPhashIndex(spark, idx, batch, "b0")
    val twice = spark.read.parquet(idx)
      .select("id", "h", "b", "v", "ingest", "bucket")
      .collect().map(_.toString).sorted
    assert(once.toSeq == twice.toSeq, "replayed append must be a no-op")
    // the replayed TRIGGER's probe: excluding the batch's own ingest
    // segment must reproduce the pre-append result exactly — no
    // self-pairs, no intra-batch matches (the crash-after-append,
    // before-checkpoint-commit window the streaming loops close)
    val replay = Multimodal.phashAgainstIndex(spark, idx, batch,
        maxDist = 3, excludeIngest = Some("b0"))
      .select("i", "j", "dist").as[(Long, Long, Int)].collect().toSet
    assert(replay == got.filter(p => p._2 % 10 == 7).toSet,
      "excluded-segment probe must equal the pre-append probe")
    val after = Multimodal.phashAgainstIndex(spark, idx,
        imgs.filter(col("doc_id") % 10 === 8), maxDist = 3)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect()
    ids.filter(b => b % 10 == 0 && ids(b + 7) && ids(b + 8)).foreach { b =>
      assert(after.exists(p => p._1 == b + 7 && p._2 == b + 8 && p._3 <= 2),
        s"probe after append must match the appended segment (${b + 7}, ${b + 8})")
    }
    // segment-merge rebuild: ingest tree collapses to base, content is
    // the distinct union, probes unchanged. The rebuild converts the
    // index to the CAS-versioned generational layout, so post-rebuild
    // raw reads must target the resolved version dir.
    val preRows = spark.read.parquet(idx)
      .select("id", "h", "b", "v").distinct()
      .collect().map(_.toString).toSet
    Multimodal.rebuildPhashIndex(spark, idx)
    val cur = graft.sources.IndexLifecycle.resolveDir(spark, idx)
    assert(cur != idx, "rebuild must leave a generational index")
    assert(ls(cur).filter(_.startsWith("ingest=")) == Set("ingest=base"),
      s"segments must collapse: ${ls(cur)}")
    val postRows = spark.read.parquet(cur)
      .select("id", "h", "b", "v").collect().map(_.toString).toSet
    assert(postRows == preRows, "rebuild preserves the distinct band rows")
    // no nBuckets retune: the rebuild re-persists the BUILD's layout
    // (the params doctrine), so probes keep using the build's bucketing
    val reprobe = Multimodal.phashAgainstIndex(spark, idx,
        imgs.filter(col("doc_id") % 10 === 8), maxDist = 3)
      .select("i", "j", "dist").as[(Long, Long, Int)].collect()
    assert(reprobe.toSet == after.toSet, "probe identical after rebuild")
    // the rebuild ABSORBED ingest=b0 into base, so a replayed trigger's
    // excludeIngest can no longer skip the batch by segment — the
    // id-level closure must still reproduce the pre-append probe (the
    // crash-after-append + concurrent-rebuild window)
    val replayAbsorbed = Multimodal.phashAgainstIndex(spark, idx, batch,
        maxDist = 3, excludeIngest = Some("b0"))
      .select("i", "j", "dist").as[(Long, Long, Int)].collect().toSet
    assert(replayAbsorbed == got.filter(p => p._2 % 10 == 7).toSet,
      "absorbed-segment replay must still exclude the batch's own rows")
  }

  test("phash index forget: ids gone, survivors byte-identical, idempotent, probe-blind") {
    import graft.ops.Forget
    val docs = Tables(spark, sfDir, "documents")
    val imgs = Multimodal.asPhashImageTable(docs)
    val isPlanted = col("doc_id") % 10 === 7 || col("doc_id") % 10 === 8
    val idx = java.nio.file.Files
      .createTempDirectory("graft_phfgt").toString + "/index"
    Multimodal.writePhashIndex(imgs.filter(!isPlanted), idx, nBuckets = 16)
    val before = spark.read.parquet(idx)
      .select("id", "h", "b", "v").collect().map(_.toString).toSet
    val gone = docs.filter(col("doc_id") % 20 === 0)
      .select("doc_id").as[Long].collect().toSeq
    val removed = Forget.fromPhashIndex(spark, idx, gone)
    assert(removed == gone.length * 4L, "every band row of every id")
    val after = spark.read.parquet(idx)
      .select("id", "h", "b", "v").collect().map(_.toString).toSet
    assert(!after.exists(r => gone.exists(g => r.startsWith(s"[$g,"))),
      "forgotten ids gone")
    assert(after == before.filterNot(r =>
      gone.exists(g => r.startsWith(s"[$g,"))),
      "survivors byte-identical — forget touches nothing else")
    assert(Forget.fromPhashIndex(spark, idx, gone) == 0L, "idempotent")
    // probe blindness: a forgotten image's exact twin (its planted %10==7
    // copy) must no longer match the forgotten original
    val probe = Multimodal.phashAgainstIndex(spark, idx,
        imgs.filter(col("doc_id") % 10 === 7), maxDist = 3,
        nBuckets = 16)
      .select("i").as[Long].collect().toSet
    assert(gone.forall(g => !probe.contains(g)),
      "no probe may surface a forgotten id")
  }

  test("phashPairs hot-bucket cap: capped output is a strict subset on the low-entropy corpus") {
    val imgs = Multimodal.asPhashImageTable(Tables(spark, sfDir, "documents"))
    val full = Multimodal.phashPairs(imgs, maxDist = 3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val capped = Multimodal.phashPairs(imgs, maxDist = 3, maxBucket = 20)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(full), "capping can only REMOVE pairs")
    // this synthetic corpus is exactly the low-entropy regime the cap
    // exists for: near-uniform gradients park whole cohorts in one
    // bucket, so the cap must actually bite here
    assert(capped.size < full.size)
  }
}
