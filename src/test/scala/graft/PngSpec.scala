package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, PngImage, PpmImage}
import graft.util.Tables

/** The PNG codec contract: a real compressed interchange format that is
  * LOSSLESS — decode(encode) must reproduce every pixel bit-for-bit,
  * which is exactly why the PNG query family carries full pixel hash
  * oracles where JPEG's carries dims-only + tolerance specs.
  */
class PngSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  test("encode is deterministic and produces a real PNG stream") {
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val img = PpmImage.synthesize(id)
      val b1 = PngImage.encode(img)
      val b2 = PngImage.encode(img)
      assert(java.util.Arrays.equals(b1, b2), s"nondeterministic encode id=$id")
      // the 8-byte PNG signature — actual PNG bytes, not relabeled raw
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      assert(sig.indices.forall(i => (b1(i) & 0xff) == sig(i)), "missing PNG signature")
    }
  }

  test("decode(encode) round-trips every pixel exactly (lossless)") {
    for (id <- Seq(0L, 3L, 42L, 250L, 499L)) {
      val img = PpmImage.synthesize(id)
      val back = PngImage.decode(PngImage.encode(img))
      assert(back.width == img.width && back.height == img.height)
      assert(java.util.Arrays.equals(back.pixels, img.pixels),
        s"id=$id pixels not bit-identical through PNG")
    }
  }

  test("distributed decode matches the local kernel row for row") {
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val got = Multimodal.decodePng(Multimodal.asPngTable(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Double]("mean_r"), r.getAs[Double]("mean_g"),
          r.getAs[Double]("mean_b"))))
      .toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val img = PpmImage.synthesize(id)
      var sr = 0L; var sg = 0L; var sb = 0L
      var k = 0
      while (k < img.pixels.length) {
        sr += img.pixels(k) & 0xff; sg += img.pixels(k + 1) & 0xff
        sb += img.pixels(k + 2) & 0xff; k += 3
      }
      val n = (img.width * img.height).toDouble
      // lossless codec ⇒ the distributed means are EXACTLY the
      // closed-form synthetic means, not within-tolerance
      assert(got(id) == ((img.width, img.height, sr / n, sg / n, sb / n)),
        s"id=$id decoded stats diverged: ${got(id)}")
    }
  }
}
