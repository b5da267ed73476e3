package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{JpegImage, Multimodal, PpmImage}
import graft.util.Tables

/** The JPEG codec contract: real lossy compression over real pixels,
  * deterministic bytes, exact dimensions, bounded channel error — the
  * checks the hash oracle cannot do because the JDK's IDCT is
  * engine-specific.
  */
class JpegSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  test("encode is deterministic and produces a real JFIF stream") {
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val img = PpmImage.synthesize(id)
      val b1 = JpegImage.encode(img)
      val b2 = JpegImage.encode(img)
      assert(java.util.Arrays.equals(b1, b2), s"nondeterministic encode id=$id")
      // SOI/EOI markers — actual JPEG bytes, not a re-labeled bitmap
      assert((b1(0) & 0xff) == 0xff && (b1(1) & 0xff) == 0xd8, "missing SOI")
      assert((b1(b1.length - 2) & 0xff) == 0xff &&
        (b1(b1.length - 1) & 0xff) == 0xd9, "missing EOI")
    }
  }

  test("decode(encode) preserves dimensions exactly and pixels within JPEG error") {
    for (id <- Seq(0L, 3L, 42L, 250L, 499L)) {
      val img = PpmImage.synthesize(id)
      val back = JpegImage.decode(JpegImage.encode(img))
      assert(back.width == img.width && back.height == img.height)
      // per-channel MEAN error bound at quality 1.0 — the tolerance the
      // rows-only multimodal_jpeg_decode query is pinned by
      def means(i: PpmImage.Image): (Double, Double, Double) = {
        var sr = 0L; var sg = 0L; var sb = 0L
        var k = 0
        while (k < i.pixels.length) {
          sr += i.pixels(k) & 0xff; sg += i.pixels(k + 1) & 0xff
          sb += i.pixels(k + 2) & 0xff; k += 3
        }
        val n = (i.width * i.height).toDouble
        (sr / n, sg / n, sb / n)
      }
      val (r0, g0, b0) = means(img)
      val (r1, g1, b1) = means(back)
      assert(math.abs(r0 - r1) <= 1.5 && math.abs(g0 - g1) <= 1.5 &&
        math.abs(b0 - b1) <= 1.5,
        s"id=$id channel means drifted: ($r0,$g0,$b0) vs ($r1,$g1,$b1)")
    }
  }

  test("distributed decode matches the local kernel row for row") {
    val docs = Tables(spark, sfDir, "documents").limit(50)
    val got = Multimodal.decodeJpeg(Multimodal.asJpegTable(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Double]("mean_r")))
      .toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val img = JpegImage.decode(JpegImage.encode(PpmImage.synthesize(id)))
      val (w, h, mr) = got(id)
      assert(w == img.width && h == img.height)
      var sr = 0L
      var k = 0
      while (k < img.pixels.length) { sr += img.pixels(k) & 0xff; k += 3 }
      assert(math.abs(mr - sr.toDouble / (w * h)) < 1e-9,
        s"doc $id mean_r mismatch")
    }
  }

  test("resize to 4x4 round-trips through re-encode with exact dims") {
    val docs = Tables(spark, sfDir, "documents").limit(20)
    val out = Multimodal.decodeJpeg(
        Multimodal.resizeJpeg(Multimodal.asJpegTable(docs), 4, 4))
      .collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 4)
    }
  }
}
