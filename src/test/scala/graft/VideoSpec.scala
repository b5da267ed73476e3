package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GifVideo

/** The GIF container contract: real animated-GIF bytes, bit-exact
  * frame round-trip (lossless palette format — the property the full
  * hash oracle of multimodal_video_decode/_frames rests on).
  */
class VideoSpec extends AnyFunSuite {

  test("encode produces a real GIF89a stream, deterministic") {
    for (id <- Seq(0L, 1L, 7L, 123L, 499L)) {
      val clip = GifVideo.synthesize(id)
      val b1 = GifVideo.encode(clip)
      val b2 = GifVideo.encode(clip)
      assert(java.util.Arrays.equals(b1, b2))
      assert(new String(b1, 0, 6, "US-ASCII") == "GIF89a")
    }
  }

  test("decode(encode) round-trips every frame pixel-exactly") {
    for (id <- Seq(0L, 3L, 42L, 250L, 499L)) {
      val clip = GifVideo.synthesize(id)
      val back = GifVideo.decode(GifVideo.encode(clip))
      assert(back.width == clip.width && back.height == clip.height)
      assert(back.frames.length == clip.frames.length)
      clip.frames.zip(back.frames).zipWithIndex.foreach { case ((a, b), f) =>
        assert(java.util.Arrays.equals(a, b), s"id=$id frame=$f differs")
      }
    }
  }

  test("frame count and dimensions follow the closed form") {
    for (id <- 0L to 20L) {
      val clip = GifVideo.synthesize(id)
      assert(clip.frames.length == (2 + id % 4).toInt)
      assert(clip.width == (8 + id % 9).toInt)
      assert(clip.height == (8 + id % 7).toInt)
    }
  }
}
