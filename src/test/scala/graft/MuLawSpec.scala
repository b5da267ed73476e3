package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MuLawAudio, WavAudio}

class MuLawSpec extends AnyFunSuite {

  test("companding error is bounded by the segment step everywhere") {
    var x = -32768
    while (x <= 32767) {
      val d = MuLawAudio.decodeSample(MuLawAudio.encodeSample(x.toShort))
      val err = math.abs(d - x)
      // mid-step reconstruction: error ≤ half the segment quantum
      // (≤ 512 at the top segment) except in the clip region, where the
      // error peaks at |−32768| − 32124 = 644
      assert(err <= 644, s"x=$x decoded $d err=$err")
      x += 1
    }
  }

  test("encode is idempotent through a decode round trip (mid-step law)") {
    var x = -32768
    while (x <= 32767) {
      val e1 = MuLawAudio.encodeSample(x.toShort)
      val e2 = MuLawAudio.encodeSample(MuLawAudio.decodeSample(e1))
      assert(e1 == e2, s"x=$x re-encoded differently")
      x += 997 // stride: the full-range property is covered above
    }
  }

  test("mu-law WAV container round-trips through a real format-7 header") {
    for (id <- Seq(0L, 7L, 123L)) {
      val src = WavAudio.synthesize(id)
      val bytes = MuLawAudio.encode(src)
      // real RIFF/WAVE, format tag 7, 8 bits/sample, 1 byte per sample
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
      assert(bytes.length == 44 + src.samples.length)
      val back = MuLawAudio.decode(bytes)
      assert(back.sampleRate == src.sampleRate)
      assert(back.samples.length == src.samples.length)
      back.samples.zip(src.samples).foreach { case (d, s) =>
        assert(math.abs(d - s) <= 644)
      }
    }
  }
}
