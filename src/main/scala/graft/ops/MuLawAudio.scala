package graft.ops

/** REAL compressed-audio codec: ITU-T G.711 μ-law — 16-bit PCM
  * log-companded to 8 bits, the telephony standard. Pure integer
  * arithmetic, so unlike floating-DSP codecs the loss is
  * DETERMINISTIC: decode(encode(x)) is a closed-form step function of
  * x, which lets a SQL oracle replay the full lossy round-trip
  * bit-exactly (multimodal_mulaw_roundtrip) — the compressed-audio
  * analogue of the PPM/GIF exact oracles, where JPEG (float DCT) can
  * only oracle its dimensions.
  *
  * Container: RIFF/WAVE with wFormatTag = 7 (μ-law), the real on-disk
  * framing G.711 audio ships in.
  */
object MuLawAudio {

  private val Bias = 0x84 // 132
  private val Clip = 32635

  /** Linear 16-bit → 8-bit μ-law (the canonical G.711 reference
    * algorithm: sign, bias, segment = position of the MSB, 4-bit
    * mantissa, ones-complement).
    */
  def encodeSample(pcm: Short): Byte = {
    var x = pcm.toInt
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > Clip) x = Clip
    x += Bias
    var seg = 7
    while (seg > 0 && (x & (0x4000 >> (7 - seg))) == 0) seg -= 1
    // seg = index of the highest set bit among bits 7..14
    val mantissa = (x >> (seg + 3)) & 0x0f
    (~(sign | (seg << 4) | mantissa)).toByte
  }

  /** μ-law 8-bit → linear 16-bit (exact inverse of the segment/mantissa
    * packing; the mid-step reconstruction the standard defines).
    */
  def decodeSample(u: Byte): Short = {
    val v = (~u) & 0xff
    val seg = (v >> 4) & 0x07
    val mantissa = v & 0x0f
    val mag = (((mantissa << 3) + Bias) << seg) - Bias
    (if ((v & 0x80) != 0) -mag else mag).toShort
  }

  /** Encode a PCM clip as a real RIFF/WAVE μ-law file (format tag 7,
    * 8 bits per sample).
    */
  def encode(clip: WavAudio.Clip): Array[Byte] = {
    val dataLen = clip.samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7)                       // μ-law
      .putShort(1)                       // mono
      .putInt(clip.sampleRate)
      .putInt(clip.sampleRate)           // byte rate (1 byte/sample)
      .putShort(1)                       // block align
      .putShort(8)                       // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    clip.samples.foreach(s => bb.put(encodeSample(s)))
    bb.array()
  }

  /** Decode a μ-law WAV back to linear PCM16. */
  def decode(bytes: Array[Byte]): WavAudio.Clip = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    require(bb.getShort(20) == 7 && bb.getShort(22) == 1 &&
      bb.getShort(34) == 8, "only mu-law mono supported")
    val rate = bb.getInt(24)
    val dataLen = bb.getInt(40)
    val out = new Array[Short](dataLen)
    var i = 0
    while (i < dataLen) { out(i) = decodeSample(bytes(44 + i)); i += 1 }
    WavAudio.Clip(rate, out)
  }
}
