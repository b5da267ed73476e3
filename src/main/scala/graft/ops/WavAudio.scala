package graft.ops

/** Minimal pure-JVM audio codec: RIFF/WAVE, PCM16 mono little-endian —
  * the 44-byte canonical header plus raw samples. Like [[PpmImage]],
  * chosen because it is a REAL media container decodable without native
  * libraries, so the audio pipeline's decode/resample kernels operate on
  * actual samples.
  */
object WavAudio {

  final case class Clip(sampleRate: Int, samples: Array[Short])

  def encode(clip: Clip): Array[Byte] = {
    val dataLen = clip.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(clip.sampleRate)
      .putInt(clip.sampleRate * 2)       // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    clip.samples.foreach(bb.putShort)
    bb.array()
  }

  def decode(bytes: Array[Byte]): Clip = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    require(bb.getShort(20) == 1 && bb.getShort(22) == 1 && bb.getShort(34) == 16,
      "only PCM16 mono supported")
    val rate = bb.getInt(24)
    val dataLen = bb.getInt(40)
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort(44 + 2 * i); i += 1 }
    Clip(rate, out)
  }

  /** Decimating resample by an integer factor — keep every k-th sample
    * (the closed-form kernel the SQL oracle mirrors; a production
    * resampler would low-pass first, which needs no different plumbing).
    */
  def decimate(clip: Clip, k: Int): Clip = {
    require(k > 0)
    val out = new Array[Short]((clip.samples.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = clip.samples(i * k); i += 1 }
    Clip(clip.sampleRate / k, out)
  }

  /** Deterministic synthetic clip for a document id: n = 400 + id%200
    * samples at 8000 Hz, sample(i) = (31·id + 7·i) % 65536 − 32768 —
    * closed-form in (id, i) so a SQL oracle regenerates every sample.
    */
  def synthesize(docId: Long): Clip = {
    val n = (400 + docId % 200).toInt
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = (((31 * docId + 7L * i) % 65536) - 32768).toShort
      i += 1
    }
    Clip(8000, s)
  }
}
