package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL multi-frame container codec: animated GIF via the JDK's
  * `javax.imageio` — the video-shaped path of the multimodal family
  * (frame extraction / frame sampling), previously a labeled stub.
  * GIF is palette-based and LOSSLESS, so grayscale frames round-trip
  * bit-exactly (proven in VideoSpec) and frame statistics are
  * SQL-replayable — unlike the lossy JPEG pair, this container gets a
  * full hash oracle like PPM/WAV.
  *
  * Frames are grayscale on purpose: every pixel value is one of ≤256
  * palette entries, so the encoder never quantizes. [[synthesize]]
  * keeps dimensions, frame count and every pixel closed-form in
  * (doc_id, frame, x, y) for the DuckDB oracle.
  */
object GifVideo {

  /** A decoded clip: `frames(f)(y*width + x)` is the gray value. */
  final case class Clip(width: Int, height: Int, frames: Array[Array[Byte]]) {
    require(frames.forall(_.length == width * height),
      "frame buffer size mismatch")
  }

  /** Deterministic synthetic clip: nFrames = 2 + id%4, w = 8 + id%9,
    * h = 8 + id%7, gray(f, x, y) = (17·id + 37·f + 3·x + 5·y) % 256.
    */
  def synthesize(docId: Long): Clip = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val n = (2 + docId % 4).toInt
    val frames = Array.tabulate(n) { f =>
      val buf = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          buf(y * w + x) = ((17 * docId + 37 * f + 3 * x + 5 * y) % 256).toByte
          x += 1
        }
        y += 1
      }
      buf
    }
    Clip(w, h, frames)
  }

  /** Encode as a real animated GIF (one image sequence, local palettes
    * as the writer chooses). Memory-cache stream — see JpegImage for
    * why NOT ImageIO.createImageOutputStream (temp file per payload).
    */
  def encode(clip: Clip): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      clip.frames.foreach { buf =>
        val bi = new BufferedImage(clip.width, clip.height,
          BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < clip.height) {
          var x = 0
          while (x < clip.width) {
            val v = buf(y * clip.width + x) & 0xff
            bi.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new IIOImage(bi, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode all frames (gray = red channel; synthesized frames are
    * grayscale so the three channels agree).
    */
  def decode(bytes: Array[Byte]): Clip = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      require(n > 0, "no frames in payload")
      val frames = Array.tabulate(n) { i =>
        val bi = reader.read(i)
        val w = bi.getWidth
        val h = bi.getHeight
        val buf = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            buf(y * w + x) = ((bi.getRGB(x, y) >> 16) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        buf
      }
      val first = reader.read(0)
      Clip(first.getWidth, first.getHeight, frames)
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}
