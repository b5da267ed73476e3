package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL JPEG codec on the JDK's bundled `javax.imageio` baseline
  * encoder/decoder — no native library install, works headless, and the
  * byte stream is deterministic for a given input + quality (verified
  * in JpegSpec; the table below never depends on encoder bytes anyway,
  * only on decoded pixels).
  *
  * Shares [[PpmImage.Image]] as the decoded-pixel representation, so
  * the resize kernel and the synthetic-pattern generator are the SAME
  * code for both formats — swapping the codec changes no pixel-space
  * logic, which is the multimodal plumbing contract (SURVEY.md §2B).
  *
  * JPEG is lossy: decoded channel values differ from the source by a
  * few units even at quality 1.0, so unlike the PPM path the pixel
  * statistics are NOT SQL-replayable — dimensions are exact (hash
  * oracle), means are tolerance-checked in JpegSpec (the same
  * exact-twin/approximate-op split as MinHash-vs-md5 dedup).
  */
object JpegImage {

  /** Encode RGB pixels as baseline JPEG at the given quality. */
  def encode(img: PpmImage.Image, quality: Float = 1.0f): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img(x, y)
        bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    // MemoryCacheImageOutputStream, NOT ImageIO.createImageOutputStream:
    // the factory honors ImageIO.getUseCache() (default TRUE) and backs
    // every stream with a TEMP FILE — one file create+delete per image
    // dominated the kernel (bench: 4-7 s per jpeg query at sf0.1).
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(bi, null, null), param)
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode a JPEG payload to RGB pixels. Fails loudly on non-JPEG
    * bytes (ImageIO.read returns null rather than throwing).
    */
  def decode(bytes: Array[Byte]): PpmImage.Image = {
    // memory-cache stream for the same temp-file reason as encode();
    // a dedicated reader also skips ImageIO.read's format re-probe
    val readers = ImageIO.getImageReadersByFormatName("jpeg")
    val reader = readers.next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    val bi = try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.dispose()
      iis.close()
    }
    require(bi != null, "not a decodable image payload")
    val w = bi.getWidth
    val h = bi.getHeight
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = bi.getRGB(x, y)
        val i = (y * w + x) * 3
        px(i) = ((rgb >> 16) & 0xff).toByte
        px(i + 1) = ((rgb >> 8) & 0xff).toByte
        px(i + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PpmImage.Image(w, h, px)
  }
}
