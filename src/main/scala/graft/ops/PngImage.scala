package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** REAL PNG codec on the JDK's bundled `javax.imageio` reader/writer —
  * the same zero-native-install path as [[JpegImage]], with one crucial
  * difference: PNG is LOSSLESS, so decode(encode(img)) reproduces every
  * pixel bit-for-bit. That upgrades the whole decode → stats → resize
  * family from the JPEG tier's dims-only hash oracle + tolerance specs
  * to FULL pixel-exact hash oracles (the PPM/GIF treatment), while
  * still exercising a real compressed interchange format (zlib/deflate
  * filtering) rather than PPM's raw bytes.
  *
  * Shares [[PpmImage.Image]] as the decoded representation, so the
  * resize kernel and synthetic-pattern generator are the same code as
  * the PPM/JPEG paths — swapping codecs changes no pixel-space logic,
  * which is the multimodal plumbing contract (SURVEY.md §2B).
  */
object PngImage {

  /** Encode RGB pixels as PNG. Deterministic for a given input. */
  def encode(img: PpmImage.Image): Array[Byte] = {
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
    // every stream with a TEMP FILE — one create+delete per image
    // dominated the JPEG kernel before the same fix (see JpegImage)
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(bi)
      ios.flush()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode a PNG payload to RGB pixels — exact inverse of [[encode]]
    * (lossless codec). Fails loudly on non-PNG bytes.
    */
  def decode(bytes: Array[Byte]): PpmImage.Image = {
    val reader = ImageIO.getImageReadersByFormatName("png").next()
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
