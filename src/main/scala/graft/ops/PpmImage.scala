package graft.ops

/** Minimal pure-JVM image codec: PPM "P6" (binary PortablePixMap) —
  * `P6\n<w> <h>\n255\n` followed by w·h RGB byte triples. Chosen because
  * it is a REAL raster format decodable without any native library, so
  * the multimodal pipeline's decode/resize kernels can operate on actual
  * pixels — and losslessly, so pixel statistics are SQL-replayable
  * (the lossy twin is [[JpegImage]]; MP3/video stay stubbed — they need
  * libs this environment does not ship; the plumbing is identical).
  */
object PpmImage {

  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
    /** (r, g, b) at integer coordinates, each 0..255. */
    def apply(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * width + x) * 3
      (pixels(i) & 0xff, pixels(i + 1) & 0xff, pixels(i + 2) & 0xff)
    }
  }

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  def decode(bytes: Array[Byte]): Image = {
    // header: magic, whitespace-separated width/height/maxval, ONE
    // whitespace byte, then raw triples
    require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 ppm")
    var i = 2
    def nextInt(): Int = {
      while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      var v = 0
      var digits = 0
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) {
        require(bytes(i) >= '0' && bytes(i) <= '9',
          s"malformed ppm header byte '${bytes(i).toChar}' at $i")
        v = v * 10 + (bytes(i) - '0'); i += 1; digits += 1
      }
      require(digits > 0, s"missing ppm header field at $i")
      v
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    require(maxv == 255, s"unsupported maxval $maxv")
    i += 1 // the single whitespace after maxval
    // a truncated buffer must fail loudly — copyOfRange would silently
    // zero-pad and fabricate black pixels
    require(i + w * h * 3 <= bytes.length,
      s"truncated ppm: need ${w * h * 3} pixel bytes, have ${bytes.length - i}")
    val px = java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)
    Image(w, h, px)
  }

  /** Nearest-neighbor resize — real pixel-space work: output (x, y)
    * samples source (x·w/w2, y·h/h2), integer arithmetic (floor), the
    * exact formula the DuckDB oracle mirrors.
    */
  def resize(img: Image, w2: Int, h2: Int): Image = {
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        val sx = x * img.width / w2
        val si = (sy * img.width + sx) * 3
        val di = (y * w2 + x) * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  /** Deterministic synthetic image for a document id — dimensions and
    * every channel value are closed-form in (doc_id, x, y) so a SQL
    * oracle regenerates the identical pixels:
    * w = 8 + id%9, h = 8 + id%7, r=(7id+3x+5y)%256, g=(11id+x+2y)%256,
    * b=(13id+3x+y)%256.
    */
  def synthesize(docId: Long): Image = {
    val w = (8 + docId % 9).toInt
    val h = (8 + docId % 7).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        px(i) = ((7 * docId + 3 * x + 5 * y) % 256).toByte
        px(i + 1) = ((11 * docId + x + 2 * y) % 256).toByte
        px(i + 2) = ((13 * docId + 3 * x + y) % 256).toByte
        x += 1
      }
      y += 1
    }
    Image(w, h, px)
  }
}
