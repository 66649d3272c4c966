package graft.functions

/** Pure-JVM 24-bit BMP encoder/decoder — the real-format backbone of
  * the multimodal feature stage (reference t_extract semantics,
  * ferret-pthreads.c:514: decode → geometry → channel features).
  *
  * No image libraries exist in this environment, so payload columns
  * are SYNTHESIZED (deterministically, from content digests) — but
  * they are genuine BMP files and this decoder is a genuine parser:
  * little-endian headers, BGR pixel order, bottom-up row storage and
  * 4-byte row padding are all honored, and malformed input fails with
  * a diagnostic rather than garbage. Swapping the synthesized column
  * for scanned files changes nothing downstream.
  */
object ImageCodec {

  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != $width x $height x 3")
  }

  private val FileHeaderSize = 14
  private val InfoHeaderSize = 40
  private val PixelOffset = FileHeaderSize + InfoHeaderSize

  /** Bytes per stored row: 3 per pixel, padded up to a 4-byte boundary
    * (the BMP format's row alignment rule). */
  def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Total encoded size for a width×height 24-bit BMP. */
  def encodedSize(width: Int, height: Int): Int =
    PixelOffset + rowSize(width) * height

  private def putIntLE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v & 0xff).toByte
    buf(off + 1) = ((v >>> 8) & 0xff).toByte
    buf(off + 2) = ((v >>> 16) & 0xff).toByte
    buf(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def getIntLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8) |
      ((buf(off + 2) & 0xff) << 16) | ((buf(off + 3) & 0xff) << 24)

  private def getShortLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8)

  /** Encode top-down RGB pixels as a standard bottom-up 24-bit BMP. */
  def encodeBmp(img: Image): Array[Byte] = {
    val rs = rowSize(img.width)
    val out = new Array[Byte](encodedSize(img.width, img.height))
    // BITMAPFILEHEADER
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, out.length)
    putIntLE(out, 10, PixelOffset)
    // BITMAPINFOHEADER
    putIntLE(out, 14, InfoHeaderSize)
    putIntLE(out, 18, img.width)
    putIntLE(out, 22, img.height) // positive height = bottom-up rows
    out(26) = 1 // planes
    out(28) = 24 // bits per pixel
    putIntLE(out, 34, rs * img.height) // image size
    var y = 0
    while (y < img.height) {
      val srcRow = y * img.width * 3
      val dstRow = PixelOffset + (img.height - 1 - y) * rs
      var x = 0
      while (x < img.width) {
        // stored order is B,G,R
        out(dstRow + 3 * x) = img.rgb(srcRow + 3 * x + 2)
        out(dstRow + 3 * x + 1) = img.rgb(srcRow + 3 * x + 1)
        out(dstRow + 3 * x + 2) = img.rgb(srcRow + 3 * x)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP into top-down RGB pixels.
    * Validates magic, header sizes, bit depth and buffer bounds. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= PixelOffset, s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "bad BMP magic")
    val pixelOff = getIntLE(bytes, 10)
    val infoSize = getIntLE(bytes, 14)
    require(infoSize >= InfoHeaderSize, s"unsupported header size $infoSize")
    require(pixelOff >= PixelOffset && pixelOff <= bytes.length,
      s"bad pixel-data offset $pixelOff")
    val width = getIntLE(bytes, 18)
    val rawHeight = getIntLE(bytes, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    // dimension cap guards the size arithmetic below against int
    // overflow (a crafted header with width ~2^30 would wrap rs*height
    // negative and defeat the truncation check)
    require(width <= (1 << 20) && height <= (1 << 20),
      s"unreasonable dimensions ${width}x$height")
    require(getShortLE(bytes, 28) == 24, "only 24-bit BMP supported")
    require(getIntLE(bytes, 30) == 0, "only uncompressed (BI_RGB) supported")
    val rs = rowSize(width)
    require(bytes.length.toLong >= pixelOff.toLong + rs.toLong * height,
      s"truncated pixel data: need ${pixelOff.toLong + rs.toLong * height}, have ${bytes.length}")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"pixel buffer too large: ${width}x$height")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = pixelOff + (if (bottomUp) (height - 1 - y) * rs else y * rs)
      val dstRow = y * width * 3
      var x = 0
      while (x < width) {
        rgb(dstRow + 3 * x) = bytes(srcRow + 3 * x + 2) // R from stored B,G,R
        rgb(dstRow + 3 * x + 1) = bytes(srcRow + 3 * x + 1)
        rgb(dstRow + 3 * x + 2) = bytes(srcRow + 3 * x)
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }
}
