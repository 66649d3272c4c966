package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ImageCodec

class ImageCodecSpec extends AnyFunSuite {

  test("BMP round-trip is pixel-exact for every row-padding class") {
    val r = new scala.util.Random(11)
    // widths 1..9 cover all four (3w mod 4) padding classes
    for (w <- 1 to 9; h <- Seq(1, 2, 5)) {
      val rgb = Array.fill(w * h * 3)(r.nextInt(256).toByte)
      val bytes = ImageCodec.encodeBmp(ImageCodec.Image(w, h, rgb))
      assert(bytes.length == ImageCodec.encodedSize(w, h))
      val back = ImageCodec.decodeBmp(bytes)
      assert(back.width == w && back.height == h)
      assert(back.rgb.toSeq == rgb.toSeq, s"round-trip drift at ${w}x$h")
    }
  }

  test("stored bytes honor BGR order, bottom-up rows, and row padding") {
    // 2x1: pixels (R=1,G=2,B=3),(R=4,G=5,B=6) stored as B,G,R
    val b1 = ImageCodec.encodeBmp(ImageCodec.Image(2, 1, Array[Byte](1, 2, 3, 4, 5, 6)))
    assert(b1.slice(54, 60).toSeq == Seq[Byte](3, 2, 1, 6, 5, 4))
    // 1x2: bottom-up storage puts the LAST top-down row first; rowSize(1)=4
    val b2 = ImageCodec.encodeBmp(ImageCodec.Image(1, 2, Array[Byte](1, 2, 3, 4, 5, 6)))
    assert(ImageCodec.rowSize(1) == 4)
    assert(b2.slice(54, 57).toSeq == Seq[Byte](6, 5, 4))
    assert(b2.slice(58, 61).toSeq == Seq[Byte](3, 2, 1))
  }

  test("decoder rejects malformed input with diagnostics") {
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(Array[Byte](1, 2, 3)))
    val good = ImageCodec.encodeBmp(
      ImageCodec.Image(3, 2, Array.fill(18)(7.toByte)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(badMagic))
    intercept[IllegalArgumentException](ImageCodec.decodeBmp(good.dropRight(4)))
  }

  test("decoder reads top-down (negative height) BMPs too") {
    // hand-flip a bottom-up file into top-down form: negate the height
    // and reorder the rows; decode must yield identical pixels
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 7).toByte)
    val up = ImageCodec.encodeBmp(ImageCodec.Image(2, 3, rgb))
    val rs = ImageCodec.rowSize(2)
    val down = up.clone()
    // height at offset 22, little-endian: write -3
    val neg = -3
    down(22) = (neg & 0xff).toByte
    down(23) = ((neg >> 8) & 0xff).toByte
    down(24) = ((neg >> 16) & 0xff).toByte
    down(25) = ((neg >> 24) & 0xff).toByte
    for (y <- 0 until 3)
      System.arraycopy(up, 54 + (2 - y) * rs, down, 54 + y * rs, rs)
    assert(ImageCodec.decodeBmp(down).rgb.toSeq == rgb.toSeq)
  }
}
