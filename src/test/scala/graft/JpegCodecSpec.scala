package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageCodec, JpegCodec}

/** JpegCodec — the pure-JVM baseline JFIF encoder/decoder behind
  * mm_jpeg (the reference ingests JPEG via libjpeg; this is the
  * format counterpart). */
class JpegCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): ImageCodec.Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      rgb(3 * (y * w + x)) = r.toByte
      rgb(3 * (y * w + x) + 1) = g.toByte
      rgb(3 * (y * w + x) + 2) = b.toByte
    }
    ImageCodec.Image(w, h, rgb)
  }

  test("stream structure: SOI/JFIF APP0 leader, EOI trailer") {
    val bytes = JpegCodec.encodeJpeg(img(16, 16)((_, _) => (90, 90, 90)))
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    assert((bytes(2) & 0xff) == 0xff && (bytes(3) & 0xff) == 0xe0)
    assert(new String(bytes.slice(6, 10)) == "JFIF")
    assert((bytes(bytes.length - 2) & 0xff) == 0xff &&
      (bytes(bytes.length - 1) & 0xff) == 0xd9)
  }

  test("grayscale block-aligned flat bands round-trip EXACTLY at q100") {
    // the mm_jpeg oracle anchor: gray (identity color transform) +
    // flat 8x8-aligned bands (DC-only blocks) + q100 (quant all 1s)
    val values = Array(17, 240, 88, 155)
    val im = img(32, 16) { (x, _) => val v = values(x / 8 % 4); (v, v, v) }
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(im, quality = 100, gray = true))
    assert(dec.width == 32 && dec.height == 16)
    assert(dec.rgb.sameElements(im.rgb),
      "gray flat-band q100 round trip must be bit-exact")
  }

  test("color flat image round-trips near-exactly at q100") {
    val im = img(24, 24)((_, _) => (200, 60, 130))
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(im, quality = 100))
    val maxErr = im.rgb.zip(dec.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    // YCbCr forward/backward rounding costs at most ±2 per channel
    assert(maxErr <= 2, s"flat color max error $maxErr")
  }

  test("color 8x8-flat blocks at q100 4:4:4 decode to EXACTLY yccRoundtrip") {
    // the mm_jpeg_color / mm_segment oracle anchor: integer YCbCr
    // samples + DC-only blocks + unit quant table ⇒ the decoded pixel
    // is the deterministic two-stage rounded color map, nothing else
    val colors = Array((17, 240, 88), (155, 3, 201), (90, 90, 90), (255, 0, 128),
      (0, 0, 0), (255, 255, 255), (1, 254, 127), (63, 64, 65))
    val im = img(32, 16) { (x, y) => colors((x / 8 + 2 * (y / 8)) % 8) }
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(im, quality = 100))
    for (y <- 0 until 16; x <- 0 until 32) {
      val (r0, g0, b0) = colors((x / 8 + 2 * (y / 8)) % 8)
      val (er, eg, eb) = JpegCodec.yccRoundtrip(r0, g0, b0)
      val o = 3 * (y * 32 + x)
      assert((dec.rgb(o) & 0xff) == er && (dec.rgb(o + 1) & 0xff) == eg &&
        (dec.rgb(o + 2) & 0xff) == eb,
        s"($x,$y): got (${dec.rgb(o) & 0xff},${dec.rgb(o + 1) & 0xff},${dec.rgb(o + 2) & 0xff}) want ($er,$eg,$eb)")
    }
  }

  test("4:2:0: SOF carries 2x2 luma sampling; flat MCUs bounded at q90") {
    val colors = Array((200, 60, 130), (10, 250, 90), (128, 128, 128), (240, 10, 10))
    val im = img(32, 32) { (x, y) => colors((x / 16 + 2 * (y / 16)) % 4) }
    val bytes = JpegCodec.encodeJpeg(im, quality = 90, chroma420 = true)
    // find SOF0, check the luma sampling byte is 0x22
    var i = 0
    while (i < bytes.length - 1 &&
      !((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0)) i += 1
    assert((bytes(i + 11) & 0xff) == 0x22, "luma sampling factor should be 2x2")
    // 4:2:0 stream is smaller than 4:4:4 on the same image
    assert(bytes.length < JpegCodec.encodeJpeg(im, quality = 90).length)
    val dec = JpegCodec.decodeJpeg(bytes)
    assert(dec.width == 32 && dec.height == 32)
    // flat 16x16 MCUs: subsampling is exact (average of equals), so
    // the only loss is DC quantization — bounded by the q90 DC steps
    // (3 luma, 3 chroma) through the color transform
    val maxErr = im.rgb.zip(dec.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 8, s"flat-MCU 4:2:0 q90 max error $maxErr")
  }

  test("4:2:0 textured: bounded error, dimensions preserved off-alignment") {
    val im = img(22, 18) { (x, y) =>
      ((x * 37 + y * 11) % 256, (x * 5 + 128) % 256, (y * 29 + 60) % 256)
    }
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(im, quality = 90, chroma420 = true))
    assert(dec.width == 22 && dec.height == 18)
    val mae = im.rgb.zip(dec.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / im.rgb.length
    assert(mae < 32.0, s"4:2:0 q90 mean abs error $mae out of bounds")
  }

  test("textured image: bounded reconstruction error, decreasing with quality") {
    val im = img(40, 24) { (x, y) =>
      ((x * 37 + y * 11) % 256, (x * 5 + 128) % 256, (y * 29 + 60) % 256)
    }
    def mae(q: Int): Double = {
      val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(im, quality = q))
      assert(dec.width == im.width && dec.height == im.height)
      im.rgb.zip(dec.rgb)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / im.rgb.length
    }
    val e90 = mae(90)
    val e20 = mae(20)
    assert(e90 < 24.0, s"q90 mean abs error $e90 out of bounds")
    assert(e20 >= e90 * 0.8, s"q20 ($e20) should not beat q90 ($e90)")
  }

  test("non-8-aligned dimensions pad and crop correctly") {
    val im = img(13, 11) { (x, y) => val v = (x * 19 + y * 7) % 256; (v, v, v) }
    val dec = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(im, quality = 95, gray = true))
    assert(dec.width == 13 && dec.height == 11)
    val maxErr = im.rgb.zip(dec.rgb)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 16, s"padded gray q95 max error $maxErr")
  }

  test("compression is real: flat image far smaller than raw") {
    val im = img(64, 64)((_, _) => (120, 120, 120))
    val bytes = JpegCodec.encodeJpeg(im, quality = 90)
    assert(bytes.length < 64 * 64 * 3 / 10,
      s"flat 64x64 should compress >10x, got ${bytes.length}")
    // lower quality never produces a larger stream on textured input
    val tx = img(64, 64)((x, y) => ((x * y) % 256, (x * 31) % 256, (y * 17) % 256))
    val hi = JpegCodec.encodeJpeg(tx, quality = 95).length
    val lo = JpegCodec.encodeJpeg(tx, quality = 10).length
    assert(lo < hi, s"q10 ($lo) should be smaller than q95 ($hi)")
  }

  test("malformed input fails with diagnostics, not garbage") {
    val good = JpegCodec.encodeJpeg(img(16, 16)((_, _) => (50, 100, 150)))
    val noSoi = good.clone(); noSoi(1) = 0x00
    assert(intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(noSoi)).getMessage.contains("SOI"))
    assert(intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(good.take(3))).getMessage.toLowerCase.contains("truncated"))
    // truncated entropy data
    assert(intercept[Exception](
      JpegCodec.decodeJpeg(good.dropRight(20))).getMessage.nonEmpty)
    // progressive SOF2 rejected explicitly
    val prog = good.clone()
    var i = 0
    while (i < prog.length - 1 &&
      !((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
    prog(i + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(prog)).getMessage.contains("progressive"))
    // APP0 with a forged length of 0 or 1 must fail loudly, not walk
    // the marker scan backwards forever (segment length includes its
    // own two bytes, so anything < 2 is malformed)
    val badApp = good.clone()
    badApp(4) = 0x00; badApp(5) = 0x01 // APP0 length := 1
    assert(intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(badApp)).getMessage.contains("segment length"))
  }

  test("determinism: identical input, identical stream") {
    val im = img(24, 16)((x, y) => ((x * 7) % 256, (y * 13) % 256, ((x + y) * 3) % 256))
    assert(JpegCodec.encodeJpeg(im, 80).sameElements(JpegCodec.encodeJpeg(im, 80)))
  }
}
