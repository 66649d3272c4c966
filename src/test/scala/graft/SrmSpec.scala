package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ImageCodec, Srm}

/** Srm.segment / Srm.describe — the pure-JVM SRM segmenter behind
  * mm_segment and ferret's region vecsets (srm.c:251,
  * extract.c:261). */
class SrmSpec extends AnyFunSuite {

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

  test("uniform image segments to one region") {
    val (mask, n) = Srm.segment(img(8, 6)((_, _) => (120, 30, 200)))
    assert(n == 1 && mask.forall(_ == 0))
  }

  test("two flat max-contrast halves stay two regions, scan-order labeled") {
    val im = img(8, 4)((x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255))
    val (mask, n) = Srm.segment(im)
    assert(n == 2)
    // scan-order relabel: the first pixel's region is 0
    for (y <- 0 until 4; x <- 0 until 8)
      assert(mask(y * 8 + x) == (if (x < 4) 0 else 1))
  }

  test("low-amplitude noise merges into its half (SRM threshold behavior)") {
    // ±3 digit noise inside each half, 128 contrast across: SRM's
    // per-pair statistical threshold merges within-half pairs long
    // before any cross-half pair qualifies
    val im = img(16, 12) { (x, y) =>
      val base = if (x < 8) 40 else 190
      val v = base + ((x * 7 + y * 13) % 7) - 3
      (v, v, v)
    }
    val (mask, n) = Srm.segment(im)
    assert(n == 2, s"expected 2 regions, got $n")
    for (y <- 0 until 12; x <- 0 until 16)
      assert(mask(y * 16 + x) == (if (x < 8) 0 else 1))
  }

  test("high-contrast 2x2 checkerboard stays 4 single-pixel regions") {
    // minRegSize = 0.005*4 = 0 → the small-region sweep is inert
    val im = img(2, 2)((x, y) => if ((x + y) % 2 == 0) (0, 0, 0) else (255, 255, 255))
    val (_, n) = Srm.segment(im)
    assert(n == 4)
  }

  test("small-region sweep absorbs specks under size_factor") {
    // one max-contrast pixel inside a 32x32 flat field: 1 < 0.005*1024
    // ≈ 5, so the sweep merges it into the field
    val im = img(32, 32)((x, y) => if (x == 7 && y == 5) (255, 255, 255) else (0, 0, 0))
    val (_, n) = Srm.segment(im)
    assert(n == 1)
  }

  test("regions partition the image: sizes, channel sums, weights") {
    val im = img(16, 12) { (x, y) => ((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 29) % 256) }
    val (mask, n) = Srm.segment(im)
    val regions = Srm.describe(im, mask, n)
    assert(regions.map(_.nPixels).sum == 16 * 12)
    val rTot = (0 until 16 * 12).map(i => im.rgb(3 * i) & 0xff).sum
    val gTot = (0 until 16 * 12).map(i => im.rgb(3 * i + 1) & 0xff).sum
    val bTot = (0 until 16 * 12).map(i => im.rgb(3 * i + 2) & 0xff).sum
    assert(regions.map(_.rSum).sum == rTot)
    assert(regions.map(_.gSum).sum == gTot)
    assert(regions.map(_.bSum).sum == bTot)
    assert(math.abs(regions.map(_.weight).sum - 1.0) < 1e-9)
    assert(regions.forall(_.descriptor.length == Srm.Dim))
  }

  test("uniform-region descriptor: zero higher moments, weighted means") {
    val im = img(6, 4)((_, _) => (200, 100, 50))
    val regions = Srm.segmentAndDescribe(im)
    assert(regions.length == 1)
    val d = regions(0).descriptor
    // HSV of (200,100,50): V=200, S=150*255/200=191, H: mx==r,
    // hue=(100-50)/150=1/3 → 255/18=14 (float-truncated)
    assert(d(0) == 6.0 * (14 / 255.0)) // H mean × dw[0]
    assert(d(3) == 4.0 * (191 / 255.0)) // S mean × dw[3]
    assert(d(6) == 4.0 * (200 / 255.0)) // V mean × dw[6]
    assert(d(1) == 0.0 && d(4) == 0.0 && d(7) == 0.0) // stddevs
    assert(d(2) == 0.0 && d(5) == 0.0 && d(8) == 0.0) // third moments
    // box over the full 6x4 frame: rows 0..3, cols 0..5
    assert(d(9) == 0.2 * math.log(6.0 / 4.0)) // log(dy/dx), x=row
    assert(d(10) == 0.4 * 1.0) // full density
    assert(d(11) == 0.04 * math.log(24.0))
    // centroids: rows mean 1.5 → 1 (int truncation), cols mean 2.5 → 2
    assert(d(12) == 0.007 * 1.0 && d(13) == 0.007 * 2.0)
  }

  test("rgb2hsv matches the reference's byte-scaled conversion") {
    assert(Srm.rgb2hsv(0, 0, 0) == ((0, 0, 0)))
    assert(Srm.rgb2hsv(255, 0, 0) == ((0, 255, 255)))
    assert(Srm.rgb2hsv(0, 255, 0) == ((85, 255, 255))) // 255*2/6
    assert(Srm.rgb2hsv(0, 0, 255) == ((170, 255, 255))) // 255*4/6
    assert(Srm.rgb2hsv(90, 90, 90) == ((0, 0, 90))) // gray: S=0
    assert(Srm.rgb2hsv(200, 100, 50) == ((14, 191, 200)))
  }

  test("segmentation is deterministic") {
    val im = img(12, 9) { (x, y) => ((x * y * 31) % 256, (x + y * 3) % 256, (x * 17) % 256) }
    val a = Srm.segment(im)
    val b = Srm.segment(im)
    assert(a._1.sameElements(b._1) && a._2 == b._2)
  }
}
