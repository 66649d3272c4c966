package graft.functions

/** Pure-JVM Statistical Region Merging segmenter + per-region
  * descriptor extraction — the reference ferret front-end's t_seg and
  * t_extract stages (ferret-pthreads.c:468 `image_segment`,
  * ferret-pthreads.c:514 `image_extract_helper`) re-implemented over
  * [[ImageCodec]]'s decoded pixels.
  *
  * Semantics follow the reference closely:
  *  - `segment` is the SRM algorithm of srm.c:251 (Nock & Nielsen,
  *    TPAMI 2004): 4-connectivity edges weighted by the max per-channel
  *    absolute difference, bucket-sorted by weight (srm.c:160 — a
  *    256-bucket counting sort, stable in edge-emission order), merged
  *    through a union-find when every channel-mean difference clears
  *    the statistical threshold (srm.c:416), followed by the
  *    small-region sweep (srm.c:452, regions under size_factor×N merge
  *    into their left neighbor) and a scan-order relabel (srm.c:489).
  *    Q = 125 and size_factor = 0.005 are the reference's shipped
  *    values (srm.c:531-533).
  *  - `describe` is extract.c:261: per-region color moments over the
  *    reference's own byte-scaled HSV conversion (image.c:198
  *    pixel_rgb2hsv, replicated bit-exactly including the float→byte
  *    truncations) — mean/255, stddev/255, cbrt(third moment)/255 for
  *    each of the 3 channels — plus the 5 bounding-box shape features
  *    of extract.c:123 box_to_vec (log aspect, pixel density, log box
  *    size, centroid row/col) from the streaming box accumulator of
  *    extract.c:89 box_insert_pxl; region weight = √size normalized
  *    (extract.c:221); the static dimension weights dw[14] of
  *    extract.c:28 applied last (apply_weight, extract.c:30).
  *
  * This is a re-expression, not a port: accumulation runs in double
  * (the reference uses float) and the mask is Int (the reference
  * stores region ids in a uchar plane, wrapping past 255 regions);
  * region structure and descriptor semantics are identical.
  */
object Srm {

  val DefaultQ: Double = 125.0 // srm.c:531 (BenSP's shipped Q_value)
  val DefaultSizeFactor: Double = 0.005 // srm.c:532
  val Dim: Int = 14 // extract.c:25 IMAGE_DIM = 3 chan × 3 moments + 5 box

  /** extract.c:28 — static per-dimension weights applied to every
    * descriptor (apply_weight). */
  private val dw: Array[Double] = Array(
    6.0, 3.0, 1.5, 4.0, 2.0, 1.0, 4.0, 2.0, 1.0, 0.2, 0.4, 0.04, 0.007, 0.007)

  /** One segmented region: pixel count, integer-exact RGB channel sums
    * (for cross-engine verification — the float descriptor is not
    * hash-comparable, the sums are), the 14-dim weighted descriptor
    * and the √size-normalized EMD weight. */
  final case class Region(nPixels: Int, rSum: Long, gSum: Long, bSum: Long,
                          descriptor: Array[Double], weight: Double)

  /** SRM segmentation of top-down RGB pixels. Returns (mask, nRegions)
    * with mask(row*width+col) ∈ [0, nRegions) labeled in scan order —
    * srm.c:251 image_segment. */
  def segment(img: ImageCodec.Image,
              q: Double = DefaultQ,
              sizeFactor: Double = DefaultSizeFactor): (Array[Int], Int) = {
    val w = img.width
    val h = img.height
    val n = w * h
    val rgb = img.rgb

    // union-find with union-by-rank, exactly srm.c's find_set/union_set
    val parent = Array.tabulate(n)(identity)
    val rank = new Array[Int](n)
    def find(i0: Int): Int = {
      var i = i0
      while (parent(i) != i) i = parent(i)
      i
    }
    def union(i: Int, j: Int): Int =
      if (rank(i) > rank(j)) { parent(j) = i; i }
      else {
        parent(i) = j
        if (rank(i) == rank(j)) rank(j) += 1
        j
      }

    val redMean = new Array[Double](n)
    val greenMean = new Array[Double](n)
    val blueMean = new Array[Double](n)
    val size = new Array[Int](n)
    var i = 0
    while (i < n) {
      redMean(i) = rgb(3 * i) & 0xff
      greenMean(i) = rgb(3 * i + 1) & 0xff
      blueMean(i) = rgb(3 * i + 2) & 0xff
      size(i) = 1
      i += 1
    }

    // 4-connectivity edges in the reference's emission order
    // (srm.c:336-404): interior East+South per pixel, then the last
    // column's South edges, then the last row's East edges
    def delta(a: Int, b: Int): Int = {
      val dr = math.abs((rgb(3 * a) & 0xff) - (rgb(3 * b) & 0xff))
      val dg = math.abs((rgb(3 * a + 1) & 0xff) - (rgb(3 * b + 1) & 0xff))
      val db = math.abs((rgb(3 * a + 2) & 0xff) - (rgb(3 * b + 2) & 0xff))
      math.max(dr, math.max(dg, db))
    }
    val numEdges = if (n == 1) 0 else 2 * (w - 1) * (h - 1) + (h - 1) + (w - 1)
    val e1 = new Array[Int](numEdges)
    val e2 = new Array[Int](numEdges)
    val ew = new Array[Int](numEdges)
    var idx = 0
    var cnt = 0
    var ir = 0
    while (ir < h - 1) {
      var ic = 0
      while (ic < w - 1) {
        e1(idx) = cnt; e2(idx) = cnt + 1; ew(idx) = delta(cnt, cnt + 1); idx += 1
        e1(idx) = cnt; e2(idx) = cnt + w; ew(idx) = delta(cnt, cnt + w); idx += 1
        cnt += 1; ic += 1
      }
      cnt += 1; ir += 1
    }
    cnt = w - 1
    ir = 0
    while (ir < h - 1) {
      e1(idx) = cnt; e2(idx) = cnt + w; ew(idx) = delta(cnt, cnt + w)
      cnt += w; idx += 1; ir += 1
    }
    cnt = (h - 1) * w
    var ic = 0
    while (ic < w - 1) {
      e1(idx) = cnt; e2(idx) = cnt + 1; ew(idx) = delta(cnt, cnt + 1)
      cnt += 1; idx += 1; ic += 1
    }

    // stable 256-bucket counting sort by edge weight (srm.c:160)
    val order = new Array[Int](numEdges)
    val histo = new Array[Int](256)
    i = 0
    while (i < numEdges) { histo(ew(i)) += 1; i += 1 }
    val cum = new Array[Int](256)
    i = 1
    while (i < 256) { cum(i) = cum(i - 1) + histo(i - 1); i += 1 }
    i = 0
    while (i < numEdges) { order(cum(ew(i))) = i; cum(ew(i)) += 1; i += 1 }

    // merge phase (srm.c:407-450): Nock-Nielsen per-pair threshold
    val logDelta = 2.0 * math.log(6.0 * n)
    val threshFactor = 256.0 * 256.0 / (2.0 * q)
    def mergeRoots(reg1: Int, reg2: Int): Unit = {
      val root = union(reg1, reg2)
      val total = size(reg1) + size(reg2)
      redMean(root) = (size(reg1) * redMean(reg1) + size(reg2) * redMean(reg2)) / total
      greenMean(root) = (size(reg1) * greenMean(reg1) + size(reg2) * greenMean(reg2)) / total
      blueMean(root) = (size(reg1) * blueMean(reg1) + size(reg2) * blueMean(reg2)) / total
      size(root) = total
    }
    i = 0
    while (i < numEdges) {
      val e = order(i)
      val reg1 = find(e1(e))
      val reg2 = find(e2(e))
      if (reg1 != reg2) {
        val s1 = size(reg1).toDouble
        val s2 = size(reg2).toDouble
        val threshold = math.sqrt(threshFactor *
          ((math.min(256.0, s1) * math.log(1.0 + s1) + logDelta) / s1 +
            (math.min(256.0, s2) * math.log(1.0 + s2) + logDelta) / s2))
        if (math.abs(redMean(reg1) - redMean(reg2)) < threshold &&
            math.abs(greenMean(reg1) - greenMean(reg2)) < threshold &&
            math.abs(blueMean(reg1) - blueMean(reg2)) < threshold)
          mergeRoots(reg1, reg2)
      }
      i += 1
    }

    // small-region sweep (srm.c:452-481): left-neighbor merge when
    // either side is under size_factor × N pixels
    val minRegSize = (sizeFactor * n).toInt
    cnt = 0
    ir = 0
    while (ir < h) {
      cnt += 1
      var c = 1
      while (c < w) {
        val reg1 = find(cnt)
        val reg2 = find(cnt - 1)
        if (reg1 != reg2 && (size(reg2) < minRegSize || size(reg1) < minRegSize))
          mergeRoots(reg1, reg2)
        cnt += 1; c += 1
      }
      ir += 1
    }

    // scan-order relabel (srm.c:489-505)
    val mask = new Array[Int](n)
    val label = new Array[Int](n)
    java.util.Arrays.fill(label, -1)
    var nRegions = 0
    i = 0
    while (i < n) {
      val root = find(i)
      if (label(root) < 0) { label(root) = nRegions; nRegions += 1 }
      mask(i) = label(root)
      i += 1
    }
    (mask, nRegions)
  }

  /** image.c:198 pixel_rgb2hsv — the reference's byte-scaled HSV,
    * including its integer S scaling and float→byte hue truncation. */
  def rgb2hsv(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    var mx = r; var mn = r
    if (g > mx) mx = g
    if (g < mn) mn = g
    if (b > mx) mx = b
    if (b < mn) mn = b
    val delta = mx - mn
    if (mx == 0) return (0, 0, 0)
    val s = delta * 255 / mx
    if (delta == 0) return (0, s, mx)
    var hue =
      if (mx == r) (g - b).toFloat / delta
      else if (mx == g) 2.0f + (b - r).toFloat / delta
      else 4.0f + (r - g).toFloat / delta
    if (hue < 0) hue += 6.0f
    ((255 * hue / 6.0f).toInt, s, mx)
  }

  /** Streaming bounding-box accumulator — extract.c:44 box_t with
    * box_insert_pxl's blob-splitting rule (extract.c:89: a pixel that
    * would dilute the current box's fill density below 0.15 closes it
    * into the union box and starts a new blob). */
  private final class Box(x0: Int, y0: Int) {
    var a1 = x0; var b1 = y0; var a2 = x0 + 1; var b2 = y0 + 1
    // int in the reference (image.h:43) — the centroid division in
    // box_to_vec truncates, replicated below
    var cx: Long = x0; var cy: Long = y0
    var p1 = 1; var p2 = 0
    var u1 = 0; var v1 = 0; var u2 = 0; var v2 = 0

    def combine(): Unit = {
      if (p2 > 0) {
        if (a1 < u1) u1 = a1
        if (b1 < v1) v1 = b1
        if (a2 > u2) u2 = a2
        if (b2 > v2) v2 = b2
        p2 += p1
      } else { u1 = a1; v1 = b1; u2 = a2; v2 = b2; p2 = p1 }
      p1 = 0
    }

    def insert(x: Int, y: Int): Unit = {
      val sz = (a2 - a1) * (b2 - b1)
      val az = p1.toDouble / sz
      cx += x; cy += y
      if (az > 0.15) {
        if (x < a1) a1 = x else if (x >= a2) a2 = x + 1
        if (y < b1) b1 = y else if (y >= b2) b2 = y + 1
        p1 += 1
      } else {
        combine()
        a1 = x; b1 = y; a2 = x + 1; b2 = y + 1
        p1 = 1
      }
    }

    /** extract.c:123 box_to_vec — 5 shape features into vec[9..13];
      * the centroid divisions truncate (int fields, image.h:43). */
    def toVec(vec: Array[Double]): Unit = {
      val np = p1 + p2
      val lr = p2.toDouble / np
      cx /= np; cy /= np // integer division, as in the reference
      var dx = 0; var dy = 0; var rp = 0
      if (lr < 0.1) { dx = a2 - a1; dy = b2 - b1; rp = p1 }
      else { combine(); dx = u2 - u1; dy = v2 - v1; rp = np }
      val sz = dx * dy
      vec(9) = math.log(dy.toDouble / dx)
      vec(10) = rp.toDouble / sz
      vec(11) = math.log(sz.toDouble)
      vec(12) = cx
      vec(13) = cy
    }
  }

  /** Per-region descriptors over a segmentation — extract.c:261
    * image_extract_helper + img_map_to_seg + apply_weight. */
  def describe(img: ImageCodec.Image, mask: Array[Int], nRegions: Int): Array[Region] = {
    val w = img.width
    val h = img.height
    val n = w * h
    val rgb = img.rgb

    val rgnSz = new Array[Int](nRegions)
    val rSum = new Array[Long](nRegions)
    val gSum = new Array[Long](nRegions)
    val bSum = new Array[Long](nRegions)
    // HSV plane, converted once (extract.c consumes image_read_hsv's)
    val hsv = new Array[Int](3 * n)
    var i = 0
    while (i < n) {
      val (hh, ss, vv) = rgb2hsv(rgb(3 * i) & 0xff, rgb(3 * i + 1) & 0xff, rgb(3 * i + 2) & 0xff)
      hsv(3 * i) = hh; hsv(3 * i + 1) = ss; hsv(3 * i + 2) = vv
      i += 1
    }

    // boxes + sizes + integer channel sums, one scan-order pass
    val boxes = new Array[Box](nRegions)
    var row = 0
    while (row < h) {
      var colIdx = 0
      while (colIdx < w) {
        val p = row * w + colIdx
        val r = mask(p)
        rgnSz(r) += 1
        rSum(r) += rgb(3 * p) & 0xff
        gSum(r) += rgb(3 * p + 1) & 0xff
        bSum(r) += rgb(3 * p + 2) & 0xff
        if (boxes(r) == null) boxes(r) = new Box(row, colIdx)
        else boxes(r).insert(row, colIdx)
        colIdx += 1
      }
      row += 1
    }

    // HSV moments: mean, then central 2nd/3rd in a second pass
    // (extract.c:294-339), each scaled by /255
    val mean = Array.ofDim[Double](3, nRegions)
    i = 0
    while (i < n) {
      val r = mask(i)
      var c = 0
      while (c < 3) { mean(c)(r) += hsv(3 * i + c); c += 1 }
      i += 1
    }
    var c = 0
    while (c < 3) {
      var r = 0
      while (r < nRegions) { mean(c)(r) /= rgnSz(r); r += 1 }
      c += 1
    }
    val m2 = Array.ofDim[Double](3, nRegions)
    val m3 = Array.ofDim[Double](3, nRegions)
    i = 0
    while (i < n) {
      val r = mask(i)
      c = 0
      while (c < 3) {
        val v = hsv(3 * i + c) - mean(c)(r)
        m2(c)(r) += v * v
        m3(c)(r) += v * v * v
        c += 1
      }
      i += 1
    }

    // weights: √size normalized (extract.c:221 img_map_to_seg)
    var wNorm = 0.0
    var r = 0
    while (r < nRegions) { wNorm += math.sqrt(rgnSz(r).toDouble); r += 1 }

    Array.tabulate(nRegions) { rg =>
      val vec = new Array[Double](Dim)
      c = 0
      while (c < 3) {
        vec(3 * c) = mean(c)(rg) / 255.0
        vec(3 * c + 1) = math.sqrt(m2(c)(rg) / rgnSz(rg)) / 255.0
        vec(3 * c + 2) = math.cbrt(m3(c)(rg) / rgnSz(rg)) / 255.0
        c += 1
      }
      boxes(rg).toVec(vec)
      i = 0
      while (i < Dim) { vec(i) *= dw(i); i += 1 }
      Region(rgnSz(rg), rSum(rg), gSum(rg), bSum(rg), vec,
        math.sqrt(rgnSz(rg).toDouble) / wNorm)
    }
  }

  /** t_seg + t_extract composed: segment, then describe. */
  def segmentAndDescribe(img: ImageCodec.Image,
                         q: Double = DefaultQ,
                         sizeFactor: Double = DefaultSizeFactor): Array[Region] = {
    val (mask, nRegions) = segment(img, q, sizeFactor)
    describe(img, mask, nRegions)
  }
}
