package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Chunker

/** Property-style tests for the content-defined chunker over many
  * seeded random inputs (no Spark needed). */
class ChunkerPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(20260812L)
  private val cases: Seq[Array[Byte]] =
    (0 until 200).map { _ =>
      val n = rng.nextInt(4000)
      val a = new Array[Byte](n)
      rng.nextBytes(a)
      a
    } ++ Seq(Array.emptyByteArray, Array.fill[Byte](300)(7),
      Array.tabulate[Byte](1000)(i => (i % 9).toByte))

  test("chunks tile the input exactly: contiguous, complete, ordered") {
    cases.foreach { bytes =>
      val cs = Chunker.chunk(bytes)
      assert(cs.map(_.length).sum == bytes.length)
      cs.zipWithIndex.foreach { case (c, i) => assert(c.chunk_idx == i) }
      var expect = 0
      cs.foreach { c =>
        assert(c.offset == expect && c.length > 0)
        expect += c.length
      }
    }
  }

  test("non-final chunks respect min and max size") {
    cases.foreach { bytes =>
      val cs = Chunker.chunk(bytes)
      cs.dropRight(1).foreach(c => assert(c.length >= 32 && c.length <= 256))
      cs.lastOption.foreach(c => assert(c.length <= 256))
    }
  }

  test("chunking is a pure function of content") {
    cases.foreach { bytes =>
      assert(Chunker.chunk(bytes) == Chunker.chunk(bytes.clone()))
    }
  }

  test("identical content yields identical chunk ids across containers") {
    cases.filter(_.length >= 512).foreach { bytes =>
      val doubled = bytes ++ bytes
      val single = Chunker.chunk(bytes).map(_.chunk_sha).toSet
      val both = Chunker.chunk(doubled).map(_.chunk_sha).toSet
      assert(both.intersect(single).nonEmpty)
    }
  }

  test("compression size is positive and bounded") {
    cases.filter(_.nonEmpty).foreach { bytes =>
      val n = Chunker.deflatedLen(bytes, 0, bytes.length)
      assert(n > 0 && n <= bytes.length + 64)
    }
  }

  test("codec menu: none is identity, gzip adds fixed framing over deflate-raw") {
    cases.filter(_.nonEmpty).foreach { bytes =>
      val len = bytes.length
      assert(Chunker.compressedLen(bytes, 0, len, "none") == len)
      val d = Chunker.compressedLen(bytes, 0, len, "deflate")
      val g = Chunker.compressedLen(bytes, 0, len, "gzip")
      assert(d > 0 && g > d) // gzip framing (18B) > zlib framing (6B)
      assert(g <= len + 64 + 18)
      // bzip2: always positive; unlike deflate (stored-block fallback)
      // its BWT+MTF coder can EXPAND incompressible input — observed
      // ~1.22x on random bytes, so the sanity bound is 1.25x + header
      val b = Chunker.compressedLen(bytes, 0, len, "bzip2")
      assert(b > 0 && b <= len + len / 4 + 256)
    }
    intercept[IllegalArgumentException] {
      Chunker.compressedLen(Array[Byte](1), 0, 1, "zstd")
    }
  }

  test("deflate bytes round-trip through inflate; length matches deflatedLen") {
    cases.foreach { bytes =>
      // interior slice exercises the (off, len) addressing
      val off = math.min(1, bytes.length)
      val len = math.max(0, bytes.length - off)
      val comp = Chunker.deflate(bytes, off, len)
      assert(comp.length == Chunker.deflatedLen(bytes, off, len))
      assert(Chunker.inflate(comp).toSeq == bytes.slice(off, off + len).toSeq)
    }
    // truncated stream fails loudly, not silently short
    val comp = Chunker.deflate("hello hello hello".getBytes, 0, 17)
    intercept[IllegalStateException] {
      Chunker.inflate(comp.dropRight(3))
    }
  }

  /** The shipped boundaries() skips straight to minSize-Window past
    * each cut (hash warm-up); this naive loop rolls every byte from
    * every chunk start — the original r1-r9 formulation. The two must
    * cut identically for ALL params, including minSize ≤ window where
    * the skip degenerates. */
  private def naiveBoundaries(bytes: Array[Byte], minSize: Int, maxSize: Int,
                              maskBits: Int): Seq[Int] = {
    val T = {
      val f = Chunker.getClass.getDeclaredField("T")
      f.setAccessible(true)
      f.get(Chunker).asInstanceOf[Array[Long]]
    }
    val W = 16
    val mask = (1L << maskBits) - 1
    val out = Seq.newBuilder[Int]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = java.lang.Long.rotateLeft(h, 1) ^ T(bytes(i) & 0xff)
      if (i - start >= W)
        h ^= java.lang.Long.rotateLeft(T(bytes(i - W) & 0xff), W)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == mask) || len >= maxSize) {
        out += i + 1; start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < bytes.length) out += bytes.length
    out.result()
  }

  test("skip-ahead boundaries are identical to the naive full-roll loop") {
    val params = Seq((32, 256, 6), (8, 64, 4), (2048, 65536, 12), (17, 40, 3))
    for ((mn, mx, mb) <- params; bytes <- cases) {
      assert(Chunker.boundaries(bytes, mn, mx, mb).toSeq ==
        naiveBoundaries(bytes, mn, mx, mb),
        s"params (min=$mn max=$mx maskBits=$mb) n=${bytes.length}")
    }
  }

  // ---- Rabin anchor option (rabin.c:45 semantics) --------------------

  test("rabin fingerprint equals GF(2) long division by the monic polynomial") {
    // independent derivation: the iterated byte-fold is the message
    // polynomial reduced mod m = x^32 ⊕ RabinIrr. Long division over
    // BigInt bit ops shares no code with the table machinery.
    val m = (BigInt(1) << 32) | (BigInt(graft.functions.Chunker.RabinIrr) & 0xFFFFFFFFL)
    def gf2Mod(v0: BigInt): BigInt = {
      var v = v0
      while (v.bitLength >= m.bitLength) v = v ^ (m << (v.bitLength - m.bitLength))
      v
    }
    for (len <- Seq(0, 1, 5, 31, 32, 33, 100); trial <- 0 until 20) {
      val bytes = new Array[Byte](len)
      rng.nextBytes(bytes)
      val poly = bytes.foldLeft(BigInt(0))((acc, b) => (acc << 8) | (b & 0xff))
      val expected = gf2Mod(poly).toLong & 0xFFFFFFFFL
      val got = graft.functions.Chunker.rabinFp(bytes).toLong & 0xFFFFFFFFL
      assert(got == expected, s"len=$len trial=$trial")
    }
  }

  /** Transliteration of iterated rabinseg (rabin.c:71): fresh h per
    * segment, no test before the 32-byte window fills, cut where
    * (h & mask) == 0 — the independent reference for the shipped
    * skip-ahead loop. */
  private def naiveRabinSeg(bytes: Array[Byte], maskBits: Int): Seq[Int] = {
    import graft.functions.Chunker.{rabinTab, rabinWinTab, RabinWindow}
    val mask = (1 << maskBits) - 1
    def seg(from: Int): Int = { // returns cut position (exclusive end)
      val n = bytes.length
      if (n - from < RabinWindow) return n
      var h = 0
      var i = from
      while (i < from + RabinWindow) {
        h = ((h << 8) | (bytes(i) & 0xff)) ^ rabinTab(h >>> 24)
        i += 1
      }
      if ((h & mask) == 0) return i
      while (i < n) {
        h ^= rabinWinTab(bytes(i - RabinWindow) & 0xff)
        val x = h >>> 24
        h = ((h << 8) | (bytes(i) & 0xff)) ^ rabinTab(x)
        i += 1
        if ((h & mask) == 0) return i
      }
      n
    }
    val out = Seq.newBuilder[Int]
    var start = 0
    while (start < bytes.length) {
      val c = seg(start)
      out += c
      start = c
    }
    out.result()
  }

  test("rabin boundaries reproduce iterated rabinseg exactly at the rabin.c params") {
    // rabin.c constants: 32-byte window (the effective min), mask
    // 0xfff (maskBits 12), no max — large maxSize (overflow-safe)
    cases.foreach { bytes =>
      assert(graft.functions.Chunker
        .rabinBoundaries(bytes, 32, Int.MaxValue, 12).toSeq ==
        naiveRabinSeg(bytes, 12), s"n=${bytes.length}")
    }
    // denser anchors exercise multi-chunk inputs at test sizes
    cases.foreach { bytes =>
      assert(graft.functions.Chunker
        .rabinBoundaries(bytes, 32, Int.MaxValue, 6).toSeq ==
        naiveRabinSeg(bytes, 6), s"n=${bytes.length} maskBits=6")
    }
  }

  test("rabin boundaries: pinned cut set on a fixed input; knobs honored; anchor menu") {
    val fixed = Array.tabulate[Byte](4096)(i => ((i * 131) ^ (i >> 3)).toByte)
    val cuts = graft.functions.Chunker.rabinBoundaries(fixed, 32, Int.MaxValue, 6)
    assert(cuts.toSeq == naiveRabinSeg(fixed, 6)) // cross-check once more
    assert(cuts.last == 4096 && cuts.forall(c => c > 0 && c <= 4096))
    assert(cuts.toSeq == cuts.toSeq.sorted && cuts.distinct.length == cuts.length)
    // min/max knobs generalize the reference semantics
    val bounded = graft.functions.Chunker.rabinBoundaries(fixed, 64, 512, 6)
    val lens = bounded.toSeq.zip(0 +: bounded.toSeq.dropRight(1)).map { case (e, s) => e - s }
    lens.dropRight(1).foreach(l => assert(l >= 64 && l <= 512))
    assert(lens.last <= 512)
    // dispatcher: same cuts through the anchor menu, unknown rejected
    assert(graft.functions.Chunker.boundaries(fixed, 64, 512, 6, "rabin").toSeq == bounded.toSeq)
    assert(graft.functions.Chunker.boundaries(fixed, 64, 512, 6, "buzhash").toSeq ==
      graft.functions.Chunker.boundaries(fixed, 64, 512, 6).toSeq)
    intercept[IllegalArgumentException] {
      graft.functions.Chunker.boundaries(fixed, 64, 512, 6, "gear")
    }
  }

  test("bzip2 length equals an independently framed commons-compress stream") {
    cases.filter(_.nonEmpty).foreach { bytes =>
      val buf = new java.io.ByteArrayOutputStream()
      val bz = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(buf, 1)
      bz.write(bytes, 0, bytes.length)
      bz.close()
      assert(Chunker.bzip2Len(bytes, 0, bytes.length) == buf.size())
    }
  }

  test("length-bounded boundaries ignore stale bytes past n (buffer reuse)") {
    // the fused scan (BinaryFiles.chunkDirDirect) reuses ONE buffer
    // across files, so bytes(n until buf.length) hold the PREVIOUS
    // file's tail — cuts over (buf, n) must equal cuts over an exact
    // copy, for both anchors, or buffer reuse silently corrupts chunks
    cases.filter(_.nonEmpty).foreach { bytes =>
      val padded = bytes ++ Array.fill[Byte](517)(rng.nextInt.toByte)
      for (anchor <- Chunker.Anchors) {
        val exact = Chunker.boundaries(bytes, 32, 256, 5, anchor).toSeq
        val bounded = Chunker.boundaries(padded, bytes.length, 32, 256, 5, anchor).toSeq
        assert(bounded == exact, s"anchor=$anchor n=${bytes.length}")
      }
    }
    // and the full-buffer overloads stay the n = length special case
    val b = cases.find(_.length > 600).get
    assert(Chunker.boundaries(b, 32, 256, 5).toSeq ==
      Chunker.boundaries(b, b.length, 32, 256, 5).toSeq)
    assert(Chunker.rabinBoundaries(b, 32, 256, 5).toSeq ==
      Chunker.rabinBoundaries(b, b.length, 32, 256, 5).toSeq)
  }
}
