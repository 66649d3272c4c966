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
}
