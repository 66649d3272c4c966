package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.zip.Deflater

/** Content-defined chunking + per-chunk compression.
  *
  * Spark-first re-expression of the reference Dedup pipeline's
  * Fragment/FragmentRefine/Deduplicate/Compress stages
  * (/root/reference/apps/dedup/src/encoder.c:999, :825, :587 and
  * rabin.c rolling-fingerprint segmentation): a Buzhash rolling hash
  * cuts chunk boundaries at content-determined positions, each chunk
  * gets a SHA-256 identity (the reference uses SHA1 per chunk,
  * dedupdef.h) and a Deflate-compressed size (the reference
  * compresses unique chunks with gzip/bzip2).
  *
  * One pass per document, embarrassingly parallel — the distributed
  * dedup (hash → first-writer-wins) happens declaratively on the
  * resulting chunk table, not here.
  */
object Chunker {

  case class Chunk(chunk_idx: Int, offset: Int, length: Int, chunk_sha: String)

  /** Buzhash substitution table — seeded, identical everywhere. */
  private val T: Array[Long] = {
    val r = new java.util.Random(0x42L)
    Array.fill(256)(r.nextLong())
  }

  private val Window = 16
  private def rotl(x: Long, n: Int): Long = java.lang.Long.rotateLeft(x, n)

  /** Cut `bytes` into content-defined chunks.
    *
    * @param minSize  no boundary before this many bytes in a chunk
    * @param maxSize  force a boundary at this size
    * @param maskBits boundary when low `maskBits` bits of the rolling
    *                 hash are all ones → expected chunk ≈ 2^maskBits
    */
  def chunk(bytes: Array[Byte], minSize: Int = 32, maxSize: Int = 256,
            maskBits: Int = 6): Seq[Chunk] = {
    val mask = (1L << maskBits) - 1
    val out = Vector.newBuilder[Chunk]
    var start = 0
    var idx = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val in = bytes(i) & 0xff
      h = rotl(h, 1) ^ T(in)
      if (i - start >= Window) {
        val outByte = bytes(i - Window) & 0xff
        h ^= rotl(T(outByte), Window)
      }
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == mask) || len >= maxSize) {
        out += mkChunk(bytes, idx, start, len)
        idx += 1; start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < bytes.length)
      out += mkChunk(bytes, idx, start, bytes.length - start)
    out.result()
  }

  def chunkText(text: String): Seq[Chunk] =
    chunk(text.getBytes(StandardCharsets.UTF_8))

  private def mkChunk(bytes: Array[Byte], idx: Int, off: Int, len: Int): Chunk =
    Chunk(idx, off, len, sha256Hex(bytes, off, len))

  def sha256Hex(bytes: Array[Byte], off: Int, len: Int): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(bytes, off, len)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Deflate-compressed size of a byte range (level 6, zlib-wrapped —
    * mirrors the reference's per-chunk gzip of unique chunks). */
  def deflatedLen(bytes: Array[Byte], off: Int, len: Int): Int = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(bytes, off, len)
    d.finish()
    val buf = new Array[Byte](len + 64)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  /** Deflate-compressed BYTES of a range (same codec/level as
    * [[deflatedLen]]) — for consumers that write a real archive
    * (RefCompare's head-to-head vs the reference binary), not just
    * account for the size. */
  def deflate(bytes: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(bytes, off, len)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, len / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Inverse of [[deflate]] — the archive restore path. */
  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      // a call can return 0 AND finish (empty payload: header+trailer
      // consumed in one step) — only 0-progress while still unfinished
      // and starved of input means truncation
      if (n == 0 && !inf.finished() && inf.needsInput())
        throw new IllegalStateException("inflate: truncated deflate stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Gzip-framed size (10-byte header + deflate stream + 8-byte
    * trailer), via a counting sink — no payload buffering. */
  def gzipLen(bytes: Array[Byte], off: Int, len: Int): Int = {
    val counter = new java.io.OutputStream {
      var n = 0
      override def write(b: Int): Unit = n += 1
      override def write(b: Array[Byte], o: Int, l: Int): Unit = n += l
    }
    val gz = new java.util.zip.GZIPOutputStream(counter)
    gz.write(bytes, off, len)
    gz.close()
    counter.n
  }

  /** Bzip2-framed size via commons-compress (on the Spark classpath)
    * through the same counting sink as gzip — completes the
    * reference's codec menu (encoder.c:587 selects gzip OR bzip2 at
    * runtime). Block size 1 (100 kB): chunks are ≤ a few hundred
    * bytes, so larger blocks only waste allocation. */
  def bzip2Len(bytes: Array[Byte], off: Int, len: Int): Int = {
    val counter = new java.io.OutputStream {
      var n = 0
      override def write(b: Int): Unit = n += 1
      override def write(b: Array[Byte], o: Int, l: Int): Unit = n += l
    }
    val bz = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(counter, 1)
    bz.write(bytes, off, len)
    bz.close()
    counter.n
  }

  /** Codecs the reference's Compress stage selects among
    * (encoder.c:587 COMPRESS_GZIP / COMPRESS_BZIP2 / COMPRESS_NONE;
    * deflate is gzip's stream without the framing). */
  val Codecs: Set[String] = Set("none", "deflate", "gzip", "bzip2")

  def compressedLen(bytes: Array[Byte], off: Int, len: Int, codec: String): Int =
    codec match {
      case "deflate" => deflatedLen(bytes, off, len)
      case "gzip"    => gzipLen(bytes, off, len)
      case "bzip2"   => bzip2Len(bytes, off, len)
      case "none"    => len
      case c => throw new IllegalArgumentException(
        s"unknown codec '$c' (expected one of ${Codecs.mkString("/")})")
    }
}
