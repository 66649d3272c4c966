package graft.functions

/** Pure-JVM WAV (RIFF / PCM16LE mono) encoder/decoder — the audio
  * analog of [[ImageCodec]] for the multimodal feature stage.
  *
  * No audio libraries exist in this environment, so payload columns
  * are SYNTHESIZED (deterministically, from content digests) — but
  * they are genuine WAV files and this decoder is a genuine RIFF
  * parser: it validates the RIFF/WAVE magic, WALKS the chunk list
  * (skipping unknown chunks and honoring the odd-size pad byte, so
  * files with LIST/INFO metadata parse fine), checks the fmt chunk's
  * PCM tag / channel count / bit depth, and reads little-endian
  * 16-bit samples from the data chunk. Swapping the synthesized
  * column for scanned files changes nothing downstream.
  */
object WavCodec {

  final case class Wav(sampleRate: Int, samples: Array[Short])

  private val FmtChunkSize = 16
  private val HeaderSize = 44 // RIFF(12) + fmt(8+16) + data header(8)

  /** Total encoded size for n mono 16-bit samples (canonical layout,
    * no extra chunks). */
  def encodedSize(nSamples: Int): Int = HeaderSize + 2 * nSamples

  private def putIntLE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v & 0xff).toByte
    buf(off + 1) = ((v >>> 8) & 0xff).toByte
    buf(off + 2) = ((v >>> 16) & 0xff).toByte
    buf(off + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def putShortLE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v & 0xff).toByte
    buf(off + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def getIntLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8) |
      ((buf(off + 2) & 0xff) << 16) | ((buf(off + 3) & 0xff) << 24)

  private def getShortLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8)

  private def tag(buf: Array[Byte], off: Int): String =
    new String(buf, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode mono 16-bit samples as a canonical 44-byte-header WAV. */
  def encodeWav(wav: Wav): Array[Byte] = {
    val out = new Array[Byte](encodedSize(wav.samples.length))
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putIntLE(out, 4, out.length - 8)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putIntLE(out, 16, FmtChunkSize)
    putShortLE(out, 20, 1) // PCM
    putShortLE(out, 22, 1) // mono
    putIntLE(out, 24, wav.sampleRate)
    putIntLE(out, 28, wav.sampleRate * 2) // byte rate
    putShortLE(out, 32, 2) // block align
    putShortLE(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putIntLE(out, 40, 2 * wav.samples.length)
    var i = 0
    while (i < wav.samples.length) {
      putShortLE(out, HeaderSize + 2 * i, wav.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a PCM16LE mono WAV by walking the RIFF chunk list.
    * Validates magic and format, skips unknown chunks (with the RIFF
    * odd-size pad rule), fails with a diagnostic on malformed input. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= HeaderSize, s"truncated WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", "bad RIFF magic")
    require(tag(bytes, 8) == "WAVE", "bad WAVE tag")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = tag(bytes, off)
      val size = getIntLE(bytes, off + 4)
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"chunk '$id' overruns buffer: size $size at offset $off")
      id match {
        case "fmt " =>
          require(size >= FmtChunkSize, s"fmt chunk too small: $size")
          require(getShortLE(bytes, off + 8) == 1, "only PCM supported")
          require(getShortLE(bytes, off + 10) == 1, "only mono supported")
          sampleRate = getIntLE(bytes, off + 12)
          require(sampleRate > 0, s"bad sample rate $sampleRate")
          require(getShortLE(bytes, off + 22) == 16, "only 16-bit supported")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(size % 2 == 0, s"odd data chunk size $size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = getShortLE(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
        case _ => // unknown chunk (LIST, fact, ...) — skip
      }
      off += 8 + size + (size & 1) // RIFF pads odd chunks to even offsets
    }
    require(samples != null, "no data chunk found")
    Wav(sampleRate, samples)
  }
}
