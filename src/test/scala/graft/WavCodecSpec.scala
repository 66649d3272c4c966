package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WavCodec

class WavCodecSpec extends AnyFunSuite {

  test("WAV round-trip is sample-exact, including extreme values") {
    val r = new scala.util.Random(13)
    for (n <- Seq(1, 2, 63, 64, 200)) {
      val samples = Array.fill(n)(r.nextInt(65536).toShort)
      // force the boundary values in
      if (n >= 3) { samples(0) = Short.MinValue; samples(1) = Short.MaxValue; samples(2) = 0 }
      val bytes = WavCodec.encodeWav(WavCodec.Wav(16000, samples))
      assert(bytes.length == WavCodec.encodedSize(n))
      val back = WavCodec.decodeWav(bytes)
      assert(back.sampleRate == 16000)
      assert(back.samples.toSeq == samples.toSeq, s"round-trip drift at n=$n")
    }
  }

  test("stored bytes are little-endian PCM after a canonical 44-byte header") {
    val bytes = WavCodec.encodeWav(WavCodec.Wav(8000, Array[Short](0x0102, -2)))
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    // 0x0102 -> 02 01; -2 = 0xfffe -> fe ff
    assert(bytes.slice(44, 48).toSeq ==
      Seq[Byte](0x02, 0x01, 0xfe.toByte, 0xff.toByte))
  }

  test("decoder walks unknown chunks (LIST before data) with odd-size padding") {
    val canonical = WavCodec.encodeWav(WavCodec.Wav(12000, Array[Short](7, -7, 300)))
    // splice a 5-byte LIST chunk (odd size -> 1 pad byte) between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = canonical.slice(0, 36) ++ extra ++ canonical.drop(36)
    // patch the RIFF size field
    val out = spliced.clone()
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    val back = WavCodec.decodeWav(out)
    assert(back.sampleRate == 12000)
    assert(back.samples.toSeq == Seq[Short](7, -7, 300))
  }

  test("malformed input fails with diagnostics, not garbage") {
    val good = WavCodec.encodeWav(WavCodec.Wav(8000, Array[Short](1, 2)))
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](WavCodec.decodeWav(badMagic))
    // truncated buffer
    intercept[IllegalArgumentException](WavCodec.decodeWav(good.take(30)))
    // chunk size overrunning the buffer
    val overrun = good.clone(); overrun(40) = 127
    intercept[IllegalArgumentException](WavCodec.decodeWav(overrun))
    // stereo rejected
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](WavCodec.decodeWav(stereo))
  }
}
