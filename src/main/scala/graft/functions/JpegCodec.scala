package graft.functions

/** Pure-JVM baseline sequential JPEG encoder/decoder — the
  * reference's actual input format (ferret ingests JPEG via libjpeg:
  * apps/ferret/src/image/image.c image_read_rgb → magick/libjpeg),
  * which previously had no counterpart here. Like [[ImageCodec]] and
  * [[WavCodec]], the payloads are synthesized but the FORMAT is real:
  * the encoder emits standards-conformant baseline JFIF streams
  * (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, Annex K quantization + Huffman
  * tables, IJG quality scaling, 0xFF byte stuffing) and the decoder
  * is a genuine parser (marker walk, DQT/DHT table loads, canonical
  * Huffman decode, dequantize, de-zigzag, IDCT, level shift, YCbCr→
  * RGB) that fails malformed input with a diagnostic.
  *
  * Supported subset (what the encoder emits): baseline sequential
  * DCT, 8-bit, grayscale (1 component) or YCbCr 4:4:4 (3 components,
  * no subsampling), no restart intervals, no progressive/arithmetic
  * coding. The decoder validates and rejects everything else loudly
  * rather than producing garbage.
  *
  * Determinism anchor for cross-engine verification: a GRAYSCALE
  * image (Cb=Cr=128 exactly, Y=value exactly — the JFIF color
  * transform is identity on gray) whose flat regions align to the
  * 8×8 block grid round-trips EXACTLY at quality 100 (flat block ⇒
  * only the DC coefficient is nonzero; luminance DC quant at q100 is
  * 1 ⇒ lossless through quantize/dequantize; IDCT of a DC-only block
  * is exactly constant) — mm_jpeg builds its value oracle on this.
  */
object JpegCodec {

  // ---- constants (ITU-T T.81 Annex K — public standard tables) --------

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K Huffman specs: (bits per code length 1..16, symbol values)
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** IJG quality scaling (libjpeg jcparam.c semantics — public):
    * quality 1..100 → table scale factor; entries clamped to [1,255]. */
  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  // ---- DCT (double precision, exact enough that flat blocks are
  //      bit-stable through quantize/round) --------------------------

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def cFac(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 8×8 DCT of level-shifted samples. */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          val cv = CosTable(v * 8 + y)
          while (x < 8) {
            s += in(y * 8 + x) * CosTable(u * 8 + x) * cv
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * cFac(u) * cFac(v) * s
        u += 1
      }
      v += 1
    }
  }

  /** Inverse 8×8 DCT. */
  private def idct(in: Array[Double], out: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          val cv = CosTable(v * 8 + y)
          while (u < 8) {
            s += cFac(u) * cFac(v) * in(v * 8 + u) * CosTable(u * 8 + x) * cv
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
  }

  // ---- bit I/O with 0xFF stuffing --------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "JPEG: entropy data truncated")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "JPEG: entropy data truncated at FF")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException(
            f"JPEG: unexpected marker FF$m%02x inside entropy data (restart intervals unsupported)")
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  // ---- Huffman tables --------------------------------------------------

  /** Canonical code assignment (T.81 C.2): codes of ascending length,
    * ascending symbol order within a length. */
  private final class HuffEncoder(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val size = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l)) {
          code(vals(k)) = c
          size(vals(k)) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    // min/max code value and value-table offset per length
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = c
          c += bits(l); k += bits(l)
          maxCode(l) = c - 1
        }
        c <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var c = r.bit()
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || c > maxCode(l))) {
        c = (c << 1) | r.bit()
        l += 1
      }
      require(l <= 16, "JPEG: invalid Huffman code")
      vals(valPtr(l) + c - minCode(l))
    }
  }

  /** Magnitude category (T.81 F.1.2.1). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Sign-extend a `t`-bit magnitude value (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- encoder ---------------------------------------------------------

  /** Encode top-down pixels as baseline JFIF. `gray` selects a
    * 1-component stream (input still RGB; R=G=B expected but only R
    * is read); otherwise YCbCr 4:4:4. */
  def encodeJpeg(img: ImageCodec.Image, quality: Int = 90,
                 gray: Boolean = false): Array[Byte] = {
    val w = img.width
    val h = img.height
    val lumaQ = scaledQuant(StdLumaQuant, quality)
    val chromaQ = scaledQuant(StdChromaQuant, quality)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    // APP0 / JFIF
    marker(0xe0); u16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0))
    u8(1); u8(1) // version 1.1
    u8(0); u16(1); u16(1) // aspect ratio 1:1, no density units
    u8(0); u8(0) // no thumbnail
    // DQT (table 0 = luma; table 1 = chroma when color)
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xdb); u16(2 + 1 + 64); u8(id)
      var i = 0
      while (i < 64) { u8(t(ZigZag(i))); i += 1 }
    }
    dqt(0, lumaQ)
    if (!gray) dqt(1, chromaQ)
    // SOF0
    val nComp = if (gray) 1 else 3
    marker(0xc0); u16(8 + 3 * nComp); u8(8); u16(h); u16(w); u8(nComp)
    var ci = 0
    while (ci < nComp) {
      u8(ci + 1) // component id
      u8(0x11) // 1x1 sampling (4:4:4)
      u8(if (ci == 0) 0 else 1) // quant table
      ci += 1
    }
    // DHT
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      var l = 1
      while (l <= 16) { u8(bits(l)); l += 1 }
      vals.foreach(u8)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    if (!gray) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    // SOS
    marker(0xda); u16(6 + 2 * nComp); u8(nComp)
    ci = 0
    while (ci < nComp) {
      u8(ci + 1)
      u8(if (ci == 0) 0x00 else 0x11) // DC/AC table ids
      ci += 1
    }
    u8(0); u8(63); u8(0) // spectral selection (baseline fixed)

    // component planes, level-shifted; edge-replicated to 8k × 8k
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val planes = new Array[Array[Double]](nComp)
    var c = 0
    while (c < nComp) { planes(c) = new Array[Double](bw * 8 * bh * 8); c += 1 }
    var y = 0
    while (y < bh * 8) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < bw * 8) {
        val sx = math.min(x, w - 1)
        val p = 3 * (sy * w + sx)
        val r = img.rgb(p) & 0xff
        val g = img.rgb(p + 1) & 0xff
        val b = img.rgb(p + 2) & 0xff
        if (gray) planes(0)(y * bw * 8 + x) = r - 128.0
        else {
          // JFIF YCbCr
          planes(0)(y * bw * 8 + x) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          planes(1)(y * bw * 8 + x) = -0.168736 * r - 0.331264 * g + 0.5 * b
          planes(2)(y * bw * 8 + x) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }

    val dcEnc = Array(new HuffEncoder(DcLumaBits, DcLumaVals),
      new HuffEncoder(DcChromaBits, DcChromaVals))
    val acEnc = Array(new HuffEncoder(AcLumaBits, AcLumaVals),
      new HuffEncoder(AcChromaBits, AcChromaVals))
    val bwr = new BitWriter(out)
    val blk = new Array[Double](64)
    val coef = new Array[Double](64)
    val quant = new Array[Int](64)
    val prevDc = new Array[Int](nComp)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        c = 0
        while (c < nComp) {
          val qt = if (c == 0) lumaQ else chromaQ
          val ti = if (c == 0) 0 else 1
          var i = 0
          while (i < 64) {
            blk(i) = planes(c)((by * 8 + i / 8) * bw * 8 + bx * 8 + i % 8)
            i += 1
          }
          fdct(blk, coef)
          i = 0
          while (i < 64) {
            quant(i) = math.round(coef(ZigZag(i)) / qt(ZigZag(i))).toInt
            i += 1
          }
          // DC
          val diff = quant(0) - prevDc(c)
          prevDc(c) = quant(0)
          val t = category(diff)
          bwr.put(dcEnc(ti).code(t), dcEnc(ti).size(t))
          if (t > 0) bwr.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          // AC: run-length of zeros + category
          var run = 0
          i = 1
          while (i < 64) {
            if (quant(i) == 0) run += 1
            else {
              while (run > 15) { // ZRL
                bwr.put(acEnc(ti).code(0xf0), acEnc(ti).size(0xf0))
                run -= 16
              }
              val at = category(quant(i))
              val sym = (run << 4) | at
              bwr.put(acEnc(ti).code(sym), acEnc(ti).size(sym))
              bwr.put(if (quant(i) < 0) quant(i) + (1 << at) - 1 else quant(i), at)
              run = 0
            }
            i += 1
          }
          if (run > 0) bwr.put(acEnc(ti).code(0x00), acEnc(ti).size(0x00)) // EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bwr.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ---------------------------------------------------------

  /** Decode a baseline JPEG (the encoder's subset: 8-bit, 1 or 3
    * components, 1x1 sampling, no restarts) into top-down RGB. */
  def decodeJpeg(bytes: Array[Byte]): ImageCodec.Image = {
    require(bytes.length >= 4, s"truncated JPEG: ${bytes.length} bytes")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "bad JPEG magic (no SOI)")
    var pos = 2
    def u8(): Int = { require(pos < bytes.length, "JPEG: truncated"); val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffDecoder](4)
    val acTables = new Array[HuffDecoder](4)
    var width = 0
    var height = 0
    var nComp = 0
    val compQuant = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var sosSeen = false

    while (!sosSeen) {
      var m = u8()
      require(m == 0xff, f"JPEG: expected marker, got $m%02x at ${pos - 1}")
      m = u8()
      m match {
        case 0xdb => // DQT (possibly several tables in one segment)
          var len = u16() - 2
          while (len > 0) {
            val pq = u8()
            require((pq >> 4) == 0, "JPEG: 16-bit quant tables unsupported")
            val id = pq & 0x0f
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(ZigZag(i)) = u8(); i += 1 }
            quantTables(id) = t
            len -= 65
          }
        case 0xc0 => // SOF0 baseline
          val len = u16()
          require(u8() == 8, "JPEG: only 8-bit precision supported")
          height = u16(); width = u16()
          nComp = u8()
          require(nComp == 1 || nComp == 3,
            s"JPEG: $nComp components unsupported (1 or 3)")
          require(len == 8 + 3 * nComp, "JPEG: bad SOF0 length")
          var i = 0
          while (i < nComp) {
            u8() // component id (positional mapping assumed, as emitted)
            val hv = u8()
            require(hv == 0x11,
              f"JPEG: subsampling $hv%02x unsupported (4:4:4 only)")
            compQuant(i) = u8()
            i += 1
          }
        case 0xc4 => // DHT
          var len = u16() - 2
          while (len > 0) {
            val tc = u8()
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(); total += bits(l); l += 1 }
            val vals = new Array[Int](total)
            var i = 0
            while (i < total) { vals(i) = u8(); i += 1 }
            val dec = new HuffDecoder(bits, vals)
            if ((tc >> 4) == 0) dcTables(tc & 0x0f) = dec
            else acTables(tc & 0x0f) = dec
            len -= 1 + 16 + total
          }
        case 0xda => // SOS
          u16()
          val ns = u8()
          require(ns == nComp, "JPEG: SOS component count mismatch")
          var i = 0
          while (i < ns) {
            u8()
            val tt = u8()
            compDc(i) = tt >> 4
            compAc(i) = tt & 0x0f
            i += 1
          }
          u8(); u8(); u8() // spectral selection
          sosSeen = true
        case 0xc2 => throw new IllegalArgumentException(
          "JPEG: progressive DCT unsupported (baseline only)")
        case 0xdd => throw new IllegalArgumentException(
          "JPEG: restart intervals unsupported")
        case x if x >= 0xe0 && x <= 0xef => // APPn
          // NB: u16() advances pos, so it must be read into a local
          // BEFORE the +=: `pos += u16() - 2` snapshots the OLD pos
          val skipApp = u16() - 2; pos += skipApp
        case 0xfe => // COM
          val skipCom = u16() - 2; pos += skipCom
        case x => throw new IllegalArgumentException(
          f"JPEG: unsupported marker FF$x%02x")
      }
    }
    require(width > 0 && height > 0, "JPEG: no SOF before SOS")
    require(width <= (1 << 16) && height <= (1 << 16), "JPEG: bad dims")

    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val planes = Array.fill(nComp)(new Array[Double](bw * 8 * bh * 8))
    val r = new BitReader(bytes, pos)
    val prevDc = new Array[Int](nComp)
    val coef = new Array[Double](64)
    val pix = new Array[Double](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var c = 0
        while (c < nComp) {
          val qt = quantTables(compQuant(c))
          require(qt != null, "JPEG: SOS before its DQT")
          val dcT = dcTables(compDc(c))
          val acT = acTables(compAc(c))
          require(dcT != null && acT != null, "JPEG: SOS before its DHT")
          java.util.Arrays.fill(coef, 0.0)
          val t = dcT.decode(r)
          prevDc(c) += extend(r.bits(t), t)
          coef(0) = prevDc(c).toDouble * qt(0)
          var k = 1
          while (k < 64) {
            val rs = acT.decode(r)
            val run = rs >> 4
            val sz = rs & 0x0f
            if (sz == 0) {
              if (run == 15) k += 16 // ZRL
              else k = 64 // EOB
            } else {
              k += run
              require(k < 64, "JPEG: AC coefficient index overflow")
              coef(ZigZag(k)) = extend(r.bits(sz), sz).toDouble * qt(ZigZag(k))
              k += 1
            }
          }
          idct(coef, pix)
          var i = 0
          while (i < 64) {
            planes(c)((by * 8 + i / 8) * bw * 8 + bx * 8 + i % 8) = pix(i) + 128.0
            i += 1
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }

    def clamp(v: Double): Byte =
      math.max(0, math.min(255, math.round(v).toInt)).toByte
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = y * bw * 8 + x
        val o = 3 * (y * width + x)
        if (nComp == 1) {
          val v = clamp(planes(0)(p))
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        } else {
          val yy = planes(0)(p)
          val cb = planes(1)(p) - 128.0
          val cr = planes(2)(p) - 128.0
          rgb(o) = clamp(yy + 1.402 * cr)
          rgb(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(width, height, rgb)
  }
}
