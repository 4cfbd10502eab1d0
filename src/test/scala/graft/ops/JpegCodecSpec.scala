package graft.ops

import graft.SparkSpec

/** Gates for the baseline JPEG codec: constant-block exact round
  * trips through the real entropy syntax, HAND-ASSEMBLED streams
  * (independent of the encoder) exercising AC run/size decoding, ZRL,
  * byte unstuffing, restart markers, and color conversion, an
  * independent direct-2D IDCT cross-check, and hostile-input gates
  * matching the PngCodec discipline. */
class JpegCodecSpec extends SparkSpec {

  // ---- tiny independent bit/segment assembler (no JpegCodec code) ---
  private class Packer {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def seg(marker: Int, payload: Array[Int]): this.type = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
      this
    }
    def bits(s: String): this.type = {
      s.foreach { c =>
        acc = (acc << 1) | (c - '0'); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
      }
      this
    }
    def flushBits(): this.type = {
      if (n > 0) {
        val b = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
        out.write(b)
        if (b == 0xff) out.write(0x00)
        acc = 0; n = 0
      }
      this
    }
    def raw(vals: Int*): this.type = { vals.foreach(out.write); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  // shared segments for a grayscale 8x8 single-block file
  private def grayHeader(p: Packer, w: Int, h: Int): Packer = {
    p.raw(0xff, 0xd8)                                   // SOI
    p.seg(0xdb, 0 +: Array.fill(64)(1))                 // DQT id0, all 1
    p.seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff,
      1, 1, 0x11, 0))                                   // SOF0, 1 comp
    // DC table 0: Annex K luma DC (counts 0,1,5,1,1,1,1,1,1)
    p.seg(0xc4, Array(0x00, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0,
      0, 0) ++ (0 to 11))
    // AC table 0: four length-2 codes: 00->EOB(0x00), 01->0x01
    // (run 0 size 1), 10->ZRL(0xF0), 11->0x21 (run 2 size 1)
    p.seg(0xc4, Array(0x10, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0x00, 0x01, 0xf0, 0x21))
    p.seg(0xda, Array(1, 1, 0x00, 0, 63, 0))            // SOS
  }

  /** Independent direct 2-D IDCT (Math.cos, quadruple loop) for
    * cross-checking — a different implementation shape than the
    * codec's separable StrictMath version. */
  private def directIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val px = math.round(s / 4.0 + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, px))
    }
    out
  }

  test("constant-block images round-trip EXACTLY through the real " +
      "baseline syntax (the property the oracle replays)") {
    val blocks = Array(40, 130, 200, 15, 255, 0, 128, 77)
    val enc = JpegCodec.encodeGrayBlocks(32, 16, blocks)
    val img = ImageCodec.decode(enc) // through the shared sniffer
    assert(img.format == "jpeg" && img.width == 32 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 32; c <- 0 until 2) {
      val want = blocks((y / 8) * 4 + x / 8)
      val got = img.rgb((y * 32 + x) * 3 + c) & 0xff
      assert(got == want, s"pixel ($x,$y) channel $c: $got != $want")
    }
  }

  test("hand-assembled stream: AC coefficients, a ZRL run, and DC " +
      "prediction decode against an independent direct IDCT") {
    // one 8x8 block: DC diff 3 (cat 2 -> DC code 011 + bits 11),
    // AC k=1: size1 value 1 (01 + bit 1), ZRL (10) to k=18,
    // AC k=18: size1 bits 0 -> EXTEND = -1, EOB (00)
    val p = grayHeader(new Packer, 8, 8)
    p.bits("011" + "11" + "01" + "1" + "10" + "01" + "0" + "00")
      .flushBits()
    p.raw(0xff, 0xd9)
    val img = JpegCodec.decode(p.bytes)
    assert(img.width == 8 && img.height == 8)
    val zz = new Array[Int](64)
    val zig = Array(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11,
      4, 5, 12, 19, 26)
    zz(zig(0)) = 3; zz(zig(1)) = 1; zz(zig(18)) = -1
    val want = directIdct(zz)
    for (i <- 0 until 64) {
      val got = img.rgb(i * 3) & 0xff
      assert(math.abs(got - want(i)) <= 1,
        s"sample $i: $got vs ${want(i)}")
      assert(img.rgb(i * 3 + 1) == img.rgb(i * 3)) // grayscale replicate
    }
  }

  test("restart intervals: DRI + RST0 resets DC prediction and " +
      "byte-aligns, per the spec") {
    val p = new Packer
    p.raw(0xff, 0xd8)
    p.seg(0xdb, 0 +: Array.fill(64)(1))
    p.seg(0xc0, Array(8, 0, 8, 0, 16, 1, 1, 0x11, 0)) // 16x8: 2 MCUs
    p.seg(0xc4, Array(0x00, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0,
      0, 0) ++ (0 to 11))
    p.seg(0xc4, Array(0x10, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0x00, 0x01, 0xf0))
    p.seg(0xdd, Array(0, 1))                           // DRI = 1 MCU
    p.seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    // MCU 0: DC diff +8 (cat 4: code 101, bits 1000), EOB
    p.bits("101" + "1000" + "00").flushBits()
    p.raw(0xff, 0xd0)                                  // RST0
    // MCU 1: DC diff +8 again — prediction was RESET, so both
    // blocks hold the same value
    p.bits("101" + "1000" + "00").flushBits()
    p.raw(0xff, 0xd9)
    val img = JpegCodec.decode(p.bytes)
    val b0 = img.rgb(0) & 0xff
    val b1 = img.rgb(8 * 3) & 0xff
    assert(b0 == b1, s"restart did not reset DC prediction: $b0 vs $b1")
    assert(b0 == 129, s"DC 8 -> 8/8 + 128 = 129, got $b0")
  }

  test("the color path: a 4:2:0 three-component file with flat " +
      "chroma converts by the JFIF fixed-point formula") {
    val blocks = Array.fill(4)(200)
    val enc = JpegCodec.encodeGrayBlocks(16, 16, blocks)
    val img = JpegCodec.decode(enc)
    // gray encoder writes Cb=Cr=128 -> R=G=B=Y exactly
    assert(img.rgb.forall(b => (b & 0xff) == 200))
  }

  test("corruption fails loud: truncated entropy stream, stray " +
      "marker mid-scan, invalid Huffman code, AC run past block end") {
    val good = JpegCodec.encodeGrayBlocks(16, 16, Array(1, 2, 3, 4))
    intercept[IllegalArgumentException] {
      JpegCodec.decode(good.dropRight(8))
    }
    // flip a bit in the entropy stream: decodes to garbage DC or an
    // invalid code — either way a parse error, never a wrong pixel
    // silently (constant-block streams are short; an invalid Huffman
    // path is the reachable failure)
    intercept[IllegalArgumentException] {
      val p = grayHeader(new Packer, 8, 8)
      // DC cat 15 is not in the table: code 111111111 (9 ones) is the
      // longest valid prefix + more ones -> invalid-code guard
      p.bits("1111111111111111").flushBits()
      p.raw(0xff, 0xd9)
      JpegCodec.decode(p.bytes)
    }
    intercept[IllegalArgumentException] {
      val p = grayHeader(new Packer, 8, 8)
      // DC 0; ZRL x3 -> k=49; 14 single coefficients -> k=63; then
      // run-2 symbol 0x21 lands k=65 -> the explicit run guard
      p.bits("00" + "10" * 3 + ("01" + "1") * 14 + "11" + "1")
        .flushBits()
      p.raw(0xff, 0xd9)
      JpegCodec.decode(p.bytes)
    }
    intercept[IllegalArgumentException] {
      val p = grayHeader(new Packer, 8, 8)
      // DC 0; ZRL x4 -> k=65: sixteen zeros past the block end
      p.bits("00" + "10" * 4).flushBits()
      p.raw(0xff, 0xd9)
      JpegCodec.decode(p.bytes)
    }
    intercept[IllegalArgumentException] {
      JpegCodec.decode(good ++ Array[Byte](1, 2, 3)) // trailing bytes
    }
  }

  test("unsupported shapes are rejected, not mis-decoded: " +
      "hierarchical SOF3, 12-bit precision, hostile dimensions") {
    def sof(marker: Int, precision: Int, w: Int, h: Int): Array[Byte] = {
      val p = new Packer
      p.raw(0xff, 0xd8)
      p.seg(0xdb, 0 +: Array.fill(64)(1))
      p.seg(marker, Array(precision, h >> 8, h & 0xff, w >> 8,
        w & 0xff, 1, 1, 0x11, 0))
      p.bytes
    }
    // (SOF2 is SUPPORTED as of r13 — a lossless-sequential SOF3
    // frame is the reject case now)
    val sof3 = intercept[IllegalArgumentException] {
      JpegCodec.decode(sof(0xc3, 8, 8, 8))
    }
    assert(sof3.getMessage.contains("SOF2"))
    intercept[IllegalArgumentException] {
      JpegCodec.decode(sof(0xc0, 12, 8, 8))  // 12-bit
    }
    intercept[IllegalArgumentException] {
      JpegCodec.decode(sof(0xc0, 8, 40000, 40000)) // w*h*3 overflow
    }
    // a ~20-byte header declaring dims whose planes would allocate
    // hundreds of MB must die at the gate (an OOM is FATAL under the
    // quarantine contract — a hostile header has to be a parse error)
    val e = intercept[IllegalArgumentException] {
      JpegCodec.decode(sof(0xc0, 8, 16384, 16384))
    }
    assert(e.getMessage.contains("unreasonable dimensions"))
    intercept[IllegalArgumentException] {
      JpegCodec.decode("no jpeg here".getBytes("US-ASCII"))
    }
    // truncation AT a marker boundary is the codec's own parse error,
    // never an ArrayIndexOutOfBoundsException
    // (0xda is diagnosed as "SOS before SOF0" first — also fail-loud)
    for (m <- Seq(0xdb, 0xc4, 0xc0, 0xdd)) {
      val t = intercept[IllegalArgumentException] {
        JpegCodec.decode(Array(0xff, 0xd8, 0xff, m).map(_.toByte))
      }
      assert(t.getMessage.contains("truncated"), f"marker 0xff$m%02x")
    }
  }

  test("a single-component scan is non-interleaved per T.81: the " +
      "declared sampling factors do not scramble a grayscale file") {
    // same entropy stream, sampling 0x11 vs 0x22 — one 8x8 block
    // either way, identical pixels (Ns=1 => MCU = one data unit)
    def gray(sampling: Int): Array[Byte] = {
      val p = new Packer
      p.raw(0xff, 0xd8)
      p.seg(0xdb, 0 +: Array.fill(64)(1))
      p.seg(0xc0, Array(8, 0, 8, 0, 8, 1, 1, sampling, 0))
      p.seg(0xc4, Array(0x00, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0,
        0, 0, 0) ++ (0 to 11))
      p.seg(0xc4, Array(0x10, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0x00, 0x01, 0xf0, 0x21))
      p.seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
      p.bits("101" + "1000" + "00").flushBits() // DC 8, EOB
      p.raw(0xff, 0xd9)
      p.bytes
    }
    val a = JpegCodec.decode(gray(0x11))
    val b = JpegCodec.decode(gray(0x22))
    assert(a.rgb.toSeq == b.rgb.toSeq)
    assert((a.rgb(0) & 0xff) == 129)
  }

  test("the 4-format mixed corpus decodes every arm to the shared " +
      "block witness (sniffer dispatch with the lossy format)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, Sf0001).limit(64)
    val got = Multimodal.decodeAll(spark,
      Multimodal.mixed4ImageTable(spark, docs)).collect()
    assert(got.nonEmpty)
    val byId = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got.map(_.format).toSet.size >= 3, "format mix too narrow")
    got.foreach { m =>
      val (cp0, w, h, blocks) = Multimodal.genBlockImage(byId(m.doc_id))
      assert(m.width == w && m.height == h)
      assert(m.format == Seq("ppm", "bmp", "png", "jpeg")(cp0 % 4))
      assert(m.px_sum == 192L * blocks.map(_.toLong).sum,
        s"doc ${m.doc_id} (${m.format}) pixel witness")
    }
  }

  // ---- r13: progressive (SOF2) ---------------------------------------

  test("r13: progressive constant-block images round-trip EXACTLY — " +
      "DC-first + AC EOB runs + DC refinement reassemble every pixel") {
    for ((w, h) <- Seq((16, 16), (32, 16), (64, 64)); seed <- 0 to 2) {
      val blocks = Array.tabulate((w / 8) * (h / 8))(b =>
        (seed * 37 + 17 * b + (b % 3)) % 256) // low bits vary: the
      // refinement scan carries real information
      val img = JpegCodec.decode(
        JpegCodec.encodeGrayProgressive(w, h, blocks))
      assert(img.width == w && img.height == h && img.format == "jpeg")
      val want = Multimodal.blocksToRgb(w, h, blocks)
      assert(img.rgb.toSeq == want.toSeq, s"$w x $h seed $seed")
    }
  }

  test("r13: cross-decoder conformance — the JDK's own progressive " +
      "encoder (full IJG scan script: spectral bands, AC first AND " +
      "refinement passes) decodes to the same pixels as javax.imageio") {
    import javax.imageio.{ImageIO, ImageWriteParam}
    // deterministic gradient+texture grayscale: every scan type has
    // real work (DC deltas, AC energy across both spectral bands,
    // nonzero refinement bits)
    val w = 48; val h = 40
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 3 + ((x * y) % 7) * 11) % 256
      src.getRaster.setSample(x, y, 0, v)
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), p)
    writer.dispose(); ios.close()
    val bytes = out.toByteArray
    // it must really be SOF2 (0xff 0xc2 in the marker stream)
    assert(bytes.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2),
      "JDK writer did not emit a progressive file")
    val mine = JpegCodec.decode(bytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(mine.width == w && mine.height == h)
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val got = mine.rgb((y * w + x) * 3) & 0xff
      val want = ref.getRaster.getSample(x, y, 0)
      val d = math.abs(got - want)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    val mean = sumDiff.toDouble / (w * h)
    info(f"cross-decoder: maxDiff=$maxDiff meanDiff=$mean%.4f")
    // both are conformant IDCTs of the SAME coefficients — they may
    // disagree by the T.81 accuracy allowance, never structurally
    assert(maxDiff <= 2, s"max pixel diff $maxDiff")
    assert(mean <= 0.5, s"mean pixel diff $mean")
  }

  test("r13: progressive corruption fails loud — truncated " +
      "refinement scan, band violations, invalid successive " +
      "approximation") {
    val good = JpegCodec.encodeGrayProgressive(16, 16,
      Array.fill(4)(100))
    // drop the EOI and the refinement scan's byte: truncated
    intercept[IllegalArgumentException] {
      JpegCodec.decode(java.util.Arrays.copyOf(good, good.length - 3))
    }
    // hand-build an SOS with Ss > Se (band violation)
    def hdr(sos: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0xff.toByte, 0xd8.toByte), 0, 2)
      def seg(marker: Int, payload: Array[Byte]): Unit = {
        out.write(0xff); out.write(marker)
        val len = payload.length + 2
        out.write((len >> 8) & 0xff); out.write(len & 0xff)
        out.write(payload, 0, payload.length)
      }
      seg(0xdb, (0.toByte +: Array.fill(64)(1.toByte)).toArray)
      seg(0xc2, Array[Byte](8, 0, 16, 0, 16, 1, 1, 0x11, 0))
      seg(0xc4, (0.toByte +:
        (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
          .map(_.toByte) ++ (0 to 11).map(_.toByte))).toArray)
      seg(0xda, sos)
      out.toByteArray
    }
    val e1 = intercept[IllegalArgumentException] {
      JpegCodec.decode(hdr(Array[Byte](1, 1, 0x00, 20, 10, 0)))
    }
    assert(e1.getMessage.contains("spectral band"))
    val e2 = intercept[IllegalArgumentException] {
      JpegCodec.decode(hdr(Array[Byte](1, 1, 0x00, 0, 0, 0x31)))
    }
    assert(e2.getMessage.contains("successive approximation"))
    // a progressive DC scan with Se != 0
    val e3 = intercept[IllegalArgumentException] {
      JpegCodec.decode(hdr(Array[Byte](1, 1, 0x00, 0, 5, 0)))
    }
    assert(e3.getMessage.contains("Se=0"))
  }
}
