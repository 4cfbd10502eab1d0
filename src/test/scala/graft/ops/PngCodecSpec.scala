package graft.ops

import graft.SparkSpec

/** Planted-file gates for the pure-JVM PNG codec: a hand-built golden
  * PNG whose zlib stream is a HAND-ASSEMBLED stored-mode deflate
  * block (adler32 computed longhand in the test — fully independent
  * of the encoder and of `java.util.zip.Deflater`), round-trips that
  * exercise every scanline filter, CRC/truncation/filter-byte
  * corruption gates, and the multi-IDAT chunking the spec allows. */
class PngCodecSpec extends SparkSpec {

  // 2x2 image, pixels (row-major top-down RGB) — the same golden
  // pixels ImageCodecSpec plants for PPM/BMP:
  //   (255,0,0) (0,255,0)
  //   (0,0,255) (10,20,30)
  private val rgb2x2: Array[Byte] = Array(
    255, 0, 0, 0, 255, 0,
    0, 0, 255, 10, 20, 30).map(_.toByte)

  private def be32(v: Int) = Array[Byte](
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Chunk = len + type + data + CRC32(type ++ data). The CRC comes
    * from the JDK's public CRC32 — independent of PngCodec. */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Longhand adler32 (RFC 1950): a = 1 + Σbytes, b = Σ running a. */
  private def adler32(data: Array[Byte]): Array[Byte] = {
    var a = 1L; var b = 0L
    data.foreach { x => a = (a + (x & 0xff)) % 65521; b = (b + a) % 65521 }
    be32(((b << 16) | a).toInt)
  }

  /** A zlib stream holding one STORED (uncompressed) deflate block —
    * assembled byte-by-byte from RFC 1950/1951, no Deflater. */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val len = raw.length
    Array[Byte](0x78, 0x01,                    // zlib header, no dict
      0x01,                                     // BFINAL=1, BTYPE=00
      (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
      (~len & 0xff).toByte, ((~len >> 8) & 0xff).toByte) ++
      raw ++ adler32(raw)
  }

  private val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a,
    0x0a).map(_.toByte)
  private val ihdr2x2 = chunk("IHDR",
    be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 0))
  // filter-0 scanlines: one leading 0 byte per row, then raw RGB
  private val raw2x2 = Array[Byte](0) ++ rgb2x2.slice(0, 6) ++
    Array[Byte](0) ++ rgb2x2.slice(6, 12)

  test("planted PNG golden: hand-assembled stored-deflate file " +
      "decodes to exact pixels") {
    val file = sig ++ ihdr2x2 ++ chunk("IDAT", zlibStored(raw2x2)) ++
      chunk("IEND", Array.emptyByteArray)
    val img = ImageCodec.decode(file) // through the shared sniffer
    assert(img.format == "png" && img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == rgb2x2.toSeq, "exact pixel mismatch")
  }

  test("multiple IDAT chunks concatenate per the spec (arbitrary " +
      "split inside the zlib stream)") {
    val z = zlibStored(raw2x2)
    for (split <- Seq(1, 5, z.length - 2)) {
      val file = sig ++ ihdr2x2 ++
        chunk("IDAT", z.slice(0, split)) ++
        chunk("IDAT", z.slice(split, z.length)) ++
        chunk("IEND", Array.emptyByteArray)
      assert(PngCodec.decode(file).rgb.toSeq == rgb2x2.toSeq,
        s"split at $split")
    }
  }

  test("ancillary chunks are skipped but still CRC-verified") {
    val file = sig ++ ihdr2x2 ++
      chunk("tEXt", ("Comment\u0000hello").getBytes("US-ASCII")) ++
      chunk("IDAT", zlibStored(raw2x2)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(PngCodec.decode(file).rgb.toSeq == rgb2x2.toSeq)
    // same file with one bit flipped inside the ancillary data: the
    // codec must refuse, not silently skip corrupt framing
    val bad = file.clone()
    val textDataAt = sig.length + ihdr2x2.length + 8
    bad(textDataAt) = (bad(textDataAt) ^ 0x01).toByte
    intercept[IllegalArgumentException] { PngCodec.decode(bad) }
  }

  test("encode -> decode round-trips byte-identically across sizes " +
      "(heights >= 5 exercise all five filter types)") {
    for (w <- Seq(1, 2, 3, 17); h <- Seq(1, 5, 7)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val enc = PngCodec.encode(w, h, rgb)
      assert(enc.slice(0, 8).toSeq == sig.toSeq, "signature")
      val img = ImageCodec.decode(enc)
      assert(img.format == "png" && img.width == w && img.height == h)
      assert(img.rgb.toSeq == rgb.toSeq, s"png $w x $h")
    }
  }

  test("every filter type reconstructs: a 5-row image uses filters " +
      "0..4 and a gradient stresses Sub/Up/Average/Paeth arithmetic") {
    val w = 9; val h = 5
    // gradient + noise so horizontal, vertical and diagonal
    // predictors all see non-trivial deltas (incl. mod-256 wraps)
    val rgb = Array.tabulate(w * h * 3) { i =>
      val px = i / 3; val x = px % w; val y = px / w
      ((x * 41 + y * 97 + (i % 3) * 13 + (x * y * 7)) % 256).toByte
    }
    val img = PngCodec.decode(PngCodec.encode(w, h, rgb))
    assert(img.rgb.toSeq == rgb.toSeq)
  }

  test("corruption fails loud: flipped IDAT bit (CRC), truncated " +
      "file, bad filter byte, inflated-size mismatch") {
    val good = PngCodec.encode(4, 4,
      Array.tabulate(48)(i => (i * 3).toByte))
    // flip one bit inside IDAT data -> CRC mismatch
    val flipped = good.clone()
    flipped(sig.length + 25 + 12) =
      (flipped(sig.length + 25 + 12) ^ 0x40).toByte
    intercept[IllegalArgumentException] { PngCodec.decode(flipped) }
    // truncation at several points
    for (cut <- Seq(7, 10, sig.length + 10, good.length - 5)) {
      intercept[IllegalArgumentException] {
        PngCodec.decode(good.slice(0, cut))
      }
    }
    // a filter byte of 5: stored-block stream, correct CRCs, bad row
    val badRow = raw2x2.clone(); badRow(0) = 5
    val badFile = sig ++ ihdr2x2 ++ chunk("IDAT", zlibStored(badRow)) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException] { PngCodec.decode(badFile) }
    // declared 2x2 but stream holds only one scanline
    val shortFile = sig ++ ihdr2x2 ++
      chunk("IDAT", zlibStored(raw2x2.slice(0, 7))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException] { PngCodec.decode(shortFile) }
  }

  test("untrusted header dimensions fail as parse errors (w*h*3 " +
      "overflow, zero dims, hostile chunk length)") {
    def withDims(w: Int, h: Int) = sig ++ chunk("IHDR",
      be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", zlibStored(raw2x2)) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException] {
      PngCodec.decode(withDims(50000, 50000))
    }
    intercept[IllegalArgumentException] {
      PngCodec.decode(withDims(0, 4))
    }
    // w*h*3 fits an Int but the scanline serialization (1+3w)*h
    // doesn't — must be a parse error, not NegativeArraySizeException
    intercept[IllegalArgumentException] {
      PngCodec.decode(withDims(3, 238609294))
    }
    // chunk length pointing past the file
    val hostile = sig ++ be32(1000000) ++ "IHDR".getBytes("US-ASCII") ++
      new Array[Byte](20)
    intercept[IllegalArgumentException] { PngCodec.decode(hostile) }
  }

  test("grayscale / 16-bit / interlaced PNGs are rejected, not " +
      "mis-decoded") {
    def ihdrWith(depth: Byte, colour: Byte, inter: Byte) = sig ++
      chunk("IHDR", be32(2) ++ be32(2) ++
        Array[Byte](depth, colour, 0, 0, inter)) ++
      chunk("IDAT", zlibStored(raw2x2)) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException] {
      PngCodec.decode(ihdrWith(8, 0, 0))  // grayscale
    }
    intercept[IllegalArgumentException] {
      PngCodec.decode(ihdrWith(16, 2, 0)) // 16-bit
    }
    intercept[IllegalArgumentException] {
      PngCodec.decode(ihdrWith(8, 2, 1))  // Adam7
    }
  }

  test("trailing bytes after IEND and non-consecutive IDAT runs are " +
      "rejected — the fail-loud posture covers the whole container") {
    val good = sig ++ ihdr2x2 ++ chunk("IDAT", zlibStored(raw2x2)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(PngCodec.decode(good).rgb.toSeq == rgb2x2.toSeq)
    // appended garbage (e.g. smuggled data) after IEND
    val e1 = intercept[IllegalArgumentException] {
      PngCodec.decode(good ++ Array[Byte](1, 2, 3))
    }
    assert(e1.getMessage.contains("trailing bytes"))
    // an ancillary chunk interleaved into the IDAT run: the spec
    // requires IDAT chunks be consecutive
    val z = zlibStored(raw2x2)
    val interleaved = sig ++ ihdr2x2 ++
      chunk("IDAT", z.slice(0, 5)) ++
      chunk("tEXt", "k v".getBytes("US-ASCII")) ++
      chunk("IDAT", z.slice(5, z.length)) ++
      chunk("IEND", Array.emptyByteArray)
    val e2 = intercept[IllegalArgumentException] {
      PngCodec.decode(interleaved)
    }
    assert(e2.getMessage.contains("non-consecutive IDAT"))
    // a ZERO-LENGTH leading IDAT (legal, real encoders emit them)
    // still arms the consecutiveness check
    val zeroLed = sig ++ ihdr2x2 ++
      chunk("IDAT", Array.emptyByteArray) ++
      chunk("tEXt", "k v".getBytes("US-ASCII")) ++
      chunk("IDAT", z) ++
      chunk("IEND", Array.emptyByteArray)
    val e3 = intercept[IllegalArgumentException] {
      PngCodec.decode(zeroLed)
    }
    assert(e3.getMessage.contains("non-consecutive IDAT"))
  }
}
