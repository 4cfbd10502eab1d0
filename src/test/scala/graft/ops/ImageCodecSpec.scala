package graft.ops

import graft.SparkSpec

/** Planted-image gates for the REAL pure-JVM codec (round-11 verdict
  * item #4): hand-built golden byte arrays per format — independent of
  * the encoder — must decode to exact known pixels, and encode→decode
  * must round-trip byte-identically across padding edge cases. */
class ImageCodecSpec extends SparkSpec {

  // 2x2 image, pixels (row-major top-down RGB):
  //   (255,0,0) (0,255,0)
  //   (0,0,255) (10,20,30)
  private val rgb2x2: Array[Byte] = Array(
    255, 0, 0, 0, 255, 0,
    0, 0, 255, 10, 20, 30).map(_.toByte)

  test("planted PPM golden: hand-built bytes decode to exact pixels") {
    // built by hand from the Netpbm spec, NOT via encodePpm
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val bytes = header ++ rgb2x2
    val img = ImageCodec.decode(bytes)
    assert(img.format == "ppm" && img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == rgb2x2.toSeq, "exact pixel mismatch")
  }

  test("planted PPM with header comment parses per the spec") {
    val bytes = "P6\n# a comment line\n2 2\n255\n".getBytes("US-ASCII") ++
      rgb2x2
    val img = ImageCodec.decode(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == rgb2x2.toSeq)
  }

  test("planted BMP golden: bottom-up BGR rows with padding decode " +
      "to exact top-down RGB pixels") {
    // hand-built 24bpp DIB: w=2 -> rowBytes 6, pad 2; rows BOTTOM-UP
    def le32(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val imageSize = (6 + 2) * 2
    val file = Array[Byte]('B', 'M') ++ le32(54 + imageSize) ++
      le16(0) ++ le16(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(imageSize) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++
      // bottom row first (the image's SECOND row), BGR + 2 pad bytes:
      // (0,0,255) -> B=255,G=0,R=0 ; (10,20,30) -> B=30,G=20,R=10
      Array[Byte](255.toByte, 0, 0, 30, 20, 10, 0, 0) ++
      // top row: (255,0,0) -> 0,0,255 ; (0,255,0) -> 0,255,0
      Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0)
    val img = ImageCodec.decode(file)
    assert(img.format == "bmp" && img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == rgb2x2.toSeq, "exact pixel mismatch")
  }

  test("encode -> decode round-trips byte-identically, including BMP " +
      "row-padding edge cases (w % 4 in 0..3)") {
    for (w <- Seq(1, 2, 3, 4, 5, 17); h <- Seq(1, 2, 7)) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val p = ImageCodec.decode(ImageCodec.encodePpm(w, h, rgb))
      assert(p.format == "ppm" && p.width == w && p.height == h)
      assert(p.rgb.toSeq == rgb.toSeq, s"ppm $w x $h")
      val b = ImageCodec.decode(ImageCodec.encodeBmp(w, h, rgb))
      assert(b.format == "bmp" && b.width == w && b.height == h)
      assert(b.rgb.toSeq == rgb.toSeq, s"bmp $w x $h")
    }
  }

  test("resizeNearest: known 4x4 -> 2x2 sampling grid, exact pixels; " +
      "small images pass through untouched") {
    // 4x4 image whose pixel (x, y) has R = 16*y + x, G = 100, B = 200
    val rgb = Array.tabulate(4 * 4 * 3) { i =>
      val px = i / 3
      (i % 3 match {
        case 0 => 16 * (px / 4) + (px % 4)
        case 1 => 100
        case 2 => 200
      }).toByte
    }
    val img = ImageCodec.Image("ppm", 4, 4, rgb)
    val out = ImageCodec.resizeNearest(img, 2)
    assert(out.width == 2 && out.height == 2)
    // grid: ox*4//2 = {0, 2}, oy*4//2 = {0, 2} -> samples (0,0), (2,0),
    // (0,2), (2,2) -> R values 0, 2, 32, 34
    val rs = out.rgb.grouped(3).map(_(0).toInt & 0xff).toSeq
    assert(rs == Seq(0, 2, 32, 34), s"sampling grid wrong: $rs")
    assert(out.rgb.grouped(3).forall(p =>
      (p(1) & 0xff) == 100 && (p(2) & 0xff) == 200))
    val same = ImageCodec.resizeNearest(img, 8)
    assert(same.width == 4 && same.height == 4 &&
      same.rgb.toSeq == rgb.toSeq, "never upscale")
  }

  test("averageHash planted gates: uniform image hashes to zero, " +
      "half-dark/half-bright to the f0-row pattern") {
    // uniform gray: every cell equals the mean, strict > never fires
    val flat = ImageCodec.Image("ppm", 16, 16,
      Array.fill(16 * 16 * 3)(77.toByte))
    assert(ImageCodec.averageHash(flat) == "0" * 16)
    // left half black, right half bright: grid x 0..3 dark, 4..7
    // bright -> per-row bits 11110000 = 0xF0 in each of 8 rows
    val split = Array.tabulate(16 * 16 * 3) { i =>
      val x = (i / 3) % 16
      (if (x < 8) 0 else 200).toByte
    }
    val img = ImageCodec.Image("ppm", 16, 16, split)
    assert(ImageCodec.averageHash(img) == "f0f0f0f0f0f0f0f0")
    // identical payloads collide exactly; a decoded round-trip hashes
    // the same as the in-memory image
    val enc = ImageCodec.encodeBmp(16, 16, split)
    assert(ImageCodec.averageHash(ImageCodec.decode(enc)) ==
      "f0f0f0f0f0f0f0f0")
  }

  test("unsupported magic fails loud") {
    intercept[IllegalArgumentException] {
      ImageCodec.decode(Array[Byte](1, 2, 3, 4))
    }
    intercept[IllegalArgumentException] {
      ImageCodec.decode("GIF89a".getBytes("US-ASCII"))
    }
  }

  test("untrusted header dimensions fail as parse errors, not " +
      "overflow/allocation surprises") {
    // w*h*3 wraps negative in Int arithmetic
    intercept[IllegalArgumentException] {
      ImageCodec.decode("P6\n50000 50000\n255\n ".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      ImageCodec.decode("P6\n0 4\n255\n ".getBytes("US-ASCII"))
    }
  }

  test("pixelSum treats bytes as unsigned") {
    assert(ImageCodec.pixelSum(Array[Byte](-1, 0, 1)) == 255L + 0 + 1)
  }
}
