package graft.ops

import graft.SparkSpec

/** Planted-stream gates for the pure-JVM Y4M codec: a hand-built
  * golden stream (assembled from the public YUV4MPEG2 layout,
  * independent of the encoder) must decode to exact frames, unknown
  * header tags and FRAME parameters must be tolerated, truncation and
  * junk between frames fail loud, and the plane-sum kernels split at
  * the exact luma/chroma boundary. */
class VideoCodecSpec extends SparkSpec {

  // golden: 2x2, one frame — planar 4:2:0 = 4 luma + 1 Cb + 1 Cr
  private val goldenFrame = Array[Byte](10, 20, 30, 40, 50, 60)

  test("planted Y4M golden: hand-built stream decodes to exact " +
      "frames, dims, and frame rate") {
    val bytes = ("YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n" +
      "FRAME\n").getBytes("US-ASCII") ++ goldenFrame
    val v = VideoCodec.decodeY4m(bytes)
    assert(v.width == 2 && v.height == 2)
    assert(v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.frames.length == 1)
    assert(v.frames(0).toSeq == goldenFrame.toSeq)
  }

  test("unknown header tags and FRAME parameters are tolerated; " +
      "absent colourspace defaults to 4:2:0") {
    val bytes = ("YUV4MPEG2 W2 H2 F30:1 Xsome:meta\n" +
      "FRAME Ipresentation\n").getBytes("US-ASCII") ++ goldenFrame
    val v = VideoCodec.decodeY4m(bytes)
    assert(v.fpsNum == 30 && v.frames.length == 1)
    assert(v.frames(0).toSeq == goldenFrame.toSeq)
  }

  test("encode -> decode round-trips across sizes and frame counts") {
    for (w <- Seq(2, 8, 10); h <- Seq(2, 6); nf <- Seq(0, 1, 4)) {
      val sz = VideoCodec.frameSize(w, h)
      val frames = (0 until nf).map(f =>
        Array.tabulate(sz)(i => ((f * 89 + i * 31 + 7) % 256).toByte))
      val v = VideoCodec.decodeY4m(
        VideoCodec.encodeY4m(w, h, 25, 1, frames))
      assert(v.width == w && v.height == h && v.frames.length == nf)
      frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq)
      }
    }
  }

  test("corruption fails loud: truncated frame, junk between frames, " +
      "4:2:2 colourspace, odd dimensions, missing frame rate") {
    val good = VideoCodec.encodeY4m(2, 2, 25, 1, Seq(goldenFrame))
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(good.slice(0, good.length - 2))
    }
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(good ++ "JUNK".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(
        ("YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n").getBytes("US-ASCII") ++
          goldenFrame)
    }
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(
        "YUV4MPEG2 W3 H2 F25:1\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m("YUV4MPEG2 W2 H2\n".getBytes("US-ASCII"))
    }
  }

  test("plane-sum kernels split at the exact luma/chroma boundary " +
      "and treat bytes as unsigned") {
    assert(VideoCodec.lumaSum(2, 2, goldenFrame) == 10 + 20 + 30 + 40)
    assert(VideoCodec.chromaSum(2, 2, goldenFrame) == 50 + 60)
    val withHigh = goldenFrame.clone(); withHigh(0) = -1 // 0xff
    assert(VideoCodec.lumaSum(2, 2, withHigh) == 255 + 20 + 30 + 40)
  }
}
