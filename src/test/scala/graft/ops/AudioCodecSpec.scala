package graft.ops

import graft.SparkSpec

/** Planted-file gates for the pure-JVM WAV codec: a hand-built golden
  * WAV (assembled byte-by-byte from the RIFF/WAVE spec, independent
  * of the encoder) must decode to exact samples, ancillary chunks and
  * the odd-length pad byte must be honored, corruption fails loud,
  * and the integer feature kernels have hand-checked values. */
class AudioCodecSpec extends SparkSpec {

  private def le32(v: Int) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  // golden clip: mono 8 kHz, samples 100, -200, 300, -32768
  private val goldenSamples = Array[Short](100, -200, 300, -32768)

  private def goldenWav: Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(36 + 8) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(8) ++
      goldenSamples.flatMap(s => le16(s & 0xffff))

  test("planted WAV golden: hand-built bytes decode to exact samples") {
    val a = AudioCodec.decodeWav(goldenWav)
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == goldenSamples.toSeq)
  }

  test("ancillary chunks are skipped, including the odd-length pad " +
      "byte the RIFF spec requires") {
    // a 3-byte LIST chunk between fmt and data: consumed as 8+3+1
    val junk = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // 3 data bytes + 1 pad
    val wav = goldenWav
    val withJunk = wav.slice(0, 36) ++ junk ++ wav.slice(36, wav.length)
    // patch the RIFF size (not validated strictly, but keep it honest)
    val a = AudioCodec.decodeWav(withJunk)
    assert(a.samples.toSeq == goldenSamples.toSeq)
  }

  test("encode -> decode round-trips across rates/channels/counts") {
    for (ch <- Seq(1, 2); n <- Seq(2, 64, 501 * ch)) {
      val rounded = n - n % ch
      val samples = Array.tabulate(rounded)(i =>
        ((i * 2731 + 17) % 65536 - 32768).toShort)
      val a = AudioCodec.decodeWav(
        AudioCodec.encodeWav(16000, ch, samples))
      assert(a.sampleRate == 16000 && a.channels == ch)
      assert(a.samples.toSeq == samples.toSeq, s"ch=$ch n=$rounded")
    }
  }

  test("corruption fails loud: truncated data, hostile chunk size, " +
      "non-PCM format, 8-bit depth, data before fmt") {
    val good = AudioCodec.encodeWav(8000, 1, goldenSamples)
    intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(good.slice(0, good.length - 3))
    }
    val hostile = good.clone()
    // data chunk claims 2 GB
    val at = 40 // data size field of the canonical 44-byte layout
    hostile(at) = 0xff.toByte; hostile(at + 1) = 0xff.toByte
    hostile(at + 2) = 0xff.toByte; hostile(at + 3) = 0x7f.toByte
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(hostile) }
    // an EVEN hostile size whose pos+8+len wraps negative in Int
    // arithmetic: must be a bounds error, not a ~2 GB allocation
    val wrapping = good.clone()
    wrapping(at) = 0xfe.toByte; wrapping(at + 1) = 0xff.toByte
    wrapping(at + 2) = 0xff.toByte; wrapping(at + 3) = 0x7f.toByte
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(wrapping) }
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float tag
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(nonPcm) }
    val eightBit = good.clone(); eightBit(34) = 8
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(eightBit) }
    // a file whose data chunk precedes fmt
    val swapped = good.slice(0, 12) ++ good.slice(36, good.length) ++
      good.slice(12, 36)
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(swapped) }
  }

  test("feature kernels: hand-checked energy, zero crossings " +
      "(strict sign convention, zero is non-negative), peak at " +
      "Short.MinValue") {
    // signs: + - + -  -> 3 transitions
    assert(AudioCodec.zeroCrossings(goldenSamples) == 3L)
    // zero counts as non-negative: 0, -1, 0, 1 -> transitions at
    // 0->-1 and -1->0 only
    assert(AudioCodec.zeroCrossings(Array[Short](0, -1, 0, 1)) == 2L)
    assert(AudioCodec.squareSum(goldenSamples) ==
      100L * 100 + 200L * 200 + 300L * 300 + 32768L * 32768)
    assert(AudioCodec.peak(goldenSamples) == 32768)
    assert(AudioCodec.peak(Array[Short]()) == 0)
  }
}
