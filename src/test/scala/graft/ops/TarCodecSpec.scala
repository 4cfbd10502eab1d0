package graft.ops

import graft.SparkSpec

/** Planted-archive gates for the pure-JVM ustar codec: a hand-built
  * golden header/member (assembled field-by-field from the public
  * ustar layout, independent of the encoder), padding classes,
  * checksum corruption, truncation, and non-file member skipping. */
class TarCodecSpec extends SparkSpec {

  /** Hand-build one ustar header + data + end blocks for a regular
    * file — field offsets straight from the spec. */
  private def handArchive(name: String, data: Array[Byte],
      typeflag: Byte = '0'): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(v: Long, at: Int, width: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = "0" * (width - 1 - s.length) + s
      System.arraycopy(padded.getBytes("US-ASCII"), 0, h, at,
        width - 1)
    }
    oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
    oct(data.length.toLong, 124, 12); oct(0, 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = typeflag
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0'
    var sum = 0L
    (0 until 512).foreach(i => sum += h(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"),
      0, h, 148, 6)
    h(154) = 0; h(155) = ' '.toByte
    val pad = (512 - data.length % 512) % 512
    h ++ data ++ new Array[Byte](pad) ++ new Array[Byte](1024)
  }

  test("hand-built golden archive decodes to the exact member") {
    val data = "hello shard".getBytes("UTF-8")
    val got = TarCodec.decode(handArchive("sample.txt", data))
    assert(got.map(_._1) == Seq("sample.txt"))
    assert(got.head._2.toSeq == data.toSeq)
  }

  test("encode -> decode round-trips across padding classes " +
      "(0, 1, 511, 512, 513 bytes) and multi-member archives") {
    for (n <- Seq(0, 1, 511, 512, 513)) {
      val data = Array.tabulate(n)(i => ((i * 7 + 3) % 256).toByte)
      val got = TarCodec.decode(TarCodec.encode(Seq(s"m$n.bin" -> data)))
      assert(got.map(_._1) == Seq(s"m$n.bin"))
      assert(got.head._2.toSeq == data.toSeq, s"size $n")
    }
    val members = (0 until 5).map(i =>
      s"part$i.txt" -> s"content number $i".getBytes("UTF-8"))
    val got = TarCodec.decode(TarCodec.encode(members))
    assert(got.map(_._1) == members.map(_._1))
    got.zip(members).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq == b.toSeq)
    }
  }

  test("directory members are skipped but still checksum-verified") {
    val dir = handArchive("somedir/", Array.emptyByteArray,
      typeflag = '5')
    val file = handArchive("f.txt", "x".getBytes("UTF-8"))
    // concatenate: dir header+end, strip its end blocks, then file
    val combined = dir.dropRight(1024) ++ file
    val got = TarCodec.decode(combined)
    assert(got.map(_._1) == Seq("f.txt"))
  }

  test("corruption fails loud: flipped header byte (checksum), " +
      "truncated member, missing end blocks, overflowing size field") {
    val good = TarCodec.encode(Seq("a.txt" -> ("y" * 600).getBytes))
    val flipped = good.clone()
    flipped(5) = 'X'.toByte // inside the name field
    intercept[IllegalArgumentException] { TarCodec.decode(flipped) }
    intercept[IllegalArgumentException] {
      TarCodec.decode(good.slice(0, 512 + 100)) // truncated data
    }
    intercept[IllegalArgumentException] {
      TarCodec.decode(good.dropRight(1024)) // no end blocks
    }
    intercept[IllegalArgumentException] {
      TarCodec.decode(good.dropRight(512)) // only one end block
    }
  }

  test("a size field larger than the archive is a parse error, not " +
      "an out-of-bounds read") {
    val bogus = handArchive("big.bin", "tiny".getBytes("UTF-8"))
    // rewrite the size field to claim 1 MB, refresh the checksum
    val h = bogus.clone()
    val s = java.lang.Long.toOctalString(1048576L)
    val padded = "0" * (11 - s.length) + s
    System.arraycopy(padded.getBytes("US-ASCII"), 0, h, 124, 11)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += h(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"),
      0, h, 148, 6)
    h(154) = 0; h(155) = ' '.toByte
    intercept[IllegalArgumentException] { TarCodec.decode(h) }
  }

  test("the ustar prefix field joins onto the name — a foreign " +
      "archive's >100-char path is not silently truncated") {
    val data = "payload".getBytes("UTF-8")
    val arch = handArchive("leaf.txt", data)
    // plant a prefix (offset 345) and refresh the checksum
    val h = arch.clone()
    val pre = "some/deep/dir".getBytes("US-ASCII")
    System.arraycopy(pre, 0, h, 345, pre.length)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += h(i) & 0xff)
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes("US-ASCII"),
      0, h, 148, 6)
    h(154) = 0; h(155) = ' '.toByte
    val got = TarCodec.decode(h)
    assert(got.map(_._1) == Seq("some/deep/dir/leaf.txt"))
    assert(got.head._2.toSeq == data.toSeq)
  }
}
