package graft.ops

import graft.{SparkSpec, Tables}

/** Gates for the corrupt-payload quarantine lane: planted corruption
  * lands in the right stable class, clean rows are BYTE-IDENTICAL to
  * the all-clean fail-loud path, the accounting reconciles, and every
  * codec's try* variant quarantines its own corruption vocabulary. */
class QuarantineSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("planted corruption classes are diagnosed by the decoder, " +
      "per planting rule") {
    val rows = QuarantineOps.tryDecodeImageAll(spark,
      QuarantineOps.corruptImageTable(spark, docs)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (r.doc_id % 8) match {
        case 0 => assert(r.status == "quarantined" &&
          r.error_class.contains("bad_magic"), s"doc ${r.doc_id}")
        case 1 => assert(r.status == "quarantined" &&
          r.error_class.contains("hostile_header"), s"doc ${r.doc_id}")
        case 2 | 4 => assert(r.status == "quarantined" &&
          r.error_class.contains("truncated"), s"doc ${r.doc_id}")
        case 3 => assert(r.status == "quarantined" &&
          r.error_class.contains("integrity"), s"doc ${r.doc_id}")
        case _ => assert(r.status == "ok" && r.error_class.isEmpty &&
          r.px_sum.nonEmpty, s"doc ${r.doc_id}")
      }
    }
  }

  test("good rows are byte-identical to the all-clean fail-loud run " +
      "— the lane adds routing, never changes a decode") {
    val lane = QuarantineOps.tryDecodeImageAll(spark,
      QuarantineOps.corruptImageTable(spark, docs)).collect()
      .filter(_.status == "ok")
      .map(r => r.doc_id ->
        ((r.width.get, r.height.get, r.format.get, r.px_sum.get)))
      .toMap
    val clean = Multimodal.decodeAll(spark,
      Multimodal.mixedImageTable(spark, docs)).collect()
      .filter(_.doc_id % 8 >= 5)
      .map(m => m.doc_id -> ((m.width, m.height, m.format, m.px_sum)))
      .toMap
    assert(lane.keySet == clean.keySet, "clean-row id sets differ")
    clean.foreach { case (id, w) =>
      assert(lane(id) == w, s"doc $id witness drift")
    }
  }

  test("accounting reconciles: ok + quarantined-by-class == seen") {
    val rows = QuarantineOps.tryDecodeImageAll(spark,
      QuarantineOps.corruptImageTable(spark, docs)).collect()
    val total = docs.count()
    val byClass = rows.groupBy(r =>
      (r.status, r.error_class.getOrElse("none")))
      .view.mapValues(_.length.toLong).toMap
    assert(byClass.values.sum == total)
    assert(byClass.keySet.filter(_._1 == "quarantined").map(_._2) ==
      Set("bad_magic", "hostile_header", "truncated", "integrity"))
  }

  test("tryGunzipAll: intact streams witness byte-exact recovery, a " +
      "flipped payload bit quarantines as integrity") {
    import spark.implicits._
    val good = CompressedOps.gzipTable(spark, docs.limit(4))
    val ok = QuarantineOps.tryGunzipAll(spark, good).collect()
    assert(ok.nonEmpty && ok.forall(_.status == "ok"))
    // flip a byte in the member's stored CRC-32 trailer: the body
    // still inflates, only trailer verification catches it
    val member = {
      val out = new java.io.ByteArrayOutputStream()
      val defl = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED, true)
      try CompressedOps.gzipMember(("xyz" * 50).getBytes("UTF-8"),
        defl, new java.util.zip.CRC32(), out)
      finally defl.end()
      out.toByteArray
    }
    val flippedCrc = member.clone()
    flippedCrc(member.length - 7) =
      (flippedCrc(member.length - 7) ^ 0x10).toByte
    val bad = QuarantineOps.tryGunzipAll(spark,
      Seq((9L, flippedCrc)).toDF("doc_id", "content")).collect()
    assert(bad.length == 1 && bad.head.status == "quarantined")
    assert(bad.head.error_class.contains("integrity"))
  }

  test("tryDecodeTarAll / tryDecodeAudioAll / tryDecodeVideoAll " +
      "quarantine truncation and junk magic with their own classes") {
    import spark.implicits._
    def table(rows: Seq[(Long, Array[Byte])]) =
      rows.toDF("doc_id", "content")
    // tar: a truncated shard and a checksum flip
    val shard = TarCodec.encode(Seq("a.txt" -> "hello".getBytes("UTF-8")))
    val flipped = shard.clone(); flipped(0) = (flipped(0) ^ 1).toByte
    val tarGot = QuarantineOps.tryDecodeTarAll(spark, table(Seq(
      1L -> shard, 2L -> shard.take(600), 3L -> flipped))).collect()
      .sortBy(_.doc_id)
    assert(tarGot(0).status == "ok" && tarGot(0).n_members.contains(1L))
    assert(tarGot(1).error_class.contains("truncated"))
    assert(tarGot(2).error_class.contains("integrity"))
    // audio: junk magic and a truncated data chunk
    val wav = AudioCodec.encodeWav(8000, 1, Array[Short](1, -2, 3, -4))
    val audioGot = QuarantineOps.tryDecodeAudioAll(spark, table(Seq(
      1L -> wav, 2L -> ("JUNK" * 12).getBytes("US-ASCII"),
      3L -> wav.take(wav.length - 2)))).collect().sortBy(_.doc_id)
    assert(audioGot(0).status == "ok" &&
      audioGot(0).n_samples.contains(4L))
    assert(audioGot(1).error_class.contains("bad_magic"))
    assert(audioGot(2).status == "quarantined")
    // video: a truncated final frame
    val sz = VideoCodec.frameSize(8, 8)
    val y4m = VideoCodec.encodeY4m(8, 8, 25, 1,
      Seq(new Array[Byte](sz), new Array[Byte](sz)))
    val videoGot = QuarantineOps.tryDecodeVideoAll(spark, table(Seq(
      1L -> y4m, 2L -> y4m.take(y4m.length - 10)))).collect()
      .sortBy(_.doc_id)
    assert(videoGot(0).status == "ok" &&
      videoGot(0).n_frames.contains(2L))
    assert(videoGot(1).error_class.contains("truncated"))
  }

  test("attempt() absorbs only data errors — fatal throwables still " +
      "fail the task") {
    assert(QuarantineOps.attempt(42) == Right(42))
    assert(QuarantineOps.attempt(
      throw new IllegalArgumentException("gzip: bad magic at byte 0"))
      == Left("bad_magic"))
    intercept[OutOfMemoryError] {
      QuarantineOps.attempt(throw new OutOfMemoryError("boom"))
    }
  }

  test("classify maps the codec family's message vocabulary onto " +
      "stable classes, most specific first") {
    def c(m: String) =
      QuarantineOps.classify(new IllegalArgumentException(m))
    assert(c("unsupported image magic: 0xdead") == "bad_magic")
    assert(c("PNG: bad signature") == "bad_magic")
    assert(c("WAV: not a RIFF/WAVE file") == "bad_magic")
    assert(c("PNG: CRC mismatch in IDAT chunk") == "integrity")
    assert(c("tar: header checksum mismatch at byte 0") == "integrity")
    assert(c("gzip: member ISIZE mismatch at byte 9") == "integrity")
    assert(c("PNG: inflated stream size mismatch") == "integrity")
    assert(c("PPM: truncated pixel plane (1 < 2)") == "truncated")
    assert(c("gzip: unterminated FNAME") == "truncated")
    assert(c("PPM: unreasonable dimensions 9 x 9") == "hostile_header")
    assert(c("PPM: header integer overflows at byte 3")
      == "hostile_header")
    assert(c("gzip: decompressed size exceeds the 4096-byte cap")
      == "hostile_header")
    assert(c("something else entirely") == "decode_error")
  }
}
