package graft.ops

import graft.{SparkSpec, Tables}

/** Gates for gzip-blob text ingestion: a hand-built golden gzip
  * member (raw stored-mode deflate + longhand trailer layout,
  * independent of GZIPOutputStream), multi-member concatenation,
  * CRC-verified corruption failure, the inflation cap, and byte-exact
  * corpus recovery through the full generator → decompress path. */
class CompressedOpsSpec extends SparkSpec {

  private def le32(v: Long) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One gzip member assembled byte-by-byte from RFC 1952: fixed
    * 10-byte header, a raw STORED deflate block, CRC-32 + ISIZE
    * little-endian trailer. Only the CRC value comes from the JDK's
    * public CRC32 — no GZIPOutputStream involved. */
  private def handMember(data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32(); crc.update(data)
    Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte) ++
      Array[Byte](0x01,
        (data.length & 0xff).toByte, ((data.length >> 8) & 0xff).toByte,
        (~data.length & 0xff).toByte,
        ((~data.length >> 8) & 0xff).toByte) ++
      data ++ le32(crc.getValue) ++ le32(data.length.toLong)
  }

  test("hand-built golden gzip member decompresses to exact bytes") {
    val data = "hello, corpus!".getBytes("UTF-8")
    assert(CompressedOps.gunzip(handMember(data)).toSeq == data.toSeq)
  }

  test("concatenated members decompress to the concatenation — a " +
      "first-trailer-stops decoder would truncate") {
    val a = "first half / ".getBytes("UTF-8")
    val b = "second half".getBytes("UTF-8")
    val got = CompressedOps.gunzip(handMember(a) ++ handMember(b))
    assert(got.toSeq == (a ++ b).toSeq)
  }

  test("corruption fails loud: flipped payload bit (CRC), truncated " +
      "trailer, non-gzip magic") {
    val data = ("x" * 100).getBytes("UTF-8")
    val good = handMember(data)
    val flipped = good.clone()
    flipped(20) = (flipped(20) ^ 0x10).toByte
    intercept[IllegalArgumentException] { CompressedOps.gunzip(flipped) }
    intercept[IllegalArgumentException] {
      CompressedOps.gunzip(good.slice(0, good.length - 3))
    }
    intercept[IllegalArgumentException] {
      CompressedOps.gunzip("not gzip at all".getBytes("UTF-8"))
    }
    // optional header fields are parsed, not rejected: FNAME + FHCRC
    // in front of a valid member must skip cleanly... and their
    // truncation fails loud
    val payload = ("z" * 64).getBytes("UTF-8")
    val base = handMember(payload)
    val crc16 = { // FHCRC = low 16 bits of CRC32 over the header bytes
      val hdr = Array[Byte](0x1f, 0x8b.toByte, 8, 10, 0, 0, 0, 0, 0,
        0xff.toByte) ++ "name.txt".getBytes("US-ASCII") ++
        Array[Byte](0)
      val c = new java.util.zip.CRC32(); c.update(hdr)
      hdr ++ Array[Byte]((c.getValue & 0xff).toByte,
        ((c.getValue >> 8) & 0xff).toByte)
    }
    val withFields = crc16 ++ base.drop(10)
    assert(CompressedOps.gunzip(withFields).toSeq == payload.toSeq)
    intercept[IllegalArgumentException] {
      CompressedOps.gunzip(withFields.slice(0, 12)) // inside FNAME
    }
  }

  test("the inflation cap bounds hostile expansion") {
    val big = new Array[Byte](100000) // zeros compress ~1000x
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(big); gz.finish()
    intercept[IllegalArgumentException] {
      CompressedOps.gunzip(out.toByteArray, cap = 4096)
    }
    // same payload under a sufficient cap is fine
    assert(CompressedOps.gunzip(out.toByteArray).length == big.length)
  }

  test("corpus recovery is byte-exact: every doc's decompressed " +
      "bytes equal the original text (even ids via two members)") {
    val docs = Tables.documents(spark, Sf0001)
    val metas = CompressedOps.gunzipAll(spark,
      CompressedOps.gzipTable(spark, docs)).collect()
      .map(m => m.doc_id -> m).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val raw = r.getAs[String]("text").getBytes("UTF-8")
      md.reset()
      val hex = md.digest(raw).map("%02x".format(_)).mkString
      assert(metas(id).n_raw == raw.length.toLong, s"doc $id length")
      assert(metas(id).text_md5 == hex, s"doc $id digest")
    }
  }

  test("a corrupted FHCRC header is rejected — the stored CRC16 is " +
      "verified against the header bytes, not just skipped") {
    val payload = ("q" * 64).getBytes("UTF-8")
    val base = handMember(payload)
    val hdr = Array[Byte](0x1f, 0x8b.toByte, 8, 10, 0, 0, 0, 0, 0,
      0xff.toByte) ++ "name.txt".getBytes("US-ASCII") ++ Array[Byte](0)
    val c = new java.util.zip.CRC32(); c.update(hdr)
    val good = hdr ++ Array[Byte]((c.getValue & 0xff).toByte,
      ((c.getValue >> 8) & 0xff).toByte) ++ base.drop(10)
    assert(CompressedOps.gunzip(good).toSeq == payload.toSeq)
    // flip a byte inside the FNAME field: the body still inflates and
    // its CRC-32 still matches, so only the header CRC16 catches it
    val bad = good.clone()
    bad(12) = (bad(12) ^ 0x04).toByte
    val e = intercept[IllegalArgumentException] {
      CompressedOps.gunzip(bad)
    }
    assert(e.getMessage.contains("header CRC16"))
  }
}
