package graft.ops

import graft.{SparkSpec, Tables}

/** Gates for WARC ingestion: a hand-built golden record (assembled
  * from the public ISO 28500 grammar, independent of the writer),
  * multi-record walks with type dispatch, framing corruption
  * (version, Content-Length, separators), and byte-exact corpus
  * recovery through the full .warc.gz generator → reader path. */
class WarcOpsSpec extends SparkSpec {

  private def hand(warcType: String, body: Array[Byte],
      extra: String = ""): Array[Byte] =
    (s"WARC/1.1\r\nWARC-Type: $warcType\r\n$extra" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++
      body ++ "\r\n\r\n".getBytes("US-ASCII")

  test("hand-built golden record parses to exact type/headers/block") {
    val body = "hello, crawl!".getBytes("UTF-8")
    val recs = WarcOps.parseRecords(hand("response", body,
      "WARC-Target-URI: https://x.test/\r\n"))
    assert(recs.length == 1)
    assert(recs.head.warcType == "response")
    assert(recs.head.headers("WARC-Target-URI") == "https://x.test/")
    assert(recs.head.block.toSeq == body.toSeq)
  }

  test("multi-record streams walk in order and dispatch by type — " +
      "a block containing CRLFCRLF does not resync the parser") {
    val tricky = "body with\r\n\r\nembedded separators".getBytes("UTF-8")
    val recs = WarcOps.parseRecords(
      hand("warcinfo", WarcOps.InfoBlock) ++
        hand("request", "GET / HTTP/1.1\r\n\r\n".getBytes("US-ASCII")) ++
        hand("response", tricky))
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response"))
    assert(recs(2).block.toSeq == tricky.toSeq)
  }

  test("framing corruption fails loud: bad version, missing " +
      "Content-Length, length/separator disagreement, truncation") {
    val body = "x".getBytes("UTF-8")
    val good = hand("response", body)
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords("WARC/9.9\r\n\r\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(
        "WARC/1.1\r\nWARC-Type: response\r\n\r\nx\r\n\r\n"
          .getBytes("US-ASCII")) // no Content-Length
    }
    // declared length one short: the separator check must catch the
    // disagreement instead of resyncing mid-body
    val shortLen = ("WARC/1.1\r\nWARC-Type: response\r\n" +
      "Content-Length: 2\r\n\r\nabc\r\n\r\n").getBytes("US-ASCII")
    intercept[IllegalArgumentException] { WarcOps.parseRecords(shortLen) }
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(good.dropRight(3))
    }
    // hostile Content-Length values
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(("WARC/1.1\r\nWARC-Type: x\r\n" +
        "Content-Length: 999999\r\n\r\n").getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(("WARC/1.1\r\nWARC-Type: x\r\n" +
        "Content-Length: banana\r\n\r\n\r\n\r\n").getBytes("US-ASCII"))
    }
  }

  test("corpus recovery is byte-exact: every doc's response body " +
      "round-trips through .warc.gz (three members per file)") {
    val docs = Tables.documents(spark, Sf0001)
    val metas = WarcOps.readWarcAll(spark,
      WarcOps.warcTable(spark, docs)).collect()
      .map(m => m.doc_id -> m).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    docs.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val raw = r.getAs[String]("text").getBytes("UTF-8")
      md.reset()
      val hex = md.digest(raw).map("%02x".format(_)).mkString
      val m = metas(id)
      assert(m.n_records == 3L && m.resp_len == raw.length.toLong)
      assert(m.resp_md5 == hex, s"doc $id digest")
      assert(m.target_uri == s"https://example.com/doc/$id")
      assert(m.info_len == WarcOps.InfoBlock.length.toLong)
      assert(m.req_len == 41L + id.toString.length)
    }
  }

  test("multi-document files: 50-doc grouping, per-file explode, " +
      "ids recovered from the records' own URIs, grammar enforced") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
    val files = WarcOps.warcFileTable(spark, docs, docsPerFile = 50)
      .localCheckpoint(true)
    val got = WarcOps.readWarcFilesAll(spark, files).collect()
      .map(c => c.doc_id -> c).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = docs.select("doc_id", "text").collect()
    assert(got.size == rows.length, "one capture per doc")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val raw = r.getAs[String]("text").getBytes("UTF-8")
      md.reset()
      val hex = md.digest(raw).map("%02x".format(_)).mkString
      val c = got(id)
      assert(c.file_id == id / 50 && c.resp_len == raw.length &&
        c.resp_md5 == hex, s"doc $id")
    }
    // grammar enforcement: a file whose pair discipline is broken
    // (response before request) fails loud
    val bad = {
      val defl = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED, true)
      val crc = new java.util.zip.CRC32()
      val out = new java.io.ByteArrayOutputStream()
      def member(rec: Array[Byte]): Unit =
        CompressedOps.gzipMember(rec, defl, crc, out)
      member(WarcOps.record("warcinfo", Seq.empty, WarcOps.InfoBlock))
      member(WarcOps.record("response",
        Seq("WARC-Target-URI" -> "https://example.com/doc/1"),
        "x".getBytes("UTF-8")))
      member(WarcOps.record("request",
        Seq("WARC-Target-URI" -> "https://example.com/doc/1"),
        "y".getBytes("UTF-8")))
      defl.end()
      out.toByteArray
    }
    val e = intercept[org.apache.spark.SparkException] {
      WarcOps.readWarcFilesAll(spark,
        Seq((0L, bad)).toDF("file_id", "content")).collect()
    }
    assert(e.getMessage.contains("pair discipline") ||
      Option(e.getCause).exists(_.getMessage.contains("pair discipline")))
  }

  test("the quarantine lane composes: a flipped gzip byte in one " +
      "member quarantines the file, intact files stay ok") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).limit(3)
    val table = WarcOps.warcTable(spark, docs)
    val rows = table.as[Multimodal.MediaRow].collect()
    val corrupted = rows.zipWithIndex.map { case (r, i) =>
      if (i == 0) {
        val b = r.content.clone()
        b(b.length - 6) = (b(b.length - 6) ^ 0x10).toByte
        (r.doc_id, b)
      } else (r.doc_id, r.content)
    }.toSeq.toDF("doc_id", "content")
    val got = corrupted.as[Multimodal.MediaRow].mapPartitions { it =>
      val infl = new java.util.zip.Inflater(true)
      it.map { r =>
        (r.doc_id, QuarantineOps.attempt(
          WarcOps.parseRecords(
            CompressedOps.gunzipWith(r.content, infl)).length)
          .fold(identity, n => s"ok:$n"))
      }
    }.collect().toMap
    assert(got.values.count(_ == "integrity") == 1)
    assert(got.values.count(_ == "ok:3") == 2)
  }
}
