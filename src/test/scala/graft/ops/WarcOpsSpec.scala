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

  // ---- r13: streaming member-at-a-time walk -------------------------

  private def buildFile(docs: Seq[(Long, String)],
      corrupt: (Long, Array[Byte]) => Array[Byte] = (_, b) => b)
      : Array[Byte] = {
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, true)
    val crc = new java.util.zip.CRC32()
    val out = new java.io.ByteArrayOutputStream()
    def member(id: Long, rec: Array[Byte]): Unit = {
      val one = new java.io.ByteArrayOutputStream()
      CompressedOps.gzipMember(rec, defl, crc, one)
      val b = corrupt(id, one.toByteArray)
      out.write(b, 0, b.length)
    }
    member(-1L, WarcOps.record("warcinfo", Seq.empty, WarcOps.InfoBlock))
    docs.foreach { case (id, text) =>
      val uri = s"https://example.com/doc/$id"
      member(-1L, WarcOps.record("request",
        Seq("WARC-Target-URI" -> uri),
        s"GET /doc/$id HTTP/1.1\r\n\r\n".getBytes("US-ASCII")))
      member(id, WarcOps.record("response",
        Seq("WARC-Target-URI" -> uri), text.getBytes("UTF-8")))
    }
    defl.end()
    out.toByteArray
  }

  test("r13: one corrupt member quarantines ONE capture — the other " +
      "49 siblings in the same file survive with exact witnesses") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => i -> s"document number $i body")
    // flip the stored gzip CRC of doc 17's response member
    val bytes = buildFile(docs, (id, b) =>
      if (id == 17L) { val c = b.clone()
        c(c.length - 8) = (c(c.length - 8) ^ 0x01).toByte; c } else b)
    val got = WarcOps.tryReadWarcFiles(spark,
      Seq((0L, bytes)).toDF("file_id", "content")).collect()
    val quarantined = got.filter(_.status == "quarantined")
    assert(quarantined.length == 1)
    assert(quarantined.head.error_class.contains("integrity"))
    assert(quarantined.head.member_idx == 1 + 2 * 17 + 1) // response slot
    val ok = got.filter(_.status == "ok")
    assert(ok.length == 49 && !ok.exists(_.doc_id.contains(17L)))
    val md = java.security.MessageDigest.getInstance("MD5")
    ok.foreach { c =>
      val raw = s"document number ${c.doc_id.get} body".getBytes("UTF-8")
      md.reset()
      assert(c.resp_md5.contains(
        md.digest(raw).map("%02x".format(_)).mkString))
    }
  }

  test("r13: a corrupt REQUEST record costs only that member — its " +
      "own response still survives; deflate corruption resyncs via " +
      "the member-magic scan") {
    import spark.implicits._
    val docs = (0L until 6L).map(i => i -> s"body $i")
    // doc 2: overwrite the request RECORD's first byte pre-compression
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_SPEED, true)
    val crc = new java.util.zip.CRC32()
    val out = new java.io.ByteArrayOutputStream()
    def member(rec: Array[Byte], mangleDeflate: Boolean = false): Unit = {
      val one = new java.io.ByteArrayOutputStream()
      CompressedOps.gzipMember(rec, defl, crc, one)
      val b = one.toByteArray
      if (mangleDeflate) // smash deflate bytes mid-member: lost sync
        for (i <- 12 until math.min(b.length - 8, 18))
          b(i) = 0x55.toByte
      out.write(b, 0, b.length)
    }
    member(WarcOps.record("warcinfo", Seq.empty, WarcOps.InfoBlock))
    docs.foreach { case (id, text) =>
      val uri = s"https://example.com/doc/$id"
      val req = WarcOps.record("request",
        Seq("WARC-Target-URI" -> uri),
        s"GET /doc/$id HTTP/1.1\r\n\r\n".getBytes("US-ASCII"))
      if (id == 2L) req(0) = 'X'.toByte
      member(req, mangleDeflate = id == 4L)
      member(WarcOps.record("response",
        Seq("WARC-Target-URI" -> uri), text.getBytes("UTF-8")))
    }
    defl.end()
    val got = WarcOps.tryReadWarcFiles(spark,
      Seq((0L, out.toByteArray)).toDF("file_id", "content")).collect()
    val ok = got.filter(_.status == "ok").flatMap(_.doc_id)
    // doc 2's response survives its corrupt request; doc 4's request
    // lost gzip sync but the scan resynced at the next member magic
    assert(ok.toSet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    val classes = got.filter(_.status == "quarantined")
      .flatMap(_.error_class).sorted.toSeq
    assert(classes == Seq("bad_magic", "decode_error") ||
      classes == Seq("bad_magic", "integrity"),
      s"got $classes")
  }

  test("r13: the production crawl decode stack quarantines per " +
      "CAPTURE — HTTP framing and charset failures each cost one " +
      "capture, siblings keep byte-exact transcoded witnesses") {
    val docs = Tables.documents(spark, Sf0001).limit(26)
    val got = WarcOps.tryReadWarcCrawlHttp(spark,
      WarcOps.corruptCrawlHttpTable(spark, docs, docsPerFile = 13))
      .collect().map(c => c.doc_id -> c).toMap
    assert(got.size == 26)
    val q = got.values.filter(_.status == "quarantined").toSeq
    // ids 5, 18 → truncated; 9, 22 → decode_error
    assert(q.map(_.doc_id).toSet == Set(5L, 9L, 18L, 22L))
    assert(got(5L).error_class == "truncated" &&
      got(18L).error_class == "truncated")
    assert(got(9L).error_class == "decode_error" &&
      got(22L).error_class == "decode_error")
    // every sibling survived with the right detected charset
    val md = java.security.MessageDigest.getInstance("MD5")
    Tables.documents(spark, Sf0001).limit(26)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().foreach { r =>
        val id = r.getAs[Long]("doc_id")
        if (id % 13 != 5 && id % 13 != 9) {
          val (name, marker, _) = WarcOps.charsetArm(id)
          val c = got(id)
          assert(c.status == "ok" && c.detected == name, s"doc $id")
          val utf8 = (r.getAs[String]("text") + marker).getBytes("UTF-8")
          md.reset()
          assert(c.n_out == utf8.length &&
            c.out_md5 == md.digest(utf8).map("%02x".format(_)).mkString,
            s"doc $id witnesses")
        }
      }
  }

  test("zero-byte crawl files quarantine with their FILE identity — " +
      "two empty files stay distinguishable and traceable") {
    import spark.implicits._
    val rows = WarcOps.tryReadWarcCrawlHttp(spark,
      Seq((7L, Array.empty[Byte]), (11L, Array.empty[Byte]))
        .toDF("file_id", "content")).collect()
    assert(rows.length == 2)
    assert(rows.map(_.doc_id).toSet == Set(7L, 11L))
    assert(rows.forall(r =>
      r.status == "quarantined" && r.error_class == "truncated"))
  }

  test("r14: robots/soft-404 arms surface through the parsed " +
      "capture, not id arithmetic — header, markup, template") {
    val docs = Tables.documents(spark, Sf0001).limit(80)
    val got = WarcOps.readWarcCrawlRobots(spark,
      WarcOps.robotsCrawlTable(spark, docs, docsPerFile = 40))
      .collect().map(c => c.doc_id -> c).toMap
    assert(got.size == 80)
    (0L until 80L).foreach { id =>
      val c = got(id)
      if (id % 10 == 9) assert(c.status == 404, s"doc $id")
      else {
        assert(c.status == 200, s"doc $id")
        // the header arm carries X-Robots-Tag; nobody else does
        assert((c.x_robots == "noindex") == (id % 7 == 3), s"doc $id")
        // the meta arm carries the head markup; nobody else does
        assert(c.html.contains(WarcOps.RobotsMeta) ==
          (id % 7 != 3 && id % 7 == 5), s"doc $id")
        // the soft-404 arm serves the error template; nobody else does
        assert(c.html.contains("<h1>Page Not Found</h1>") ==
          (id % 7 != 3 && id % 7 != 5 && id % 11 == 7), s"doc $id")
      }
    }
  }

  test("r13: bounded peak memory — a file whose TOTAL decompressed " +
      "size exceeds the member cap streams fine member-at-a-time") {
    import spark.implicits._
    val big = "lorem ipsum dolor sit amet " * 2000 // ~54 KB per doc
    val docs = (0L until 8L).map(i => i -> (s"doc $i " + big))
    val bytes = buildFile(docs)
    val memberCap = 1 << 17 // 128 KB: > one member, < the ~432 KB total
    // the OLD whole-file shape dies at this cap...
    val infl = new java.util.zip.Inflater(true)
    try intercept[IllegalArgumentException] {
      CompressedOps.gunzipWith(bytes, infl, cap = memberCap)
    } finally infl.end()
    // ...the streaming walk reads every capture within it
    val got = WarcOps.readWarcFilesAll(spark,
      Seq((0L, bytes)).toDF("file_id", "content"),
      memberCap = memberCap).collect()
    assert(got.length == 8 && got.forall(_.n_file_records == 17L))
    assert(got.forall(c =>
      c.resp_len == (s"doc ${c.doc_id} " + big).getBytes("UTF-8").length))
  }
}
