package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Gates for HTTP/1.1 response parsing: a hand-built golden message
  * (assembled from the public RFC 9112 grammar, independent of the
  * encoder), both transfer codings, charset extraction, and the
  * fail-loud corruption surface with its quarantine classes. */
class HttpOpsSpec extends AnyFunSuite {

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("hand-built golden identity response parses to exact " +
      "status/headers/body") {
    val r = HttpOps.parseResponse(ascii(
      "HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n" +
        "Content-Length: 11\r\n\r\n" +
        "hello crawl"))
    assert(r.status == 200 && r.reason == "OK" && !r.chunked)
    assert(r.headers.map(_._1) == Seq("Content-Type", "Content-Length"))
    assert(r.contentType.contains("text/html"))
    assert(r.charset.contains("utf-8")) // lowercased
    assert(new String(r.body, "US-ASCII") == "hello crawl")
  }

  test("hand-built chunked response de-chunks byte-exactly, counts " +
      "chunks, and handles hex sizes") {
    // 26 bytes split 10+10+6: sizes a, a, 6
    val r = HttpOps.parseResponse(ascii(
      "HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" +
        "a\r\nabcdefghij\r\n" +
        "a\r\nklmnopqrst\r\n" +
        "6\r\nuvwxyz\r\n" +
        "0\r\n\r\n"))
    assert(r.chunked && r.nChunks == 3)
    assert(new String(r.body, "US-ASCII") ==
      "abcdefghijklmnopqrstuvwxyz")
  }

  test("encoder round-trips through the parser in both codings, " +
      "including the empty body and a non-200 status") {
    for (body <- Seq("", "x", "y" * 250); chunk <- Seq(0, 100)) {
      val enc = HttpOps.encodeResponse(404, "Not Found",
        Seq("Content-Type" -> "text/plain; charset=utf-8"),
        body.getBytes("UTF-8"), chunkSize = chunk)
      val r = HttpOps.parseResponse(enc)
      assert(r.status == 404 && new String(r.body, "UTF-8") == body)
      assert(r.chunked == (chunk > 0))
      if (chunk > 0)
        assert(r.nChunks == (body.length + 99) / 100)
    }
  }

  test("corrupt framing fails loud with the shared quarantine " +
      "vocabulary: status line, chunk size, truncation, " +
      "Content-Length disagreement") {
    def cls(bytes: Array[Byte]): String =
      QuarantineOps.attempt(HttpOps.parseResponse(bytes))
        .swap.getOrElse(fail("parsed corrupt input"))
    // garbage status line → decode_error
    assert(cls(ascii("ICY 200 OK\r\n\r\nx")) == "decode_error")
    // non-hex chunk size → decode_error (malformed)
    assert(cls(ascii("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\nzz\r\nxx\r\n0\r\n\r\n"))
      == "decode_error")
    // chunk data cut off → truncated
    assert(cls(ascii("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\na\r\nabc"))
      == "truncated")
    // missing final CRLF after the 0 chunk → truncated
    assert(cls(ascii("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n1\r\nx\r\n0\r\n"))
      == "truncated")
    // Content-Length disagrees with the body → truncated
    assert(cls(ascii("HTTP/1.1 200 OK\r\n" +
      "Content-Length: 99\r\n\r\nshort"))
      == "truncated")
    // trailing bytes after the chunk terminator → hostile_header
    // ("exceeds"-family wording is not used here; 'trailing bytes'
    // lands in decode_error) — assert it fails, class is secondary
    assert(cls(ascii("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n0\r\n\r\nJUNK"))
      != "ok")
  }

  test("chunk sizes are bounded — a hostile 7+-hex-digit size dies " +
      "before any allocation") {
    val e = intercept[IllegalArgumentException] {
      HttpOps.parseResponse(ascii("HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n\r\nfffffff0\r\nx\r\n0\r\n\r\n"))
    }
    assert(e.getMessage.contains("unreasonable"))
  }

  test("leading zeros in a chunk size are RFC-legal: the hostile-size " +
      "gate applies to the value, not the digit count") {
    // '0000000a' is 8 hex digits but a legal 10 — foreign captures
    // emit zero-padded sizes; only the stripped value is gated
    val r = HttpOps.parseResponse(ascii(
      "HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" +
        "0000000a\r\nabcdefghij\r\n" +
        "0\r\n\r\n"))
    assert(r.nChunks == 1 &&
      new String(r.body, "US-ASCII") == "abcdefghij")
    // a zero-padded HOSTILE size still dies before allocation
    val e = intercept[IllegalArgumentException] {
      HttpOps.parseResponse(ascii("HTTP/1.1 200 OK\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n0fffffff0\r\nx\r\n0\r\n\r\n"))
    }
    assert(e.getMessage.contains("unreasonable"))
  }
}
