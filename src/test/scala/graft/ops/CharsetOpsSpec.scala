package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Gates for charset sniffing + transcoding: BOM authority, strict
  * UTF-8 validation, the Shift_JIS lead-byte precondition (the cp1252
  * misdetection trap), declared-charset precedence, and the
  * undecodable quarantine class. */
class CharsetOpsSpec extends AnyFunSuite {

  test("BOMs are authoritative and stripped") {
    val (d1, t1) = CharsetOps.sniffTranscode(
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
        "hello".getBytes("UTF-8"))
    assert(d1 == "utf-8-bom" && t1 == "hello")
    val (d2, t2) = CharsetOps.sniffTranscode(
      Array[Byte](0xff.toByte, 0xfe.toByte) ++
        "hi ★".getBytes("UTF-16LE"))
    assert(d2 == "utf-16le" && t2 == "hi ★")
    val (d3, t3) = CharsetOps.sniffTranscode(
      Array[Byte](0xfe.toByte, 0xff.toByte) ++
        "yo".getBytes("UTF-16BE"))
    assert(d3 == "utf-16be" && t3 == "yo")
  }

  test("the cp1252/Shift_JIS trap: 0xE9 is an SJIS lead byte, but an " +
      "invalid trail must fall through to windows-1252") {
    val (d, t) = CharsetOps.sniffTranscode(
      "resumé!".getBytes("windows-1252"))
    assert(d == "windows-1252" && t == "resumé!")
    // real Shift_JIS with CJK double-byte chars detects as such
    val (d2, t2) = CharsetOps.sniffTranscode(
      "tokyo 日本語".getBytes("Shift_JIS"))
    assert(d2 == "shift_jis" && t2 == "tokyo 日本語")
    // plain multi-byte UTF-8 wins before any legacy charset
    val (d3, t3) = CharsetOps.sniffTranscode("über".getBytes("UTF-8"))
    assert(d3 == "utf-8" && t3 == "über")
    // pure ASCII is trivially UTF-8
    assert(CharsetOps.sniffTranscode("plain".getBytes("US-ASCII"))._1
      == "utf-8")
  }

  test("undecodable bytes fail loud and land in the quarantine " +
      "lane's decode_error class") {
    // 0x81 0x20: invalid UTF-8, invalid SJIS trail, unmapped in
    // cp1252 — no candidate decodes it strictly
    val bad = Array[Byte](0x81.toByte, 0x20, 0x81.toByte)
    val e = intercept[IllegalArgumentException] {
      CharsetOps.sniffTranscode(bad)
    }
    assert(e.getMessage.contains("undecodable"))
    assert(QuarantineOps.attempt(CharsetOps.sniffTranscode(bad))
      .swap.getOrElse("") == "decode_error")
  }

  test("a declared charset (Content-Type) wins over the heuristic, " +
      "but a BOM outranks it and an undecodable body falls back") {
    // 'café!' bytes under cp1252 would sniff as cp1252 anyway; declare
    // ISO-8859-1 and the declaration is honored (same bytes decode)
    val bytes = "café!".getBytes("windows-1252")
    val (d1, t1) = CharsetOps.transcodeDeclared(bytes,
      Some("ISO-8859-1"))
    assert(d1 == "iso-8859-1" && t1 == "café!")
    // a BOM outranks the (wrong) declaration
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "x".getBytes("UTF-8")
    assert(CharsetOps.transcodeDeclared(bom,
      Some("Shift_JIS"))._1 == "utf-8-bom")
    // an unknown declared name falls back to the sniffer
    assert(CharsetOps.transcodeDeclared("plain".getBytes("US-ASCII"),
      Some("x-nonsense"))._1 == "utf-8")
    // a declaration the body violates falls back instead of U+FFFD
    val sjis = "日本語".getBytes("Shift_JIS")
    assert(CharsetOps.transcodeDeclared(sjis, Some("UTF-8"))._1
      == "shift_jis")
  }

  test("BOM-looking legacy bytes do not hijack a correct declaration: " +
      "the BOM outranks it only when its own decode succeeds") {
    // cp1252 text opening 'ÿþ' is byte-identical to the UTF-16LE BOM;
    // with an odd byte count the UTF-16 force-decode fails strictly,
    // and the DECLARED cp1252 decode must win (it used to throw)
    val legacy = "ÿþ odd!".getBytes("windows-1252")
    assert(legacy.length % 2 == 1 &&
      (legacy(0) & 0xff) == 0xff && (legacy(1) & 0xff) == 0xfe)
    val (d, t) = CharsetOps.transcodeDeclared(legacy,
      Some("windows-1252"))
    assert(d == "windows-1252" && t == "ÿþ odd!")
    // without a declaration the same body still fails loud (no
    // candidate decodes it strictly after the BOM path is exhausted)
    assert(QuarantineOps.attempt(CharsetOps.transcodeDeclared(legacy,
      None)).isLeft)
    // a REAL UTF-16LE body keeps outranking a wrong declaration
    val utf16 = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      "real".getBytes("UTF-16LE")
    val (d2, t2) = CharsetOps.transcodeDeclared(utf16,
      Some("windows-1252"))
    assert(d2 == "utf-16le" && t2 == "real")
  }

  test("the generator's five arms round-trip byte-exactly through " +
      "sniff + transcode (the oracle contract, locally)") {
    val texts = Seq("alpha beta", "", "the quick. brown fox", "x")
    for ((text, i) <- texts.zipWithIndex; arm <- 0 to 4) {
      val id = arm + 5L * i
      val bytes = (arm: @unchecked) match {
        case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
          text.getBytes("UTF-8")
        case 1 => (text + " café!").getBytes("windows-1252")
        case 2 => (text + " 日本語").getBytes("Shift_JIS")
        case 3 => Array[Byte](0xff.toByte, 0xfe.toByte) ++
          (text + " ★").getBytes("UTF-16LE")
        case 4 => (text + " ü").getBytes("UTF-8")
      }
      val (detected, out) = CharsetOps.sniffTranscode(bytes)
      val wantDetected = Seq("utf-8-bom", "windows-1252", "shift_jis",
        "utf-16le", "utf-8")(arm)
      val wantText = text + Seq("", " café!", " 日本語", " ★", " ü")(arm)
      assert(detected == wantDetected, s"arm $arm id $id")
      assert(out == wantText, s"arm $arm id $id")
    }
  }
}
