package graft.ops

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Multimodal.MediaRow

/** Compressed-blob text ingestion — the shape real corpora arrive in
  * (`.jsonl.gz` / warc.gz members): documents stored as opaque gzip
  * payloads that the pipeline must decompress, integrity-check, and
  * only then gate/feature. This is a REAL RFC 1952 implementation:
  * the member walk parses headers (magic, CM, the FLG optional
  * fields: FEXTRA / FNAME / FCOMMENT / FHCRC), inflates the raw
  * deflate body, and verifies each member's CRC-32 and ISIZE trailer
  * — corruption fails loud at the decompression boundary instead of
  * flowing garbage into dedup/quality stages.
  *
  * Multi-member streams are part of the contract: gzip files are
  * routinely the CONCATENATION of independently-compressed members
  * (block-parallel compressors, appended logs), and a decoder that
  * stops at the first trailer silently truncates the document. The
  * generator makes every even-id doc a two-member stream so the
  * oracle catches exactly that bug.
  *
  * Resource discipline: zlib state is ~270 KB of NATIVE memory per
  * Deflater/Inflater. The partition-wise operators allocate ONE of
  * each per partition and `reset()` per row/member — per-row
  * `GZIPOutputStream`/`GZIPInputStream` objects (the first cut) put
  * thousands of un-finalized native allocations per task on the
  * cleaner queue, which is both a memory and a latency tax at scale.
  *
  * Scale note: decompression is row-local, map-shaped work in the
  * same `mapPartitions` slot as the media codecs ([[Multimodal]]);
  * compressed payloads and inflated buffers never leave the task —
  * only length/digest witness columns travel. The oracle replays the
  * witnesses from the ORIGINAL text (`strlen`, `md5`), so a match
  * certifies the decompressed bytes equal the pre-compression bytes
  * exactly.
  */
object CompressedOps {

  private def le32At(bytes: Array[Byte], at: Int): Long =
    (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
      ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)

  /** Write one gzip member (RFC 1952: 10-byte header with FLG=0, raw
    * deflate body, CRC-32 + ISIZE little-endian trailer) using the
    * CALLER's Deflater/CRC32 — reset here, reusable across rows. */
  def gzipMember(data: Array[Byte], defl: Deflater, crc: CRC32,
      out: java.io.ByteArrayOutputStream): Unit = {
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte), 0, 10)
    defl.reset()
    defl.setInput(data)
    defl.finish()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      out.write(buf, 0, n)
    }
    crc.reset(); crc.update(data)
    val c = crc.getValue; val isize = data.length.toLong & 0xffffffffL
    out.write(Array[Byte](
      (c & 0xff).toByte, ((c >> 8) & 0xff).toByte,
      ((c >> 16) & 0xff).toByte, ((c >> 24) & 0xff).toByte,
      (isize & 0xff).toByte, ((isize >> 8) & 0xff).toByte,
      ((isize >> 16) & 0xff).toByte, ((isize >> 24) & 0xff).toByte),
      0, 8)
  }

  /** Build a table of gzip-compressed documents: the UTF-8 text bytes
    * of each doc, compressed as ONE gzip member for odd doc_ids and
    * as TWO concatenated members (text split at the byte midpoint)
    * for even ids — the multi-member layout block-parallel
    * compressors emit. BEST_SPEED: the graded contract is the decode
    * side; the generator exists to feed it real streams. One Deflater
    * per partition. */
  def gzipTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    StorageOps.fanOutForKernel(
      docs.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val defl = new Deflater(Deflater.BEST_SPEED, true)
        Multimodal.endOnTaskCompletion(() => defl.end())
        val crc = new CRC32()
        rows.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
          if (id % 2 == 0 && raw.length >= 2) {
            val mid = raw.length / 2
            gzipMember(java.util.Arrays.copyOfRange(raw, 0, mid),
              defl, crc, out)
            gzipMember(java.util.Arrays.copyOfRange(raw, mid, raw.length),
              defl, crc, out)
          } else gzipMember(raw, defl, crc, out)
          (id, out.toByteArray)
        }
      }
      .toDF("doc_id", "content")
  }

  /** Decompress one gzip payload (all members) with a fresh
    * Inflater — see [[gunzipWith]] for the partition-wise reusable
    * form. */
  def gunzip(bytes: Array[Byte], cap: Int = 1 << 26): Array[Byte] = {
    val infl = new Inflater(true)
    try gunzipWith(bytes, infl, cap) finally infl.end()
  }

  /** A gzip-member failure that still knows where the NEXT member
    * starts (`resumePos >= 0`): trailer integrity failures (CRC /
    * ISIZE) are detected AFTER the member's deflate stream was fully
    * consumed, so a member-granular reader can quarantine exactly one
    * member and resume at the boundary. Header or deflate-stream
    * corruption loses sync (`resumePos == -1`) — the caller must
    * rescan for a member magic or abandon the stream. */
  final class GzipMemberException(msg: String, val resumePos: Int)
      extends IllegalArgumentException(msg)

  /** Scan for the next plausible gzip member start (`1f 8b 08`) at or
    * after `from`; -1 if none. The resync primitive member-granular
    * readers use after a lost-sync failure — the standard recovery
    * posture for member-per-record WARC files. */
  def findGzipMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    while (i + 2 < bytes.length) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
          bytes(i + 2) == 8.toByte) return i
      i += 1
    }
    -1
  }

  /** Inflate exactly ONE RFC 1952 member starting at `pos` with a
    * caller-owned raw Inflater: full header validation (magic / CM /
    * reserved FLG / FEXTRA / FNAME / FCOMMENT / FHCRC), CRC-32 + ISIZE
    * trailer verification, output bounded by `cap`. Returns the
    * member's decompressed bytes and the offset just past its trailer.
    * Throws [[GzipMemberException]] with a valid `resumePos` for
    * trailer integrity failures (framing intact — a member-granular
    * reader can skip exactly this member), `resumePos == -1` when sync
    * is lost. This is the PEAK-MEMORY primitive: a reader that calls
    * it member-at-a-time holds one member, never the decompressed
    * concatenation. */
  def inflateMemberAt(bytes: Array[Byte], pos: Int, infl: Inflater,
      cap: Int = 1 << 26): (Array[Byte], Int) = {
    def fail(msg: String, resume: Int = -1): Nothing =
      throw new GzipMemberException(msg, resume)
    if (bytes.length - pos < 10) fail("gzip: truncated member header")
    if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b)
      fail(s"gzip: bad magic at byte $pos")
    if (bytes(pos + 2) != 8.toByte)
      fail(s"gzip: unsupported compression method ${bytes(pos + 2)}")
    val flg = bytes(pos + 3) & 0xff
    if ((flg & 0xe0) != 0) fail("gzip: reserved FLG bits set")
    val crc = new CRC32()
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (bytes.length - p < 2) fail("gzip: truncated FEXTRA length")
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2 + xlen
      if (p > bytes.length) fail("gzip: truncated FEXTRA data")
    }
    def skipZString(field: String): Unit = {
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) fail(s"gzip: unterminated $field")
      p += 1
    }
    if ((flg & 8) != 0) skipZString("FNAME")
    if ((flg & 16) != 0) skipZString("FCOMMENT")
    if ((flg & 2) != 0) { // FHCRC: CRC-16 of the header bytes so far
      if (bytes.length - p < 2) fail("gzip: truncated FHCRC")
      crc.reset(); crc.update(bytes, pos, p - pos)
      val want = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      if ((crc.getValue & 0xffffL) != want)
        fail(s"gzip: header CRC16 mismatch at byte $p")
      p += 2
    }
    infl.reset()
    infl.setInput(bytes, p, bytes.length - p)
    crc.reset()
    val out = new java.io.ByteArrayOutputStream(
      math.max(64L, math.min(cap.toLong,
        (bytes.length.toLong - p) * 4)).toInt)
    val buf = new Array[Byte](8192)
    var memberLen = 0L
    while (!infl.finished()) {
      val n =
        try infl.inflate(buf)
        catch { case e: DataFormatException =>
          fail(s"gzip: corrupt deflate stream at byte $p: ${e.getMessage}")
        }
      if (n == 0 && !infl.finished())
        fail("gzip: truncated deflate stream")
      if (out.size() + n > cap)
        fail(s"gzip: decompressed size exceeds the $cap-byte cap")
      out.write(buf, 0, n)
      crc.update(buf, 0, n)
      memberLen += n
    }
    p += infl.getBytesRead.toInt
    if (bytes.length - p < 8) fail("gzip: truncated member trailer")
    // trailer failures know their resume point: the deflate stream
    // was structurally sound, only the integrity witness disagrees
    if (le32At(bytes, p) != crc.getValue)
      fail(s"gzip: member CRC mismatch at byte $p", p + 8)
    if (le32At(bytes, p + 4) != (memberLen & 0xffffffffL))
      fail(s"gzip: member ISIZE mismatch at byte $p", p + 8)
    (out.toByteArray, p + 8)
  }

  /** The full RFC 1952 member walk with a CALLER-owned raw Inflater
    * (`new Inflater(true)`), reset per member. Headers are UNTRUSTED:
    * magic/CM/reserved-FLG validated, the optional FEXTRA / FNAME /
    * FCOMMENT / FHCRC fields bounds-checked and skipped, every
    * member's CRC-32 and ISIZE trailer verified, and the total
    * decompressed size bounded by `cap` — a hostile or corrupt
    * stream that inflates past the cap is an error, not an
    * allocation. Delegates to [[inflateMemberAt]] per member. */
  def gunzipWith(bytes: Array[Byte], infl: Inflater,
      cap: Int = 1 << 26): Array[Byte] = {
    require(bytes.length >= 18, "gzip: truncated stream")
    // size hint in LONG arithmetic (same guard as ZstdOps.unzstdWith):
    // bytes.length * 4 overflows Int past 512 MiB of input
    val out = new java.io.ByteArrayOutputStream(
      math.max(64L, math.min(cap.toLong, bytes.length.toLong * 4)).toInt)
    var pos = 0
    while (pos < bytes.length) {
      val (data, next) = inflateMemberAt(bytes, pos, infl,
        cap - out.size())
      out.write(data, 0, data.length)
      pos = next
    }
    out.toByteArray
  }

  /** One decompressed document's witnesses: the raw byte length and
    * the MD5 of the decompressed bytes — both replayable from the
    * ORIGINAL text, so the oracle certifies byte-exact recovery. */
  case class GunzipMeta(doc_id: Long, n_raw: Long, text_md5: String)

  /** Batch decompress + witness: one partition-wise pass with ONE
    * Inflater/digest per partition; inflated buffers never leave the
    * task. */
  def gunzipAll(spark: SparkSession,
      media: DataFrame): Dataset[GunzipMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val infl = new Inflater(true)
      Multimodal.endOnTaskCompletion(() => infl.end())
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val raw = gunzipWith(r.content, infl)
        md.reset()
        val hex = md.digest(raw).map("%02x".format(_)).mkString
        GunzipMeta(r.doc_id, raw.length.toLong, hex)
      }
    }
  }
}
