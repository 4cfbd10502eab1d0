package graft.ops

import com.github.luben.zstd.{Zstd, ZstdDecompressCtx}

import graft.{SparkSpec, Tables}

/** Gates for Zstandard-blob ingestion: round-trips against the
  * library's own one-shot API, multi-frame concatenation, corruption
  * (checksum, truncation, junk magic), the declared-size cap, and
  * byte-exact corpus recovery through the generator → decoder path. */
class ZstdOpsSpec extends SparkSpec {

  private def withCtx[T](f: ZstdDecompressCtx => T): T = {
    val ctx = new ZstdDecompressCtx()
    try f(ctx) finally ctx.close()
  }

  test("a frame produced by the library's one-shot compressor " +
      "round-trips (decoder is independent of the table generator)") {
    val data = ("zstd round trip " * 20).getBytes("UTF-8")
    val frame = Zstd.compress(data, 3)
    withCtx { ctx =>
      assert(ZstdOps.unzstdWith(frame, ctx).toSeq == data.toSeq)
    }
  }

  test("concatenated frames decompress to the concatenation — a " +
      "first-frame-stops decoder would truncate") {
    val a = "alpha ".getBytes("UTF-8")
    val b = "beta".getBytes("UTF-8")
    val stream = Zstd.compress(a, 3) ++ Zstd.compress(b, 3)
    withCtx { ctx =>
      assert(ZstdOps.unzstdWith(stream, ctx).toSeq == (a ++ b).toSeq)
    }
  }

  test("corruption fails loud: junk magic, truncated frame, flipped " +
      "payload byte; hostile declared size hits the cap") {
    val data = ("y" * 500).getBytes("UTF-8")
    val frame = Zstd.compress(data, 3)
    withCtx { ctx =>
      intercept[IllegalArgumentException] {
        ZstdOps.unzstdWith("not zstd data here".getBytes("UTF-8"), ctx)
      }
      intercept[IllegalArgumentException] {
        ZstdOps.unzstdWith(frame.dropRight(4), ctx)
      }
      val flipped = frame.clone()
      flipped(frame.length / 2) = (flipped(frame.length / 2) ^ 0x20).toByte
      intercept[IllegalArgumentException] {
        ZstdOps.unzstdWith(flipped, ctx)
      }
      intercept[IllegalArgumentException] {
        ZstdOps.unzstdWith(frame, ctx, cap = 100)
      }
      // intact frame under a sufficient cap still decodes
      assert(ZstdOps.unzstdWith(frame, ctx).length == data.length)
    }
  }

  test("corpus recovery is byte-exact (even ids via two frames) and " +
      "quarantine classes fit the shared vocabulary") {
    val docs = Tables.documents(spark, Sf0001)
    val metas = ZstdOps.unzstdAll(spark,
      ZstdOps.zstdTable(spark, docs)).collect()
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
    // classifier integration: truncation and junk magic map to the
    // quarantine lane's stable classes
    val frame = Zstd.compress("abc".getBytes("UTF-8"), 3)
    withCtx { ctx =>
      assert(QuarantineOps.attempt(
        ZstdOps.unzstdWith(frame.dropRight(3), ctx))
        == Left("truncated"))
    }
  }
}
