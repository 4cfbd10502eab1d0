package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the global packing family: the scalable exclusive
  * prefix sum ([[PackOps.withGlobalOffset]]) must equal the global
  * window it replaces for ANY partition count, and the block
  * arithmetic must reconstruct every interior training block to
  * exactly its full length from the exploded fragments. */
class PackOpsSpec extends SparkSpec {

  test("withGlobalOffset == global-window cumsum, invariant in parts") {
    import spark.implicits._
    // adversarial lengths: zeros, block-sized, giant multi-block doc
    val rows = Seq(
      (10L, 5L), (11L, 0L), (12L, 128L), (13L, 1L), (14L, 700L),
      (15L, 0L), (16L, 127L), (17L, 129L), (18L, 3L), (19L, 64L))
    // arrival order shuffled: the offset must come from doc_id order
    val df = scala.util.Random.shuffle(rows).toDF("doc_id", "n")
      .repartition(5)
    val naive = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, pn, pOff), (id, n)) =>
        (id, n, pOff + pn) }
      .drop(1).map { case (id, _, off) => (id, off) }.toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = PackOps.withGlobalOffset(df, "doc_id", "n", "off", parts)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("off")).toMap
      assert(got == naive, s"parts=$parts diverged: $got vs $naive")
    }
  }

  test("withGlobalOffset plan has no global window") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("doc_id", "n")
    val out = PackOps.withGlobalOffset(df, "doc_id", "n", "off", 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec [") ||
      !plan.matches("(?s).*Window.*partitionSpec=\\[\\].*"),
      s"global window leaked into the offset plan:\n$plan")
    // and the real check: every Window in the plan partitions by __pid
    import org.apache.spark.sql.execution.window.WindowExec
    out.queryExecution.executedPlan.collect {
      case w: WindowExec => assert(w.partitionSpec.nonEmpty,
        "withGlobalOffset must never use an empty partitionSpec window")
    }
  }

  test("block spans + contributions reconstruct every block exactly") {
    import spark.implicits._
    val L = 128L
    val docs = (1L to 200L).map(i => (i, (i * 37 % 300) + 1)).toDF("doc_id", "n_tok")
    val spans = PackOps.blockSpans(
      PackOps.withGlobalOffset(docs, "doc_id", "n_tok", "tok_start", 4),
      "tok_start", "n_tok", L)
    val contrib = PackOps.blockContributions(spans, "tok_start", "n_tok", L)
    val fills = contrib.groupBy(col("block_id"))
      .agg(sum(col("block_tokens")).as("fill"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = (1L to 200L).map(i => (i * 37 % 300) + 1).sum
    val lastBlock = (total - 1) / L
    assert(fills.keys.max == lastBlock)
    assert(fills.keys.min == 0L)
    assert(fills.size == lastBlock + 1, "no gaps in the block range")
    fills.foreach { case (b, f) =>
      if (b < lastBlock) assert(f == L, s"interior block $b fill $f != $L")
      else assert(f == total - lastBlock * L, s"final block fill $f")
    }
    // per-doc conservation: fragments sum back to each doc's n_tok
    val perDoc = contrib.groupBy(col("doc_id"))
      .agg(sum(col("block_tokens")).as("s"), first(col("n_tok")).as("n"))
      .filter(col("s") =!= col("n")).count()
    assert(perDoc == 0, "doc fragments must sum to the doc's tokens")
  }

  test("epochOrder: per-epoch uniform permutations matching the md5 rank") {
    import spark.implicits._
    val n = 97L
    val ids = (0L until n).toDF("block_id")
    val got = PackOps.epochOrder(ids, "block_id", epochs = 3, n = n, parts = 4)
      .collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("block_id")) ->
        r.getAs[Long]("pos")).toMap
    // naive reference: JVM md5 over the same key bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(e: Long, b: Long): String = {
      val d = md.digest(s"$e:$b".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    for (e <- 0L to 2L) {
      val want = (0L until n).sortBy(b => (h(e, b), b)).zipWithIndex
        .map { case (b, p) => (e, b) -> p.toLong }.toMap
      want.foreach { case (k, p) =>
        assert(got(k) == p, s"epoch $e block ${k._2}: ${got(k)} != $p") }
    }
    // epochs genuinely differ (md5 keyed by epoch)
    val e0 = (0L until n).map(b => got((0L, b)))
    val e1 = (0L until n).map(b => got((1L, b)))
    assert(e0 != e1, "epoch permutations must differ")
  }

  test("nextFitPack == sequential next-fit reference, invariant in parts") {
    import spark.implicits._
    val L = 128L
    // lengths crossing every branch: fits, closes block, exact fill,
    // multi-block span, span ending exactly on a boundary
    val docs = (0L until 150L).map { i =>
      (i, Seq(5L, 128L, 123L, 1L, 700L, 256L, 64L, 127L, 129L, 2L)(
        (i % 10).toInt))
    }
    val df = scala.util.Random.shuffle(docs).toDF("doc_id", "n_tok")
      .repartition(7)
    // naive reference: walk each 64-doc bucket sequentially, then
    // concatenate bucket block ranges in bucket order
    def walkBucket(ds: Seq[(Long, Long)]): (Seq[(Long, Long, Long, Long)], Long) = {
      var blk = 0L; var fill = 0L
      val out = ds.map { case (id, len) =>
        val fits = len <= L - fill
        val start = if (fits) blk else if (fill == 0) blk else blk + 1
        val last = start + (if (fits) 0L else (len - 1) / L)
        val off = if (fits) fill else 0L
        fill = if (fits) fill + len else len - (last - start) * L
        blk = last
        (id, start, last, off)
      }
      (out, blk + 1)
    }
    val byBucket = docs.groupBy(_._1 / 64).toSeq.sortBy(_._1)
    var base = 0L
    val want = byBucket.flatMap { case (_, ds) =>
      val (placed, used) = walkBucket(ds.sortBy(_._1))
      val rows = placed.map { case (id, f, l, off) =>
        id -> ((f + base, l + base, off)) }
      base += used
      rows
    }.toMap
    for (parts <- Seq(1, 4)) {
      val got = PackOps.nextFitPack(df, "doc_id", "n_tok", L, 64L, parts)
        .collect().map { r =>
          r.getAs[Long]("id") -> ((r.getAs[Long]("first_block"),
            r.getAs[Long]("last_block"), r.getAs[Long]("start_off")))
        }.toMap
      assert(got == want, s"parts=$parts diverged")
    }
    // structural invariants: short docs never straddle a block;
    // block capacity is never exceeded
    val got = PackOps.nextFitPack(df, "doc_id", "n_tok", L, 64L)
      .collect()
    got.foreach { r =>
      if (r.getAs[Long]("len") <= L)
        assert(r.getAs[Long]("first_block") == r.getAs[Long]("last_block"),
          s"short doc ${r.getAs[Long]("id")} straddles a block boundary")
    }
    val fillByBlock = got.flatMap { r =>
      val (f, l, off, len) = (r.getAs[Long]("first_block"),
        r.getAs[Long]("last_block"), r.getAs[Long]("start_off"),
        r.getAs[Long]("len"))
      (f to l).map { b =>
        val s = if (b == f) off else 0L
        val e = if (b == l) off + len - (l - f) * L else L
        b -> (e - s)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    fillByBlock.foreach { case (b, fill) =>
      assert(fill <= L, s"block $b overfilled: $fill > $L") }
  }

  test("greedy packing vs concat-and-chunk at sf0.001: same tokens, " +
      "padding only on the greedy side") {
    val greedy = graft.SparkEntry.queries("pipeline_pack_greedy")(
      spark, Sf0001).collect()
    val padding = graft.SparkEntry.queries("pipeline_pack_padding")(
      spark, Sf0001).collect()
    val global = graft.SparkEntry.queries("pipeline_pack_global")(
      spark, Sf0001).collect()
    // both layouts carry the identical token totals
    val tokG = greedy.map(_.getAs[Long]("n_tok")).sum
    assert(tokG == global.map(_.getAs[Long]("n_tok")).sum)
    assert(padding.map(_.getAs[Long]("n_tokens")).sum == tokG)
    // padding is non-negative and the greedy layout never uses fewer
    // blocks than the zero-padding concat layout
    padding.foreach { r =>
      assert(r.getAs[Long]("pad_tokens") >= 0L)
      assert(r.getAs[Long]("pad_tokens") ==
        r.getAs[Long]("n_blocks") * 128L - r.getAs[Long]("n_tokens"))
    }
    val blocksGreedy = padding.map(_.getAs[Long]("n_blocks")).sum
    val blocksConcat = (tokG + 127L) / 128L
    assert(blocksGreedy >= blocksConcat)
    // epoch shuffle covers exactly the concat layout's block range,
    // each epoch a bijection onto positions 0..n-1
    val sh = graft.SparkEntry.queries("pipeline_epoch_shuffle")(
      spark, Sf0001).collect()
    val byEpoch = sh.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("block_id")).sorted.toSeq ==
        (0L until blocksConcat))
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ==
        (0L until blocksConcat))
    }
  }

  test("pipeline_curriculum: rank is a bijection in descending score " +
      "order, fills conserved, at sf0.001") {
    val cur = graft.SparkEntry.queries("pipeline_curriculum")(
      spark, Sf0001).collect()
    val global = graft.SparkEntry.queries("pipeline_pack_global")(
      spark, Sf0001).collect()
    val total = global.map(_.getAs[Long]("n_tok")).sum
    val nBlocks = (total + 127L) / 128L
    assert(cur.length == nBlocks, "one curriculum row per block")
    assert(cur.map(_.getAs[Long]("fill")).sum == total)
    val ranks = cur.map(_.getAs[Long]("cur_rank")).sorted.toSeq
    assert(ranks == (0L until nBlocks), "rank must be a bijection")
    // walking the curriculum order, scores never increase and ties
    // break by ascending block id
    val inOrder = cur.sortBy(_.getAs[Long]("cur_rank"))
    inOrder.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("score_micro"),
          b.getAs[Long]("score_micro"))
        assert(sa > sb || (sa == sb &&
          a.getAs[Long]("block_id") < b.getAs[Long]("block_id")),
          s"curriculum order violated at rank ${b.getAs[Long]("cur_rank")}")
      case _ =>
    }
    // scores normalize to FULL-BLOCK tokens (mean micro-probability
    // x 128), so the range is [0, 128e6] and the per-token mean of an
    // interior block is exactly score/128
    cur.foreach { r =>
      val s = r.getAs[Long]("score_micro")
      assert(s >= 0L && s <= 128000000L, s"score out of range: $s")
    }
  }

  test("pipeline_pack_global manifest is contiguous at sf0.001") {
    val m = graft.SparkEntry.queries("pipeline_pack_global")(spark, Sf0001)
      .collect()
    assert(m.length > 0)
    assert(m.head.getAs[Long]("tok_start") == 0L, "stream starts at 0")
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("tok_start") ==
          a.getAs[Long]("tok_start") + a.getAs[Long]("n_tok"),
          s"gap between ${a.getLong(0)} and ${b.getLong(0)}")
      case _ =>
    }
    // histogram twin conserves the token total
    val total = m.map(_.getAs[Long]("n_tok")).sum
    val hist = graft.SparkEntry.queries("pipeline_pack_blocks")(spark, Sf0001)
      .collect()
    assert(hist.map(_.getAs[Long]("n_tokens")).sum == total,
      "blocks histogram must conserve the global token count")
    assert(hist.map(_.getAs[Long]("n_blocks")).sum == (total + 127) / 128,
      "block count must be ceil(total/128)")
  }

  test("pipeline_mix_pack == driver exact-rational reference at sf0.001") {
    // independent reference: BigInt rationals end-to-end — the same
    // plan arithmetic the query claims to run in DECIMAL(38,0)
    def knuth(v: Long): Long = {
      val x = ((v % 4294967296L) + 4294967296L) % 4294967296L
      ((x & 65535L) * 2654435761L +
        ((x >> 16) * 2654435761L % 65536L) * 65536L) % 4294967296L
    }
    val docs = graft.Tables.documents(spark, Sf0001)
      .select(col("lang"), col("doc_id"),
        graft.ops.TextOps.tokenCount(col("text")).as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val budget = BigInt(docs.map(_._3).sum)
    val wNum = Map("en" -> 40, "zh" -> 20, "fr" -> 15, "es" -> 15)
    val plan = docs.groupBy(_._1).map { case (lang, xs) =>
      val avail = BigInt(xs.map(_._3).sum)
      val num = BigInt(wNum.getOrElse(lang, 10)) * budget
      val den = BigInt(100) * avail
      val epochs = (num + den - 1) / den
      lang -> ((num, den, epochs))
    }
    val expected = docs.toSeq.flatMap { case (lang, id, n) =>
      val (num, den, epochs) = plan(lang)
      (0L until epochs.toLong).flatMap { e =>
        val keep = BigInt(knuth(id * 16 + e)) * den * epochs <
          num * BigInt(4294967296L)
        if (keep) Some((lang, id, e, n)) else None
      }
    }.sortBy { case (lang, id, e, _) =>
      (f"$lang%-8s".replace(' ', '_'), id, e) }
    val withOff = expected.scanLeft(("", 0L, 0L, 0L, 0L)) {
      case ((_, _, _, pn, pOff), (lang, id, e, n)) =>
        (lang, id, e, n, pOff + pn)
    }.drop(1).map { case (lang, id, e, n, off) =>
      (lang, id, e, n, off, off / 128, (off + n - 1) / 128) }
    val got = graft.SparkEntry.queries("pipeline_mix_pack")(spark, Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getAs[Long]("tok_start"),
        r.getAs[Long]("first_block"), r.getAs[Long]("last_block")))
      .toSeq
    assert(got == withOff, "query must equal the BigInt reference")
    // the mixture must actually upsample somewhere: at least one
    // language runs a second epoch and keeps a copy there
    assert(got.exists(_._3 >= 1L),
      "no copy_id >= 1 row survived — upsampling path unexercised")
    // and downsample somewhere: some (doc, copy 0) must be dropped
    val kept0 = got.count(_._3 == 0L)
    assert(kept0 < docs.length,
      "no copy-0 doc was dropped — downsampling path unexercised")
  }

  test("pipeline_fim_spans: lengths conserve, lanes replicate the " +
      "driver hash, coin is fair-ish at sf0.001") {
    def knuth(v: Long): Long = {
      val x = ((v % 4294967296L) + 4294967296L) % 4294967296L
      ((x & 65535L) * 2654435761L +
        ((x >> 16) * 2654435761L % 65536L) * 65536L) % 4294967296L
    }
    val rows = graft.SparkEntry
      .queries("pipeline_fim_spans")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, fim, p, m, sfx) =>
      assert(p + m + sfx == n, s"doc $id lengths don't conserve")
      assert(fim == (knuth(id * 4 + 1) < 2147483648L), s"doc $id coin")
      if (fim) {
        val u = knuth(id * 4 + 2) % (n + 1)
        val v = knuth(id * 4 + 3) % (n + 1)
        assert(p == math.min(u, v) && m == math.abs(u - v),
          s"doc $id split lanes diverge")
      } else assert(m == 0L && sfx == 0L, s"non-FIM doc $id transformed")
    }
    val nf = rows.count(_._3)
    assert(nf > rows.length / 3 && nf < rows.length * 2 / 3,
      s"coin badly unfair: $nf of ${rows.length}")
    assert(rows.exists { case (_, _, fim, _, m, _) => fim && m > 0L },
      "no FIM doc has a non-empty middle")
  }

  test("pipeline_curriculum_anneal: epoch 0 == curriculum rank, " +
      "later epochs == md5 rank, every epoch a bijection, at sf0.001") {
    def md5hex(v: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(v.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val cur = graft.SparkEntry.queries("pipeline_curriculum")(spark,
      Sf0001).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cur_rank")).toMap
    val ann = graft.SparkEntry
      .queries("pipeline_curriculum_anneal")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byEpoch = ann.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (e, rows) =>
      assert(rows.map(_._3).sorted.toSeq ==
        (0L until rows.length.toLong),
        s"epoch $e positions are not a bijection")
    }
    byEpoch(0L).foreach { case (_, b, pos) =>
      assert(pos == cur(b), s"epoch 0 block $b: $pos != ${cur(b)}") }
    for (e <- Seq(1L, 2L)) {
      val exp = byEpoch(e).map(_._2).sortBy(b =>
        (md5hex(s"$e:$b"), b)).zipWithIndex
        .map { case (b, i) => b -> i.toLong }.toMap
      byEpoch(e).foreach { case (_, b, pos) =>
        assert(pos == exp(b), s"epoch $e block $b md5 rank diverges") }
    }
    // the warmup order must actually differ from the shuffled epochs
    assert(byEpoch(0L).map(r => (r._2, r._3)).toMap !=
      byEpoch(1L).map(r => (r._2, r._3)).toMap,
      "epoch 1 shuffle equals the curriculum order")
  }

  test("pipeline_pack_export == JVM block reconstruction from per-doc " +
      "pieces, boundaries match pipeline_pack_global, at sf0.001") {
    def md5hex(v: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(v.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val docs = graft.Tables.documents(spark, Sf0001)
    val bpe = graft.ops.BpeOps.cachedTrain(spark,
      s"$Sf0001/documents.parquet", docs, col("text"), numMerges = 64)
    // independent reconstruction: per-doc pieces via the (separately
    // gated) encode expression, packed sequentially in the JVM
    val perDoc = docs
      .select(col("doc_id"), graft.ops.BpeOps.encode(col("text"), bpe)
        .as("pieces"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
      .sortBy(_._1)
    val stream = perDoc.flatMap { case (_, ps) => ps :+ "</d>" }
    val expected = stream.grouped(128).zipWithIndex.map {
      case (blk, i) =>
        (i.toLong, blk.length.toLong, md5hex(blk.mkString(" ")))
    }.toSeq
    val got = graft.SparkEntry
      .queries("pipeline_pack_export")(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected,
      "exported blocks must reconstruct the sequential token stream")
    // boundaries line up with the offsets-only manifest: same block
    // count, interior blocks exactly full
    val manifest = graft.SparkEntry
      .queries("pipeline_pack_global")(spark, Sf0001).collect()
    val total = manifest.map(_.getAs[Long]("n_tok")).sum
    assert(got.length.toLong == (total + 127) / 128)
    got.dropRight(1).foreach { case (b, n, _) =>
      assert(n == 128L, s"interior block $b not full: $n") }
  }
}
