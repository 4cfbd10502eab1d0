package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeOps

/** Independent ground-truth gates for the round-10b additions:
  * the T5 span-corruption manifest (JVM replay of the hash lanes and
  * stars-and-bars placement + structural invariants), the
  * cluster-balanced subsample (bounded TopK path == window-rank
  * recompute; cap accounting), and the vocabulary-pruning decision
  * table (driver re-encode frequency recount + threshold replay). */
class Round10bSpec extends SparkSpec {

  /** The exact knuthHash arithmetic on the driver (BigInt — the test
    * does not reuse the Column under test). */
  private def kh(x: Long): Long =
    ((BigInt(x).mod(BigInt(2).pow(32)) * BigInt(2654435761L))
      .mod(BigInt(2).pow(32))).toLong

  test("pipeline_t5_spans: structural invariants hold for every doc") {
    val rows = SparkEntry.queries("pipeline_t5_spans")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, spans) =>
      val (_, n, noise, nSpans, _, _, _) = spans.head
      assert(noise == n * 15 / 100 && noise >= 1, s"doc $doc noise")
      assert(nSpans == (noise + 2) / 3, s"doc $doc span count formula")
      assert(spans.length == nSpans, s"doc $doc emitted ${spans.length}")
      val ordered = spans.sortBy(_._5)
      assert(ordered.map(_._5).toSeq == (0L until nSpans).toSeq)
      assert(ordered.map(_._7).sum == noise, s"doc $doc length budget")
      // non-overlapping, in order, within bounds (touching allowed)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 + a._7 <= b._6, s"doc $doc spans overlap")
        case _ =>
      }
      assert(ordered.head._6 >= 0 &&
        ordered.last._6 + ordered.last._7 <= n, s"doc $doc bounds")
    }
  }

  test("pipeline_t5_spans: JVM replay of lanes + placement is exact") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val bpe = BpeOps.cachedTrain(spark, s"$Sf0001/documents.parquet",
      docs, col("text"), numMerges = 64)
    val nTok = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        BpeOps.encodeString(r.getString(1), bpe).size.toLong).toMap
    val expected = nTok.toSeq.flatMap { case (doc, n) =>
      val noise = n * 15 / 100
      if (noise < 1) Seq.empty
      else {
        val nSpans = (noise + 2) / 3
        val keep = n - noise
        val inner = kh(doc * 2 + 1)
        val draws = (0L until nSpans)
          .map(k => (kh(inner + k) % (keep + 1), k)).sorted
        val (base, rem) = (noise / nSpans, noise % nSpans)
        draws.zipWithIndex.map { case ((draw, _), k) =>
          (doc, k.toLong, draw + k * base + math.min(k, rem),
            base + (if (k < rem) 1L else 0L))
        }
      }
    }.toSet
    val got = SparkEntry.queries("pipeline_t5_spans")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == expected)
  }

  test("pipeline_ul2_spans: JVM replay of class assignment + all three " +
      "denoiser constructions is exact") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val bpe = BpeOps.cachedTrain(spark, s"$Sf0001/documents.parquet",
      docs, col("text"), numMerges = 64)
    val nTok = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        BpeOps.encodeString(r.getString(1), bpe).size.toLong).toMap
    val expected = nTok.toSeq.filter(_._2 >= 1).flatMap { case (doc, n) =>
      val dcode = kh(doc * 8 + 7) / 1073741824L
      if (dcode == 2) {
        val u = kh(doc * 8 + 6) % (n + 1)
        Seq((doc, "S", n, n - u, 1L, 0L, u, n - u))
      } else {
        val (rate, mean, salt) =
          if (dcode <= 1) (15L, 3L, 3L) else (50L, 32L, 5L)
        val den = if (dcode <= 1) "R" else "X"
        val noise = n * rate / 100
        if (noise < 1) Seq.empty
        else {
          val nSpans = (noise + mean - 1) / mean
          val keep = n - noise
          val inner = kh(doc * 8 + salt)
          val draws = (0L until nSpans)
            .map(k => (kh(inner + k) % (keep + 1), k)).sorted
          val (base, rem) = (noise / nSpans, noise % nSpans)
          draws.zipWithIndex.map { case ((draw, _), k) =>
            (doc, den, n, noise, nSpans, k.toLong,
              draw + k * base + math.min(k, rem),
              base + (if (k < rem) 1L else 0L))
          }
        }
      }
    }.toSet
    val got = SparkEntry.queries("pipeline_ul2_spans")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSet
    assert(got == expected)
    // the mixture is actually mixed on this corpus
    val classes = got.map(_._2)
    assert(classes == Set("R", "S", "X"),
      s"denoiser mixture degenerate: $classes")
  }

  test("pipeline_cluster_balance: TopK path == window-rank recompute, " +
      "caps accounted") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val model = ops.AnnOps.cachedIvf(spark, s"$Sf0001/embeddings.parquet",
      emb, "vec_id", "embedding", nlist = 8)
    val asg = ops.AnnOps.assignCells(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val total = emb.count()
    assert(asg.length == total)
    val expected = asg.groupBy(_._2).toSeq.flatMap { case (cid, vs) =>
      vs.map(_._1).sortBy(v => (kh(v), v)).take(16).zipWithIndex
        .map { case (v, i) =>
          (cid.toLong, v, i + 1L, vs.length.toLong) }
    }.toSet
    val got = SparkEntry.queries("pipeline_cluster_balance")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // every cluster keeps exactly min(16, size); kept ids are distinct
    val byCid = got.groupBy(_._1)
    byCid.foreach { case (cid, ks) =>
      assert(ks.size == math.min(16, ks.head._4), s"cid $cid cap")
    }
    assert(got.map(_._2).size == got.size, "duplicate vec_id kept")
  }

  test("pipeline_decon_excise: driver string-gram recompute matches " +
      "every excision") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val (ev, corpus) = all.partition(_._1 % 50 == 0)
    def grams(text: String): Seq[(Int, String)] = {
      val w = text.split(" ", -1)
      if (w.length < 8) Seq.empty
      else (0 to w.length - 8).map(i => i -> w.slice(i, i + 8).mkString(" "))
    }
    val evalGrams = ev.flatMap(d => grams(d._2)).map(_._2).toSet
    val expected = corpus.map { case (doc, text) =>
      val w = text.split(" ", -1)
      val cov = grams(text).filter(g => evalGrams(g._2))
        .flatMap(g => g._1 until g._1 + 8).toSet
      val clean = w.zipWithIndex.collect {
        case (t, i) if !cov(i) => t }.mkString(" ")
      (doc, w.length.toLong, cov.size.toLong, md5hex(clean))
    }.toSet
    val got = SparkEntry.queries("pipeline_decon_excise")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == expected)
    assert(got.exists(_._3 > 0), "no contaminated doc — degenerate gate")
    assert(got.exists(_._3 == 0), "every doc contaminated — degenerate")
  }

  test("pipeline_data_card: every column agrees with its certified " +
      "component query or a driver recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val card = SparkEntry.queries("pipeline_data_card")(spark, Sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val bpe = BpeOps.cachedTrain(spark, s"$Sf0001/documents.parquet",
      spark.read.parquet(s"$Sf0001/documents.parquet"),
      col("text"), numMerges = 64)
    // driver recompute: docs, tokens, langs, exact dups per source
    val md5Counts = docs.groupBy(d => md5hex(d._4)).view
      .mapValues(_.length).toMap
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val (nDocs, nToks, nLangs, nDup, _, _) = card(src)
      assert(nDocs == ds.length, s"$src n_docs")
      assert(nToks == ds.map(d =>
        BpeOps.encodeString(d._4, bpe).size.toLong).sum, s"$src n_tokens")
      assert(nLangs == ds.map(_._3).distinct.length, s"$src n_langs")
      assert(nDup == ds.count(d => md5Counts(md5hex(d._4)) >= 2),
        s"$src exact_dup_docs")
    }
    // contamination column == the certified pipeline_decontaminate
    // verdicts, re-aggregated per source
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val contBySrc = SparkEntry.queries("pipeline_decontaminate")(
        spark, Sf0001).collect()
      .filter(_.getBoolean(2)).map(r => srcOf(r.getLong(0)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // classifier column == the certified pipeline_quality_classifier
    // totals (lang-grouped there, source-grouped here — totals match)
    val clfTotal = SparkEntry.queries("pipeline_quality_classifier")(
        spark, Sf0001).collect().map(_.getLong(3)).sum
    card.foreach { case (src, (_, _, _, _, cont, _)) =>
      assert(cont == contBySrc.getOrElse(src, 0L), s"$src contaminated")
    }
    assert(card.values.map(_._6).sum == clfTotal, "clf_pass total")
  }

  test("text_vocab_prune: driver re-encode recounts every frequency, " +
      "threshold replays") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val bpe = BpeOps.cachedTrain(spark, s"$Sf0001/documents.parquet",
      docs, col("text"), numMerges = 64)
    val pieces = docs.select(col("text")).collect()
      .flatMap(r => BpeOps.encodeString(r.getString(0), bpe))
    val freq = pieces.groupBy(identity).view.mapValues(_.length.toLong)
    val totalToks = pieces.length.toLong
    val got = SparkEntry.queries("text_vocab_prune")(spark, Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length == 64)
    assert(got.map(_._1).toSeq == (0L until 64L))
    got.foreach { case (rank, piece, f, kept) =>
      assert(piece == bpe.lefts(rank.toInt) + bpe.rights(rank.toInt))
      assert(f == freq.getOrElse(piece, 0L), s"rank $rank freq")
      assert(kept == (f * 1000 >= totalToks), s"rank $rank threshold")
    }
    // the prune must actually discriminate on this corpus
    assert(got.exists(_._4) && got.exists(!_._4),
      "threshold keeps or drops everything — not a meaningful gate")
  }
}
