package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.WordPieceOps

/** WordPiece trainer + greedy encoder gates: designed-corpus score
  * arithmetic checked by hand, trainer vs an INDEPENDENT reference
  * recompute (functional fold style vs the trainer's imperative
  * loop), encoder contract cases, cache round-trip, codegen gate. */
class WordPieceSpec extends SparkSpec {

  // ---- independent reference implementation ------------------------
  // (BigInt rational argmax, recomputed from scratch each round with
  //  immutable maps — shares no code with WordPieceOps.trainVocab)
  private def refTrain(counts: Seq[(String, Long)],
      merges: Int): Seq[String] = {
    def toSyms(w: String): List[String] =
      w.toList.zipWithIndex.map { case (c, i) =>
        (if (i == 0) "" else "##") + c
      }
    var vocab: Map[List[String], Long] =
      counts.map { case (w, n) => toSyms(w) -> n }.toMap
    val alphabet = vocab.keys.flatten.toSeq.distinct.sorted
    var out = Vector.empty[String]
    var done = false
    while (out.length < merges && !done) {
      val sym = vocab.toSeq.flatMap { case (s, n) => s.map(_ -> n) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val pairs = vocab.toSeq.flatMap { case (s, n) =>
        s.zip(s.drop(1)).map(_ -> n)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      if (pairs.isEmpty) done = true
      else {
        // max of n/(sym(l)*sym(r)) by cross-multiplication; ties (l,r)
        val best = pairs.toSeq.sortBy(_._1).reduceLeft { (a, b) =>
          val ((al, ar), an) = a; val ((bl, br), bn) = b
          val left = BigInt(an) * BigInt(sym(bl)) * BigInt(sym(br))
          val right = BigInt(bn) * BigInt(sym(al)) * BigInt(sym(ar))
          if (right > left) b else a
        }
        if (best._2 < 2) done = true
        else {
          val (l, r) = best._1
          val m = l + r.stripPrefix("##")
          out :+= m
          def rw(s: List[String]): List[String] = s match {
            case a :: b :: rest if a == l && b == r => m :: rw(rest)
            case a :: rest => a :: rw(rest)
            case Nil => Nil
          }
          vocab = vocab.toSeq.map { case (s, n) => rw(s) -> n }
            .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
        }
      }
    }
    ("[UNK]" +: alphabet) ++ out
  }

  test("designed corpus: likelihood score beats raw frequency") {
    // "ab" appears 10x; "xy" only 4x — but x and y occur NOWHERE else,
    // so score(x,##y) = 4/(4·4) = 1/4 beats score(a,##b) = 10/(14·12)
    // (a also in "az", b also in "cb"): WordPiece must merge xy FIRST,
    // which is exactly where it diverges from BPE's frequency argmax.
    val counts = Array(("ab", 10L), ("az", 4L), ("cb", 2L), ("xy", 4L))
    val wp = WordPieceOps.trainVocab(counts, 1)
    assert(wp.vocab.last == "xy",
      s"likelihood argmax must pick xy: ${wp.vocab.mkString(",")}")
    val bpe = graft.ops.BpeOps.trainMerges(counts, 1)
    assert(bpe.lefts.head + bpe.rights.head == "ab",
      "BPE's frequency argmax must pick ab — the families must differ")
  }

  test("trainer == independent reference recompute (real corpus)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val counts = graft.ops.BpeOps.wordTypeCounts(docs, col("text"), 1000)
    val model = WordPieceOps.trainVocab(counts, 48)
    val ref = refTrain(counts.toSeq, 48)
    assert(model.vocab.toSeq == ref,
      s"trainer diverged from reference:\n${model.vocab.toSeq}\nvs\n$ref")
    assert(model.vocab.count(p => p.stripPrefix("##").length > 1) > 0,
      "real corpus must learn multi-char pieces")
  }

  test("greedy encoder: longest match, continuations, UNK contract") {
    val m = new WordPieceModel(
      Array("[UNK]", "un", "##aff", "##able", "##ff", "a", "##b", "b"))
    assert(WordPieceOps.encodeString("unaffable", m) ==
      Seq("un", "##aff", "##able"), "textbook BERT example")
    // longest-first: "##aff" wins over "##a"+"##ff" paths
    assert(WordPieceOps.encodeString("ab", m) == Seq("a", "##b"))
    // unmatchable position -> whole word UNK (never partial output)
    assert(WordPieceOps.encodeString("aq", m) == Seq("[UNK]"))
    // over maxInputChars -> UNK
    val tiny = new WordPieceModel(Array("[UNK]", "a", "##a"),
      maxInputChars = 3)
    assert(WordPieceOps.encodeString("aaaa", tiny) == Seq("[UNK]"))
    assert(WordPieceOps.encodeString("aaa", tiny) ==
      Seq("a", "##a", "##a"))
  }

  test("expression == reference encode on the corpus") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val model = WordPieceOps.train(docs, col("text"), 32, maxTypes = 1000)
    val rows = docs.select(col("text"),
        WordPieceOps.encode(col("text"), model).as("toks"))
      .collect()
    rows.foreach { r =>
      val expected = WordPieceOps.encodeString(r.getString(0), model)
      assert(r.getSeq[String](1) == expected,
        s"expression != reference on: ${r.getString(0).take(60)}")
    }
  }

  test("cachedTrain round-trips the model and keys on params") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val src = s"$Sf0001/documents.parquet"
    val direct = WordPieceOps.train(docs, col("text"), 24)
    val first = WordPieceOps.cachedTrain(spark, src, docs, col("text"), 24)
    val second = WordPieceOps.cachedTrain(spark, src, docs, col("text"), 24)
    for (m <- Seq(first, second))
      assert(m.vocab.toSeq == direct.vocab.toSeq,
        "cached model differs from direct training")
    val other = WordPieceOps.cachedTrain(spark, src, docs, col("text"), 8)
    assert(other.vocab.toSeq != first.vocab.toSeq,
      "param change must not collide in the cache")
  }

  test("WordPieceEncode stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val model = WordPieceOps.trainVocab(
      Array(("the", 10L), ("then", 5L), ("than", 4L)), 8)
    val df = docs.select(
      WordPieceOps.encode(col("text"), model).as("toks"))
    assert(df.queryExecution.toRdd.count() == 500L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project") && l.contains("wordpiece_encode")),
      s"wordpiece Project must be codegen'd:\n$plan")
  }
}
