package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.UnigramOps

/** Unigram-LM tokenizer (Kudo '18 shape): Viterbi kernel against a
  * hand-built model, trainer behavior on a designed corpus, the
  * distributed encoder vs the reference single-string path, coverage,
  * cache round-trip, and the codegen plan gate. */
class UnigramSpec extends SparkSpec {

  private def model(entries: (String, Double)*): UnigramModel =
    new UnigramModel(entries.map(_._1).toArray, entries.map(_._2).toArray)

  test("viterbi picks the maximum-likelihood split") {
    // "ab" as one piece (-1.0) beats "a"+"b" (-1.5 + -1.5)
    val m = model("ab" -> -1.0, "a" -> -1.5, "b" -> -1.5)
    assert(UnigramKernels.viterbi("ab", m).toSeq == Seq("ab"))
    // but a cheap single char changes the optimum: "a"+"b" = -1.1 + -0.05
    val m2 = model("ab" -> -2.0, "a" -> -1.1, "b" -> -0.05)
    assert(UnigramKernels.viterbi("ab", m2).toSeq == Seq("a", "b"))
  }

  test("viterbi tie-break prefers the longer piece") {
    // "abc" = -2.0 exactly equals "a"+"bc" = -1.0 + -1.0
    val m = model("abc" -> -2.0, "a" -> -1.0, "bc" -> -1.0)
    assert(UnigramKernels.viterbi("abc", m).toSeq == Seq("abc"))
  }

  test("unknown characters fall back to single-char pieces") {
    val m = model("a" -> -1.0)
    assert(UnigramKernels.viterbi("axa", m).toSeq == Seq("a", "x", "a"))
  }

  test("trainer learns the frequent multi-char pieces of a designed corpus") {
    // word types engineered so "ing" dominates; maxPieceLen = 4 keeps
    // 5-char words from collapsing to whole-word pieces (with the
    // default 6, hard-EM correctly prefers whole words here — the
    // vocabulary-collapse behavior the Kudo paper prunes against)
    val counts = Array(
      ("thing", 50L), ("sing", 40L), ("ring", 30L),
      ("the", 60L), ("this", 20L), ("cat", 5L))
    val m = UnigramOps.trainFromCounts(counts, vocabSize = 24,
      maxPieceLen = 4)
    val pieces = m.pieces.toSet
    assert(pieces.contains("ing"), s"expected 'ing' in ${m.pieces.toSeq}")
    // every single character of the corpus is present (coverage)
    val chars = counts.flatMap(_._1.toCharArray).map(String.valueOf(_)).toSet
    assert(chars.subsetOf(pieces))
    // probabilities normalize
    assert(math.abs(m.logProbs.map(math.exp).sum - 1.0) < 1e-9)
    // every word round-trips through its segmentation
    counts.foreach { case (w, _) =>
      assert(UnigramKernels.viterbi(w, m).mkString == w)
    }
  }

  test("portable (product-space) viterbi == log-space viterbi on " +
      "random models, and ties keep the longer piece") {
    // log is strictly monotone, so away from float-rounding knife
    // edges the two kernels must pick identical segmentations; the
    // product kernel is the one the training E-step and the DuckDB
    // training oracle share
    val rnd = new scala.util.Random(42)
    val vocabPool = Vector("a", "b", "c", "ab", "bc", "abc", "cab",
      "ba", "aa", "bb", "cc", "abcb")
    (0 until 200).foreach { trial =>
      val entries = vocabPool.filter(_ => rnd.nextDouble() > 0.3)
      val all = (entries ++ Seq("a", "b", "c")).distinct
      val counts = all.map(p => p -> (1L + rnd.nextInt(1000).toLong))
      val total = counts.map(_._2).sum.toDouble
      val m = new UnigramModel(counts.map(_._1).toArray,
        counts.map { case (_, n) => math.log(n / total) }.toArray)
      val cmap = new java.util.HashMap[String, java.lang.Long]()
      counts.foreach { case (p, n) => cmap.put(p, n) }
      val word = (0 until (1 + rnd.nextInt(8)))
        .map(_ => "abc" (rnd.nextInt(3))).mkString
      val logSegs = UnigramKernels.viterbi(word, m).toSeq
      val prodSegs = UnigramKernels
        .viterbiPortable(word, cmap, total, 6).toSeq
      assert(prodSegs.mkString == word,
        s"trial=$trial portable segs must tile the word: $prodSegs")
      // compare path scores, not piece lists: distinct segmentations
      // can carry exactly equal likelihood (then tie-breaks differ
      // between the two arithmetics legitimately)
      def lscore(segs: Seq[String]) = segs.map(s =>
        m.logProbs(m.index.get(s).intValue)).sum
      assert(math.abs(lscore(prodSegs) - lscore(logSegs)) < 1e-9,
        s"trial=$trial $word: portable $prodSegs vs log $logSegs")
    }
    // exact tie: "abc"(n=2) vs "a"(4)+"bc"(8) over total 16:
    // 2/16 == (4/16)*(8/16) = 1/8 — longer piece must win
    val cmap = new java.util.HashMap[String, java.lang.Long]()
    Seq("abc" -> 2L, "a" -> 4L, "bc" -> 8L, "b" -> 1L, "c" -> 1L)
      .foreach { case (p, n) => cmap.put(p, n) }
    assert(UnigramKernels.viterbiPortable("abc", cmap, 16.0, 6).toSeq
      == Seq("abc"), "equal-likelihood tie must keep the longer piece")
  }

  test("forward-backward expectations match the hand-computed lattice") {
    // word "ab": segmentations {ab} (p=0.5) and {a,b} (p=0.25*0.25)
    // Z = 0.5625; E[ab] = 8/9, E[a] = E[b] = 1/9
    val m = model("ab" -> math.log(0.5),
      "a" -> math.log(0.25), "b" -> math.log(0.25))
    val out = scala.collection.mutable.HashMap[String, Double]()
    UnigramKernels.expectedCounts("ab", m, 1.0, out)
    assert(math.abs(out("ab") - 8.0 / 9.0) < 1e-12)
    assert(math.abs(out("a") - 1.0 / 9.0) < 1e-12)
    assert(math.abs(out("b") - 1.0 / 9.0) < 1e-12)
    // weight scales linearly
    val out2 = scala.collection.mutable.HashMap[String, Double]()
    UnigramKernels.expectedCounts("ab", m, 10.0, out2)
    assert(math.abs(out2("ab") - 80.0 / 9.0) < 1e-11)
  }

  test("expectations degenerate to the single segmentation when unique") {
    // only {a, b} segments "ab" — expectations are exactly 1
    val m = model("a" -> math.log(0.5), "b" -> math.log(0.5))
    val out = scala.collection.mutable.HashMap[String, Double]()
    UnigramKernels.expectedCounts("ab", m, 3.0, out)
    assert(math.abs(out("a") - 3.0) < 1e-12)
    assert(math.abs(out("b") - 3.0) < 1e-12)
  }

  test("soft EM learns the designed corpus and stays deterministic") {
    val counts = Array(
      ("thing", 50L), ("sing", 40L), ("ring", 30L),
      ("the", 60L), ("this", 20L), ("cat", 5L))
    val m1 = UnigramOps.trainFromCounts(counts, vocabSize = 24,
      maxPieceLen = 4, softEm = true)
    assert(m1.pieces.toSet.contains("ing"),
      s"expected 'ing' in ${m1.pieces.toSeq}")
    assert(math.abs(m1.logProbs.map(math.exp).sum - 1.0) < 1e-9)
    counts.foreach { case (w, _) =>
      assert(UnigramKernels.viterbi(w, m1).mkString == w)
    }
    val m2 = UnigramOps.trainFromCounts(counts, vocabSize = 24,
      maxPieceLen = 4, softEm = true)
    assert(m1.pieces.toSeq == m2.pieces.toSeq)
    assert(m1.logProbs.toSeq == m2.logProbs.toSeq)
  }

  test("likelihood-loss pruning keeps load-bearing pieces and is no worse") {
    val counts = Array(
      ("thing", 50L), ("sing", 40L), ("ring", 30L),
      ("the", 60L), ("this", 20L), ("cat", 5L), ("qzkw", 15L))
    def corpusLL(m: UnigramModel): Double =
      counts.map { case (w, n) =>
        n * UnigramKernels.viterbiScore(w, m, null)
      }.sum
    val byCount = UnigramOps.trainFromCounts(counts, vocabSize = 20,
      maxPieceLen = 4, softEm = true)
    val byLoss = UnigramOps.trainFromCounts(counts, vocabSize = 20,
      maxPieceLen = 4, softEm = true, lossPrune = true)
    info(f"LL byCount=${corpusLL(byCount)}%.3f byLoss=${corpusLL(byLoss)}%.3f")
    // the loss criterion optimizes exactly this quantity greedily —
    // on this corpus it must not do worse than count-rank pruning
    assert(corpusLL(byLoss) >= corpusLL(byCount) - 1e-9)
    // coverage + round-trips still hold
    counts.foreach { case (w, _) =>
      assert(UnigramKernels.viterbi(w, byLoss).mkString == w)
    }
    // deterministic
    val again = UnigramOps.trainFromCounts(counts, vocabSize = 20,
      maxPieceLen = 4, softEm = true, lossPrune = true)
    assert(byLoss.pieces.toSeq == again.pieces.toSeq)
    assert(byLoss.logProbs.toSeq == again.logProbs.toSeq)
  }

  test("loss pruning: a piece on no Viterbi path prunes before used pieces") {
    // "ab" appears as a seed substring of the rare word but the chars
    // segment it at equal likelihood only if "ab" is worse — engineer
    // a model where a redundant piece has high COUNT but zero LOSS
    val m = model("ab" -> math.log(0.1),
      "a" -> math.log(0.5), "b" -> math.log(0.4))
    // best path for "ab" is a+b (0.2 > 0.1) → "ab" carries no loss
    assert(UnigramKernels.viterbi("ab", m).toSeq == Seq("a", "b"))
    val withP = UnigramKernels.viterbiScore("ab", m, null)
    val without = UnigramKernels.viterbiScore("ab", m, "ab")
    assert(withP == without, "masking an off-path piece changes nothing")
  }

  test("distributed encoder == reference single-string encode on sf0.001") {
    val docs = Tables.documents(spark, Sf0001)
    val m = UnigramOps.train(docs, col("text"), vocabSize = 128)
    val viaExpr = docs
      .select(col("doc_id"), UnigramOps.encode(col("text"), m).as("p"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    val texts = docs.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    texts.zip(viaExpr).foreach { case ((idA, text), (idB, got)) =>
      assert(idA == idB)
      assert(got == UnigramOps.encodeString(text, m).toList, s"doc $idA")
    }
    // segmentation concatenates back to the pre-token stream
    texts.take(50).foreach { case (_, text) =>
      val pre = BpeKernels.preTokenize(text).mkString
      assert(UnigramOps.encodeString(text, m).mkString == pre)
    }
  }

  test("cached model round-trips exactly (raw log-prob bits)") {
    val docs = Tables.documents(spark, Sf0001)
    val src = s"$Sf0001/documents.parquet"
    val first = UnigramOps.cachedTrain(spark, src, docs, col("text"), 64)
    val again = UnigramOps.cachedTrain(spark, src, docs, col("text"), 64)
    assert(first.pieces.toSeq == again.pieces.toSeq)
    assert(first.logProbs.toSeq == again.logProbs.toSeq)
    val direct = UnigramOps.train(docs, col("text"), 64)
    assert(first.pieces.toSeq == direct.pieces.toSeq)
    assert(first.logProbs.toSeq == direct.logProbs.toSeq)
  }

  test("UnigramEncode stays inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val m = UnigramOps.trainFromCounts(
      Array(("the", 10L), ("then", 5L), ("than", 4L)), 16)
    val df = docs.select(UnigramOps.encode(col("text"), m).as("p"))
    assert(df.queryExecution.toRdd.count() == 500L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project") && l.contains("unigram_encode")),
      s"unigram Project must be codegen'd:\n$plan")
  }
}
