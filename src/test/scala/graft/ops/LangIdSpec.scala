package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Gates for the trained char-bigram Naive Bayes language identifier:
  * a hand-checkable training anchor, held-out accuracy that must beat
  * the marker-lexicon heuristic on the same derived corpus, and the
  * integer-quantization discipline. */
class LangIdSpec extends SparkSpec {

  private def derived = {
    val docs = Tables.documents(spark, Sf0001)
    docs.select(col("doc_id"), col("lang"),
      LangIdOps.derivedText(col("text"), col("lang"), col("doc_id"))
        .as("text2"))
  }

  test("training anchors: Laplace arithmetic on a hand corpus") {
    import spark.implicits._
    // every class seeded (the training contract requires it —
    // ln(0) priors would wrap Long sums); ids all land in the
    // mod-10 < 3 seed split
    val docs = Seq(
      (0L, "de", "ab"), // bigrams: ab
      (1L, "en", "ba"), // bigrams: ba
      (2L, "en", "ab"), // bigrams: ab
      (20L, "es", "cd"),
      (21L, "fr", "dc"),
      (22L, "zh", "ce")
    ).toDF("doc_id", "lang", "text2")
    val m = LangIdOps.train(spark, docs)
    val grams = m.grams.toMap
    // vocab = {ab, ba, cd, ce, dc}, V=5; T_de=1, T_en=2
    // lp(de,ab) = ln((1+1)/(1+5)) = ln(1/3)
    assert(grams("ab")(0) ==
      math.round(StrictMath.log(1.0 / 3.0) * 1e6))
    // lp(en,ab) = ln((1+1)/(2+5)) = ln(2/7)
    assert(grams("ab")(1) ==
      math.round(StrictMath.log(2.0 / 7.0) * 1e6))
    // default(de) = ln(1/(1+5))
    assert(m.defaults(0) == math.round(StrictMath.log(1.0 / 6.0) * 1e6))
    // priors: de 1/6, en 2/6
    assert(m.priors(0) == math.round(StrictMath.log(1.0 / 6.0) * 1e6))
    assert(m.priors(1) == math.round(StrictMath.log(2.0 / 6.0) * 1e6))
    // a seed split missing a class fails loud, never trains
    val e = intercept[IllegalArgumentException] {
      LangIdOps.train(spark,
        docs.filter(col("lang") =!= "zh"))
    }
    assert(e.getMessage.contains("no examples"))
  }

  test("held-out accuracy beats the marker-lexicon heuristic on the " +
      "derived corpus (the upgrade the trained model must justify)") {
    val d = derived.localCheckpoint(true)
    val model = LangIdOps.train(spark, d)
    val held = d.filter(pmod(col("doc_id"), lit(10)) >= 3)
    val nHeld = held.count()
    val nbRight = LangIdOps.score(spark, held, model)
      .filter(col("lang") === col("pred_lang")).count()
    val lexRight = held
      .filter(col("lang") === TextOps.langId(col("text2"))).count()
    val nbAcc = nbRight.toDouble / nHeld
    val lexAcc = lexRight.toDouble / nHeld
    info(f"trained NB accuracy $nbAcc%.3f vs lexicon $lexAcc%.3f " +
      s"on $nHeld held-out docs")
    assert(nbAcc > lexAcc,
      s"trained $nbAcc must beat lexicon $lexAcc")
    assert(nbAcc >= 0.95, s"trained accuracy $nbAcc below 0.95")
  }

  test("heavy-tail vocabulary truncates deterministically at maxGrams " +
      "without accuracy loss on the held-out split") {
    // plant the CJK-crawl failure mode: per-doc unique noise tokens
    // whose bigrams are a huge count-1 tail (10⁷–10⁸ distinct grams
    // on a real crawl — the uncapped driver collect the r13 verdict
    // flagged). The cap must cut the tail, keep the repeated signal
    // bigrams, and leave held-out accuracy intact: a truncated gram
    // scores through the per-class unseen default, the same path an
    // unseen gram already takes.
    val clean = derived.localCheckpoint(true)
    val mClean = LangIdOps.train(spark, clean)
    val v0 = mClean.grams.size
    // per-doc pseudo-random CJK chars: a 6-char token whose bigrams
    // draw from a ~20k² pair space — genuinely count-1 tail grams
    // (hex noise would be the opposite: a 16-char alphabet makes
    // bigrams FREQUENT and they would legitimately win the count cut)
    def cjk(k: Int) = decode(unhex(lpad(hex(
      pmod(xxhash64(col("doc_id"), lit(k)), lit(20902)) + lit(19968)),
      4, "0")), "UTF-16BE")
    val noisy = clean.select(col("doc_id"), col("lang"),
      concat(col("text2"), lit(" "),
        cjk(1), cjk(2), cjk(3), cjk(4), cjk(5), cjk(6))
        .as("text2")).localCheckpoint(true)
    val mFull = LangIdOps.train(spark, noisy)
    assert(mFull.grams.size > v0 + 50,
      s"noise must inflate the vocab (${mFull.grams.size} vs $v0)")
    // cap at the clean-signal size: the tail truncates to exactly N
    val mCap = LangIdOps.train(spark, noisy, maxGrams = v0)
    assert(mCap.grams.size == v0)
    // deterministic: same corpus, any partitioning -> identical model
    val mCap2 = LangIdOps.train(spark, noisy.repartition(7), maxGrams = v0)
    def flat(m: LangIdOps.NbModel) =
      m.grams.map { case (g, a) => (g, a.toSeq) }
    assert(flat(mCap) == flat(mCap2) &&
      mCap.defaults.toSeq == mCap2.defaults.toSeq &&
      mCap.priors.toSeq == mCap2.priors.toSeq)
    // no accuracy loss on the held-out split vs the uncapped model
    val held = noisy.filter(pmod(col("doc_id"), lit(10)) >= 3)
      .localCheckpoint(true)
    val nHeld = held.count().toDouble
    def acc(m: LangIdOps.NbModel): Double =
      LangIdOps.score(spark, held, m)
        .filter(col("lang") === col("pred_lang")).count() / nHeld
    val aFull = acc(mFull)
    val aCap = acc(mCap)
    info(f"held-out accuracy capped $aCap%.3f vs uncapped $aFull%.3f " +
      s"(vocab $v0 vs ${mFull.grams.size})")
    assert(aCap >= aFull - 0.005 && aCap >= 0.95,
      s"cap must not cost accuracy: $aCap vs $aFull")
  }

  test("scores are exact integer sums: reversing partition order " +
      "cannot change a prediction (quantization discipline)") {
    val d = derived.localCheckpoint(true)
    val model = LangIdOps.train(spark, d)
    val a = LangIdOps.score(spark, d, model)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    val b = LangIdOps.score(spark, d.repartition(7), model)
      .orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
