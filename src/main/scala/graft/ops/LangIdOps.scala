package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED language identification: a char-bigram multinomial Naive
  * Bayes classifier, learned from a labeled seed split with one
  * distributed count aggregate and scored map-side against the
  * broadcast model — the [[QualityClassifierOps]] discipline (train
  * once, bit-deterministic artifact, embedded-model oracle replay)
  * applied to the marker-lexicon `text_langid` heuristic's job.
  *
  * Determinism discipline: every log-probability is quantized to
  * integer MICRO-UNITS (`round(ln(p)·1e6)`) on the DRIVER with
  * StrictMath, so per-document scores are sums of embedded integer
  * literals — order-independent, shuffle-safe, and bit-identical in
  * DuckDB (the oracle receives the same integers via `{{...}}`
  * substitution). No float ever crosses an engine boundary.
  *
  * Model: Laplace-smoothed class-conditional bigram probabilities
  * `P(g|c) = (cnt(c,g)+1)/(T_c+V)` with per-class priors; a bigram
  * outside class c's seed counts gets the same `1/(T_c+V)` default
  * whether or not other classes saw it.
  *
  * Scale shape: training is ONE explode + groupBy count over the seed
  * split (the model is KB-sized: |bigrams|×|classes| integers);
  * scoring is a broadcast join + one integer aggregate per document.
  * At 100 TB the model still fits in a task broadcast and scoring
  * stays map-shaped + one partial-aggregating shuffle on doc_id.
  */
object LangIdOps {

  /** Fixed class order — also the argmax tie-break cascade. */
  val Classes: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** Per-language function-word phrases the derived corpus appends
    * (the labeled text signal; TESTDATA's text column does not vary
    * by its lang label, so the trainable signal is planted by
    * arithmetic both engines replay). */
  val Phrases: Map[String, String] = Map(
    "de" -> " der die und das ein mit",
    "en" -> " the and of is to in",
    "es" -> " el los las una por del",
    "fr" -> " le la et les des une",
    "zh" -> " 的 是 在 了 和 有")

  /** The derived multilingual text: the doc's text plus its label's
    * phrase repeated 1 + doc_id mod 3 times. */
  def derivedText(text: Column, lang: Column, docId: Column): Column = {
    val phrase = Phrases.foldLeft(lit("")) { case (acc, (l, p)) =>
      when(lang === l, lit(p)).otherwise(acc)
    }
    concat(text, phrase,
      when(pmod(docId, lit(3)) >= 1, phrase).otherwise(lit("")),
      when(pmod(docId, lit(3)) === 2, phrase).otherwise(lit("")))
  }

  /** SQL mirror of [[derivedText]] (DuckDB dialect). */
  def derivedTextSql: String = {
    val caseSql = "CASE lang " + Classes.map(c =>
      s"WHEN '$c' THEN '${Phrases(c)}'").mkString(" ") + " ELSE '' END"
    s"text || $caseSql || " +
      s"CASE WHEN doc_id % 3 >= 1 THEN $caseSql ELSE '' END || " +
      s"CASE WHEN doc_id % 3 = 2 THEN $caseSql ELSE '' END"
  }

  /** Char bigrams of a string column, with multiplicity (positions
    * 1..len-1, character-based substr — identical semantics in
    * DuckDB's substr/length). Texts shorter than 2 chars yield the
    * EMPTY array: Spark's sequence(1, 0) is the descending [1, 0]
    * (phantom grams), while DuckDB's generate_series(1, 0) is empty —
    * the guard keeps both engines on the empty branch. */
  def bigrams(text: Column): Column =
    when(length(text) >= 2,
      transform(sequence(lit(1), length(text) - 1),
        i => text.substr(i, lit(2))))
      .otherwise(typedLit(Seq.empty[String]))

  /** The trained model: per-bigram micro-unit log-probs in [[Classes]]
    * order, the per-class unseen-bigram default, and per-class priors. */
  final case class NbModel(grams: Seq[(String, Array[Long])],
      defaults: Array[Long], priors: Array[Long])

  /** Train on the seed split (doc_id mod 10 < 3) of a derived corpus
    * carrying (doc_id, lang, text2). ONE distributed aggregate
    * produces (lang, bigram, count); everything after runs on the
    * driver over the capped count dict with StrictMath (the
    * BpeOps 100-TB split: corpus-sized work distributed, model-sized
    * work local).
    *
    * `maxGrams` caps the MODEL VOCABULARY at the top-N bigrams by
    * (total count DESC, gram) — the `BpeOps.wordTypeCounts` maxTypes
    * discipline. On this corpus the char-bigram vocab is tiny and the
    * cap never binds (the model is bit-identical to uncapped); on a
    * real multilingual crawl (CJK) distinct bigrams reach 10⁷–10⁸ and
    * an uncapped driver collect + broadcast model would become the
    * bottleneck. Truncated tail grams score through the per-class
    * unseen default — exactly the path a gram absent from the seed
    * split already takes, so truncation degrades smoothly (gated in
    * LangIdSpec on a planted heavy-tail vocab). Class totals T_c stay
    * FULL-vocabulary sums (computed distributedly before the cut), so
    * retained-gram probabilities are unchanged by the cap; only V —
    * the Laplace vocabulary size — follows the retained set. */
  def train(spark: SparkSession, derived: DataFrame,
      maxGrams: Int = 200000): NbModel = {
    val seed = derived.filter(pmod(col("doc_id"), lit(10)) < 3)
    val countsDf = seed
      .select(col("lang"), explode(bigrams(col("text2"))).as("g"))
      .groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds totals, the cap cut, and the model
    // full-vocabulary class totals: |Classes| rows to the driver
    val tcMap = countsDf.groupBy(col("lang")).agg(sum(col("n")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the vocabulary cut: top-N grams by (total count DESC, gram),
    // decided distributedly — only capped rows ever reach the driver
    val retained = countsDf.groupBy(col("g"))
      .agg(sum(col("n")).as("tot"))
      .orderBy(col("tot").desc, col("g"))
      .limit(maxGrams)
      .select(col("g"))
    val counts = countsDf.join(broadcast(retained), Seq("g"))
      .collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(2)))
    val nDocs = seed.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a class with no seed examples has no prior: ln(0) would
    // quantize to Long.MinValue and WRAP under Spark's 64-bit sums
    // (DuckDB's 128-bit sums don't) — fail loud instead of training
    // a model the two engines score differently
    require(Classes.forall(c => nDocs.getOrElse(c, 0L) > 0L),
      "langid: seed split has no examples for " +
        Classes.filter(c => nDocs.getOrElse(c, 0L) == 0L)
          .mkString(", "))
    val vocab = counts.map(_._2).distinct.sorted
    val v = vocab.length.toLong
    val tC = Classes.map(c => tcMap.getOrElse(c, 0L))
    val byGram = counts.groupBy(_._2)
    def micro(x: Double): Long = math.round(StrictMath.log(x) * 1e6)
    val grams = vocab.map { g =>
      val per = byGram(g).map(t => (t._1, t._3)).toMap
      g -> Classes.zipWithIndex.map { case (c, i) =>
        micro((per.getOrElse(c, 0L) + 1.0) / (tC(i) + v))
      }
    }.toSeq
    val defaults = Classes.indices.map(i =>
      micro(1.0 / (tC(i) + v))).toArray
    val totalSeed = nDocs.values.sum
    val priors = Classes.map(c =>
      micro(nDocs.getOrElse(c, 0L).toDouble / totalSeed))
    NbModel(grams, defaults, priors)
  }

  /** Score a derived corpus against a trained model: explode bigrams,
    * broadcast-join the model, sum integer log-probs per document,
    * add priors, argmax with the fixed [[Classes]] cascade. Returns
    * (doc_id, lang, pred_lang). */
  def score(spark: SparkSession, derived: DataFrame,
      model: NbModel): DataFrame = {
    import spark.implicits._
    val modelDf = model.grams.map { case (g, lps) =>
      (g, lps(0), lps(1), lps(2), lps(3), lps(4))
    }.toDF("g", "lp_de", "lp_en", "lp_es", "lp_fr", "lp_zh")
    val exploded = derived.select(col("doc_id"), col("lang"),
      explode(bigrams(col("text2"))).as("g"))
    val joined = exploded.join(broadcast(modelDf), Seq("g"), "left")
    val sums = Classes.zipWithIndex.map { case (c, i) =>
      (sum(coalesce(col(s"lp_$c"), lit(model.defaults(i)))) +
        lit(model.priors(i))).as(s"s_$c")
    }
    val scored = joined.groupBy(col("doc_id"), col("lang"))
      .agg(sums.head, sums.tail: _*)
    val s = Classes.map(c => col(s"s_$c"))
    val pred = when(s(0) >= greatest(s(1), s(2), s(3), s(4)), "de")
      .when(s(1) >= greatest(s(2), s(3), s(4)), "en")
      .when(s(2) >= greatest(s(3), s(4)), "es")
      .when(s(3) >= s(4), "fr")
      .otherwise("zh")
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
  }

  /** The model's bigram rows as DuckDB VALUES literals (for the
    * `{{LANGID_ROWS}}` oracle parameter). */
  def rowsSql(model: NbModel): String =
    model.grams.map { case (g, lps) =>
      val esc = g.replace("'", "''")
      s"('$esc', ${lps.mkString(", ")})"
    }.mkString(",\n    ")
}
