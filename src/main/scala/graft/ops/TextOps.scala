package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are pure column expressions (whole-stage-codegen
  * friendly — no UDFs), so at 100 TB they run embarrassingly parallel
  * inside the scan stage with zero shuffle. Each has an exact ANSI-SQL
  * mirror used by the DuckDB oracle (patterns shared below so the two
  * sides cannot drift).
  *
  * The reference engine has no scalar function surface at all (SURVEY
  * §2.5; reference src/logical_plan/mod.rs:312-425 is the entire
  * expression language), so these are beyond-reference extensions.
  */
object TextOps {

  /** Stopword marker pattern — shared between Spark (Java regex) and
    * DuckDB (RE2); both dialects support \b word boundaries. */
  val StopwordPattern = "\\b(the|a)\\b"

  /** Language marker lexicons for the n-gram/marker-word language-ID
    * heuristic. Deterministic tie-break order: zh > en > fr > es > de. */
  val EnPattern = "\\b(the|a|is|and|of)\\b"
  val FrPattern = "\\b(le|la|et|est|les)\\b"
  val EsPattern = "\\b(el|en|y|es|los)\\b"
  val DePattern = "\\b(der|die|und|ist|das)\\b"
  val ZhPattern = "[\\x{4e00}-\\x{9fff}]"

  /** Whitespace token count (codegen'd; no UDF). */
  def tokenCount(text: Column): Column =
    size(split(text, " ")).cast("bigint")

  /** BPE-ish subword-boundary pattern: letter runs, digit runs, and
    * punctuation runs each become one pre-token (the segmentation BPE
    * vocabularies are trained over, minus lookahead constructs so the
    * same pattern runs under Java regex and DuckDB's RE2). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** BPE-ish pre-token count — the token-budget estimator a training
    * pipeline uses when the real tokenizer is too expensive to run on
    * every candidate document. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("bigint")

  private def patCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Per-document quality metrics: token count, stopword count,
    * chars-per-token, and a [0,1] quality score combining length and
    * stopword density. */
  def quality(df: DataFrame, text: Column, nChars: Column): DataFrame = {
    val nTokens = tokenCount(text)
    val stopCnt = patCount(text, StopwordPattern).cast("bigint")
    df.withColumn("n_tokens", nTokens)
      .withColumn("stop_cnt", stopCnt)
      .withColumn("chars_per_token",
        round(nChars.cast("double") / col("n_tokens"), 4))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_tokens") / lit(100.0)) *
          (lit(1.0) - col("stop_cnt").cast("double") / col("n_tokens")), 4))
  }

  /** Marker-word language ID. Same CASE cascade as the oracle SQL. */
  def langId(text: Column): Column = {
    val en = patCount(text, EnPattern)
    val fr = patCount(text, FrPattern)
    val es = patCount(text, EsPattern)
    val de = patCount(text, DePattern)
    val zh = patCount(text, ZhPattern)
    when(zh > 0, "zh")
      .when(en >= greatest(fr, es, de), "en")
      .when(fr >= greatest(es, de), "fr")
      .when(es >= de, "es")
      .otherwise("de")
  }

  /** Key-collision fingerprint: md5 of the sorted distinct token set.
    * Two documents with the same bag-of-words collide regardless of
    * word order / repetition — a standard near-dup blocking key. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(text, " ")))))

  /** PII patterns — Java-regex + RE2 compatible (no lookahead), shared
    * with the oracle mirrors below. Redaction order matters and is
    * fixed: URL first (URLs can embed '@' and digit runs), then email,
    * then phone. */
  val UrlPattern = "https?://[^ ]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b"

  /** Per-document PII exposure counts (emails / URLs / phone-shaped
    * numbers) — the signals a curation gate thresholds on before
    * documents reach a training set. */
  def piiCounts(df: DataFrame, text: Column): DataFrame = df
    .withColumn("n_urls", patCount(text, UrlPattern).cast("bigint"))
    .withColumn("n_emails", patCount(text, EmailPattern).cast("bigint"))
    .withColumn("n_phones", patCount(text, PhonePattern).cast("bigint"))

  /** Redact PII in place (typed placeholder per class). Pure column
    * expression — at 100 TB this runs inside the scan stage. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Repetition metrics (Gopher-style quality rule): distinct-token
    * count and the repeated-token fraction 1 - distinct/total. High
    * rep_frac marks boilerplate / keyword-stuffed documents. */
  def repetitionStats(df: DataFrame, text: Column): DataFrame = {
    val nTokens = tokenCount(text)
    val nDistinct = size(array_distinct(split(text, " "))).cast("bigint")
    df.withColumn("n_tokens", nTokens)
      .withColumn("n_distinct", nDistinct)
      .withColumn("rep_frac",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"),
          4))
  }

  /** Gopher repetition filters (Rae et al. 2021, Table A1) — the
    * n-gram half of the repetition rulebook ([[repetitionStats]] is
    * the distinct-token half). Per document:
    *
    *   - `top2..top4`: fraction of characters inside the single most
    *     frequent word n-gram (occurrences × gram chars / doc chars;
    *     ties break (count DESC, gram ASC));
    *   - `dup5..dup10`: fraction of WORD characters covered by any
    *     duplicated n-gram occurrence — the UNION of covered
    *     positions, so a character under three overlapping duplicated
    *     7-grams counts once;
    *   - `pass`: all nine thresholds hold (0.20/0.18/0.16 for top,
    *     0.15 down to 0.10 for dup — the paper's Table A1 values).
    *
    * Physical shape is the point at 100 TB: SHUFFLE-FREE. All nine
    * metrics come from ONE compiled pass per row
    * ([[graft.functions.SketchKernels.gopherRepetition]] — byte-slice
    * grams, one count map per n, byte-order tiebreaks) emitting exact
    * INTEGERS; the fractions and their round(4) stay in the SQL layer
    * so the DuckDB oracle replays them literally. The first cut of
    * this operator was a 9-window formulation (one Exchange + nine
    * in-partition sorts — Spark satisfies every (doc_id, gram_n)
    * clustering from HashPartitioning(doc_id)); it was plan-elegant
    * but measured 7.8 s at sf0.1: the nine sorts each reorder
    * full-width rows carrying every gram string. The kernel form is a
    * pure map (plan-gated in Round10cSpec). */
  def gopherRepetition(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, length(col(textCol)).as("len_text"),
      graft.functions.HashFunctions.gopherRepetition(col(textCol))
        .as("m"))
    def topFrac(n: Int): Column = {
      val cnt = element_at(col("m"), (n - 2) * 2 + 1)
      val ln = element_at(col("m"), (n - 2) * 2 + 2)
      when(cnt === 0L, lit(0.0))
        .otherwise(round(cnt * ln / col("len_text"), 4))
    }
    // zero word characters (empty / whitespace-only doc) would make
    // the ratio NULL in both engines and leave `pass` undefined —
    // emit 0.0 like topFrac's cnt === 0 arm (mirrored in the oracle)
    def dupFrac(n: Int): Column =
      when(element_at(col("m"), 13) === 0L, lit(0.0))
        .otherwise(round(element_at(col("m"), 7 + (n - 5)).cast("double")
          / element_at(col("m"), 13), 4))
    base
      .select(Seq(id) ++
        (2 to 4).map(n => topFrac(n).as(s"top$n")) ++
        (5 to 10).map(n => dupFrac(n).as(s"dup$n")): _*)
      .withColumn("pass",
        (col("top2") <= 0.20 && col("top3") <= 0.18 &&
          col("top4") <= 0.16 && col("dup5") <= 0.15 &&
          col("dup6") <= 0.14 && col("dup7") <= 0.13 &&
          col("dup8") <= 0.12 && col("dup9") <= 0.11 &&
          col("dup10") <= 0.10).cast("bigint"))
  }

  /** Per-(doc, term) TF-IDF over whitespace tokens: tf = in-doc term
    * count, idf = ln((N+1)/(df+1)) with N = corpus size and df = docs
    * containing the term. Shape: one explode + two aggregations + one
    * join on term (the df table is vocabulary-sized — broadcastable at
    * any corpus scale); no UDFs, `minLen` bounds the token stream.
    * Scores are rounded to 6 places so cross-engine comparisons (and
    * the per-doc top-term ordering) never hinge on a last-ulp
    * difference in ln(). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 4): DataFrame = {
    val n = docs.count() // one scalar to the driver — metadata-sized
    val terms = docs.select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) >= minLen)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(docFreq, Seq("term"))
      .withColumn("tfidf",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6))
  }

  /** BM25 relevance of each document against a bag of query terms
    * (Robertson-Sparck Jones probabilistic weighting; the BM25+ idf
    * form ln(1 + (N-df+0.5)/(df+0.5)) keeps weights positive for
    * terms in over half the corpus).
    *
    * Shape for scale: the term stream is filtered to the query bag
    * BEFORE the tf aggregation (the explode feeds a codegen'd filter,
    * so only matching tokens reach the shuffle), df is a
    * |query-bag|-row aggregate, and N/avgdl travel as one broadcast
    * stats row — no driver-side counts, no second corpus pass beyond
    * the doc-length projection. Scores round to 4 places so the
    * cross-engine top-k cut never hinges on a last-ulp ln()/division
    * difference. Output: (doc_id, score), the `topK` best, ties broken
    * by doc id. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 20, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val dl = docs.select(col(idCol),
      size(split(lower(col(textCol)), " ")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df_), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("w",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Unigram language-model perplexity of every document against a
    * model trained on the corpus itself — the CCNet/KenLM-style
    * statistical quality signal (a doc whose token distribution is far
    * from the corpus LM scores high perplexity: boilerplate, gibberish,
    * wrong-language leakage). Add-k smoothed: p(t) = (c_t + k) /
    * (total + k·|V|).
    *
    * Shape for scale: training IS the vocab aggregate (one pass over
    * the token stream — no iterations, no driver-side model); the
    * corpus-wide scalars (total tokens, |V|) ride as one broadcast
    * stats row; scoring joins the per-doc term frequencies against the
    * vocab co-keyed on term, so nothing document-shaped is ever
    * collected. Per-term NLL contributions are rounded then
    * decimal-summed (the dsum discipline), so per-doc totals are
    * bit-identical under any partitioning; ppl exponentiates an
    * 8-dp-rounded average so cross-engine ln/exp ulps cannot flip the
    * rounded output.
    *
    * Beyond-reference (the reference has no scalar functions at all,
    * SURVEY §2.5; ref src/logical_plan/mod.rs:312-425). */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val terms = docs.select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    val stats = vocab.agg(sum(col("c")).as("total"),
      count(lit(1)).as("v"))
    val avg = col("nll").cast("double") / col("n_tokens")
    tf.join(vocab, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("term_nll",
        round(col("tf") * -log((col("c") + k) /
          (col("total") + lit(k) * col("v"))), 12)
          .cast(DecimalType(28, 14)))
      .groupBy(col(idCol))
      .agg(sum(col("term_nll")).as("nll"),
        sum(col("tf")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        round(avg, 6).as("avg_nll"),
        round(exp(round(avg, 8)), 4).as("ppl"))
  }

  /** ANSI-SQL mirrors (DuckDB dialect) for the oracle. */
  object sql {
    val tokenCount = "cast(len(string_split(text, ' ')) as bigint)"
    val sumTokens = "cast(sum(len(string_split(text, ' '))) as bigint)"
    def bpeTokenCountOf(e: String): String =
      s"cast(len(regexp_extract_all($e, " +
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) as bigint)"
    val bpeTokenCount = bpeTokenCountOf("text")
    def patCount(pattern: String): String =
      s"len(regexp_extract_all(text, '$pattern'))"
    val fingerprint =
      "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
    // PII mirrors: identical patterns and the SAME redaction order as
    // piiRedact (URL, then email, then phone); 'g' = replace all, which
    // is Spark regexp_replace's default.
    val url = "https?://[^ ]+"
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b"
    val piiRedact =
      s"regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'$url', '<URL>', 'g'), '$email', '<EMAIL>', 'g'), " +
        s"'$phone', '<PHONE>', 'g')"
    // DuckDB regex strings use the same \b / \x{...} syntax as Java here,
    // but single-backslash escaping inside SQL literals.
    val stopword = "\\b(the|a)\\b"
    val en = "\\b(the|a|is|and|of)\\b"
    val fr = "\\b(le|la|et|est|les)\\b"
    val es = "\\b(el|en|y|es|los)\\b"
    val de = "\\b(der|die|und|ist|das)\\b"
    val zh = "[\\x{4e00}-\\x{9fff}]"
  }
}
