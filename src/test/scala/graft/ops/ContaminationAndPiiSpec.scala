package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Correctness gates for the round-4 curation operators:
  *  - evalOverlap (decontamination) vs an EXACT raw-shingle
  *    intersection ground truth on the driver documents, plus a
  *    planted-leak case;
  *  - PII counting/redaction on crafted documents covering each
  *    pattern class and the fixed redaction order.
  */
class ContaminationAndPiiSpec extends SparkSpec {
  import spark.implicits._

  test("evalOverlap matches exact raw-shingle intersection ground truth") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)

    val got = DedupOps.evalOverlap(corpus, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

    // ground truth over RAW shingle strings (no hashing): distinct
    // 3-token windows, same short-doc fallback as the kernel
    def shing(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      array_distinct(DedupOps.wordShingles(
        DedupOps.tokens(col("text")), 3)).as("s"))
    val evalGrams = shing(evalSet).select(explode(col("s")).as("g"))
      .distinct()
    val truth = shing(corpus).select(col("doc_id"), explode(col("s")).as("g"))
      .join(evalGrams, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got.nonEmpty)
    got.foreach { case (id, (n, flag)) =>
      assert(n == truth.getOrElse(id, 0L),
        s"doc $id: got $n, truth ${truth.getOrElse(id, 0L)}")
      assert(flag == (n >= 2), s"doc $id flag")
    }
    assert(got.keySet.size == corpus.count())
  }

  test("evalOverlapBloom is byte-identical to evalOverlap") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = toMap(
      DedupOps.evalOverlap(corpus, evalSet, "doc_id", "text"))
    val bloom = toMap(
      DedupOps.evalOverlapBloom(corpus, evalSet, "doc_id", "text"))
    assert(bloom == exact,
      "bloom gate must not change the decontamination result")
    assert(exact.values.exists(_._2), "fixture must contain contamination")
  }

  test("bloom artifact round-trips through bytes: persisted filter == fresh filter") {
    import spark.implicits._
    val grams = (1L to 5000L).map(_ * 2654435761L).toDF("g")
    val bytes = DedupOps.buildEvalBloom(grams, fpp = 0.01)
    // persist + reload (the per-eval-release artifact flow)
    val p = java.nio.file.Files.createTempFile("graft-bloom", ".bin")
    java.nio.file.Files.write(p, bytes)
    val reloaded = java.nio.file.Files.readAllBytes(p)
    // no false negatives through the round-trip: every member hits
    val members = grams.filter(
      DedupOps.bloomMightContain(reloaded, col("g"))).count()
    assert(members == 5000L, s"bloom dropped ${5000 - members} members")
    // and the fpp bound roughly holds on non-members
    val nonMembers = (1L to 5000L).map(_ * 7919L + 3L).toDF("g")
      .filter(DedupOps.bloomMightContain(reloaded, col("g"))).count()
    assert(nonMembers < 250, s"bloom fp count $nonMembers out of bound")
  }

  test("cachedEvalBloom serves byte-identical filter and an unchanged result") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val grams = DedupOps.evalShingleGrams(evalSet, "text")
    val src = s"$Sf0001/documents.parquet"
    val fresh = DedupOps.buildEvalBloom(grams)
    // first call builds + persists; second must serve identical bytes
    val first = DedupOps.cachedEvalBloom(spark, src, "specmod50", grams)
    val second = DedupOps.cachedEvalBloom(spark, src, "specmod50", grams)
    assert(java.util.Arrays.equals(first, fresh) &&
      java.util.Arrays.equals(second, fresh),
      "cached filter bytes differ from a fresh build")
    // and the decon result through the artifact == the exact result
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val viaArtifact = toMap(DedupOps.evalOverlapBloom(
      corpus, evalSet, "doc_id", "text", bloomBytes = Some(second)))
    val exact = toMap(
      DedupOps.evalOverlap(corpus, evalSet, "doc_id", "text"))
    assert(viaArtifact == exact,
      "persisted-artifact decon must match the exact result")
  }

  test("evalOverlap flags a planted leak and clears unrelated docs") {
    val evalSet = Seq((900L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // verbatim leak
      (2L, "prefix words alpha beta gamma more trailing text"), // partial
      (3L, "completely unrelated content with different words")
    ).toDF("doc_id", "text")
    val rows = DedupOps.evalOverlap(corpus, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(rows(1L)._1 == 4L && rows(1L)._2, s"verbatim leak: ${rows(1L)}")
    assert(rows(2L)._1 == 1L && !rows(2L)._2, s"one shared shingle: ${rows(2L)}")
    assert(rows(3L) == ((0L, false)), s"clean doc: ${rows(3L)}")
  }

  test("PII counts and redaction on crafted documents") {
    val docs = Seq(
      (1L, "contact me at alice@example.com or bob.smith+x@mail.co today"),
      (2L, "see https://example.com/a?q=1 and http://t.co/xyz for info"),
      (3L, "call 555-123-4567 or 415 555 1234 now"),
      (4L, "mixed https://a.io/u@v.com page and carol@d.org plus 212-555-0100"),
      (5L, "no sensitive content here at all")
    ).toDF("doc_id", "text")
    val rows = TextOps.piiCounts(docs, col("text"))
      .select(col("doc_id"), col("n_emails"), col("n_urls"),
        col("n_phones"), TextOps.piiRedact(col("text")).as("red"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // (n_emails, n_urls, n_phones, redacted)
    assert(rows(1L)._1 == 2 && rows(1L)._2 == 0 && rows(1L)._3 == 0)
    assert(rows(1L)._4 == "contact me at <EMAIL> or <EMAIL> today")
    assert(rows(2L)._2 == 2 && rows(2L)._1 == 0)
    assert(rows(2L)._4 == "see <URL> and <URL> for info")
    assert(rows(3L)._3 == 2)
    assert(rows(3L)._4 == "call <PHONE> or <PHONE> now")
    // counts measure RAW exposure (the URL-embedded u@v.com counts as
    // an email too); redaction order consumes the URL first, so the
    // embedded email is not double-replaced
    assert(rows(4L) == ((2L, 1L, 1L,
      "mixed <URL> page and <EMAIL> plus <PHONE>")))
    assert(rows(5L) == ((0L, 0L, 0L, "no sensitive content here at all")))
  }

  test("repetition stats separate boilerplate from varied text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight completely different words in this doc here")
    ).toDF("doc_id", "text")
    val rows = TextOps.repetitionStats(docs, col("text"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("rep_frac"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1L) == ((8L, 1L, 0.875)))
    assert(rows(2L) == ((8L, 8L, 0.0)))
  }
}
