package graft

import org.apache.spark.sql.functions._

/** Round-7 gates. */
class Round7Spec extends SparkSpec {

  test("knuthHash: ANSI-safe for the full id range, bit-identical to BigInt naive") {
    import spark.implicits._
    // ids straddling the naive-formula overflow point (~3.46e9) and far
    // beyond; includes 2^32 boundary values and a negative id.
    val ids = Seq(0L, 1L, 2L, 17L, 65535L, 65536L, 123456789L,
      3459999999L, 3460000001L, 4294967295L, 4294967296L,
      5000000000L, 1000000000000L, (1L << 62), -7L)
    val got = ids.toDF("id")
      .select(col("id"), SparkEntry.knuthHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val A = BigInt(2654435761L)
    val M = BigInt(1) << 32
    ids.foreach { i =>
      val want = (((BigInt(i) mod M) * A) mod M).toLong
      assert(got(i) == want, s"id=$i got=${got(i)} want=$want")
    }
  }

  test("q_chunk: chunks tile every document with the declared overlap") {
    val docs = graft.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("q_chunk")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every document must be chunked")
    byDoc.foreach { case (id, cs) =>
      val len = docs(id)
      val expected = 1L + math.max(0L, math.ceil((len - 120).toDouble / 80).toLong)
      assert(cs.length == expected, s"doc $id: ${cs.length} != $expected chunks")
      val sorted = cs.sortBy(_._2)
      // all chunks are full-size except possibly the last, which still
      // reaches the end of the document
      sorted.init.foreach { case (_, _, n) => assert(n == 120) }
      val (_, lastId, lastN) = sorted.last
      assert(lastId * 80 + lastN == len.toLong,
        s"doc $id: last chunk must end at the document end")
    }
  }

  test("q_weighted_stratified: per-language rank contract") {
    val res = SparkEntry.queries("q_weighted_stratified")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = res.groupBy(_._1)
    val langSizes = graft.Tables.documents(spark, Sf0001)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langSizes.foreach { case (lang, n) =>
      val got = perLang.getOrElse(lang, Array.empty).map(_._2).sorted.toSeq
      val want = (1L to math.min(5L, n)).toSeq
      assert(got == want, s"$lang: ranks $got != $want")
    }
    // no document sampled twice across strata
    val ids = res.map(_._3)
    assert(ids.distinct.length == ids.length)
  }

  test("knuthHashSql mirrors knuthHash exactly (Spark SQL evaluation)") {
    import spark.implicits._
    val ids = Seq(0L, 65535L, 65536L, 3460000001L, 5000000000L,
      -7L, -65536L, -4294967297L)
    val df = ids.toDF("id")
    df.createOrReplaceTempView("khs_ids")
    val viaSql = spark.sql(
      s"SELECT id, ${SparkEntry.knuthHashSql("id")} AS h FROM khs_ids")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = df.select(col("id"), SparkEntry.knuthHash(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }
}
