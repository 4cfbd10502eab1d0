package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** DedupOps.spanExcise — exact duplicated-span removal (ExactSubstr
  * shape, Lee et al. '22). The L-gram reduction must behave exactly
  * like maximal-span excision: union of duplicated L-windows == union
  * of duplicated spans >= L. */
class SpanExciseSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    DedupOps.spanExcise(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("cross-document shared 8-token window is excised from both docs") {
    val got = run(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h x y"))
    assert(got(1L) == ((10L, 8L, md5hex("i j"))))
    assert(got(2L) == ((10L, 8L, md5hex("x y"))))
  }

  test("document with no duplicated window passes through byte-identical") {
    val got = run(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h x y",
      3L -> "unique tokens only here nothing repeats at all"))
    assert(got(3L) ==
      ((8L, 0L, md5hex("unique tokens only here nothing repeats at all"))))
  }

  test("within-document immediate repeat excises the whole document") {
    val got = run(Seq(
      1L -> "p q r s t u v w p q r s t u v w",
      2L -> "totally unrelated filler words that appear exactly once"))
    assert(got(1L) == ((16L, 16L, md5hex(""))))
    assert(got(2L)._2 == 0L)
  }

  test("shared span longer than L is covered maximally (interval union)") {
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val got = run(Seq(
      5L -> s"z1 z2 $span z3",
      6L -> s"y1 $span y2"))
    assert(got(5L) == ((13L, 10L, md5hex("z1 z2 z3"))))
    assert(got(6L) == ((12L, 10L, md5hex("y1 y2"))))
  }

  test("short documents (< L tokens) are untouched") {
    val got = run(Seq(
      1L -> "too short",
      2L -> "too short")) // identical, but no 8-token window exists
    assert(got(1L) == ((2L, 0L, md5hex("too short"))))
    assert(got(2L) == ((2L, 0L, md5hex("too short"))))
  }

  /** Independent recompute with gram STRINGS instead of xxhash64 longs:
    * certifies both the hashed plan's logic and collision-freedom on
    * the driver corpus. */
  private def stringExcise(docs: DataFrame): DataFrame = {
    val L = 8
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
    val pos = toks.filter(size(col("w")) >= L)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("w")) - L),
        i => array_join(slice(col("w"), i + lit(1), lit(L)), " "))))
      .toDF("doc_id", "pos", "gram")
    val dup = pos.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("gram")
    val covered = pos.join(dup, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(L - 1))).as("idx"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("idx")).as("cov"))
    toks.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_removed"),
        md5(array_join(filter(col("w"),
          (_, i) => !array_contains(
            coalesce(col("cov"), array().cast("array<int>")), i)),
          " ")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  test("spanIntervals: maximal intervals match the excised positions") {
    import spark.implicits._
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val rows = Seq(
      5L -> s"z1 z2 $span z3",
      6L -> s"y1 $span y2",
      7L -> "p q r s t u v w p q r s t u v w",
      8L -> "no duplicated window in this document at all right")
    val got = DedupOps
      .spanIntervals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 5: one maximal span covering s1..s10 at positions 2..11;
    // doc 6: same span at 1..10; doc 7: whole doc; doc 8: nothing
    assert(got.toSeq == Seq(
      (5L, 2L, 10L, md5hex(span)),
      (6L, 1L, 10L, md5hex(span)),
      (7L, 0L, 16L, md5hex("p q r s t u v w p q r s t u v w"))))
  }

  test("spanIntervals: two disjoint duplicated spans stay two islands") {
    import spark.implicits._
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val got = DedupOps.spanIntervals(Seq(
      1L -> s"$a gapword $b",
      2L -> s"x0 $a x1",
      3L -> s"x2 $b x3").toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 8L, md5hex(a)), (1L, 9L, 8L, md5hex(b)),
      (2L, 1L, 8L, md5hex(a)),
      (3L, 1L, 8L, md5hex(b))))
  }

  test("span_stats totals reconcile with spanExcise per-doc counts") {
    val docs = Tables.documents(spark, Sf0001)
    val perDoc = DedupOps.spanExcise(docs, "doc_id", "text").collect()
    val stats = graft.SparkEntry.queries("dedup_span_stats")(spark, Sf0001)
      .collect()
    assert(stats.map(_.getLong(3)).sum == perDoc.map(_.getLong(2)).sum)
    assert(stats.map(_.getLong(1)).sum == perDoc.length)
  }

  test("hashed plan == string-counted recompute on sf0.001 documents") {
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
    val got = DedupOps.spanExcise(docs, "doc_id", "text").collect()
    val want = stringExcise(docs).collect()
    assert(got.sameElements(want))
    // the planted near-dups in the driver corpus must light this up
    assert(got.count(_.getLong(2) > 0) > 0,
      "expected at least one document with excised spans at sf0.001")
  }
}
