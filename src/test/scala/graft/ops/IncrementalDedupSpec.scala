package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equivalence gate for the incremental dedup path: batch-vs-corpus
  * detection against PERSISTED sketch tables must find exactly the
  * pairs the full-recompute pipeline finds that touch the new batch. */
class IncrementalDedupSpec extends SparkSpec {

  test("incremental pairs == full-recompute pairs touching the new batch") {
    val all = graft.Tables.documents(spark, Sf0001)
    val corpus = all.filter(col("doc_id") < 400)
    val fresh = all.filter(col("doc_id") >= 400)

    // the persisted artifacts (round-trip through parquet to prove the
    // schema survives storage)
    val dir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    DedupOps.minhashBands(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/bands")
    DedupOps.shingleSets(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/shingles")

    val inc = DedupOps.incrementalMinhashPairs(fresh,
      spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/shingles"), "doc_id", "text")
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(2) * 10000)))
      .toSet

    val full = DedupOps.minhashPairs(all, "doc_id", "text")
      .filter(col("a") >= 400 || col("b") >= 400)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 10000)))
      .toSet

    assert(inc.nonEmpty, "the batch must contain dups of the corpus")
    assert(inc == full,
      s"missing=${(full -- inc).take(5)} extra=${(inc -- full).take(5)}")
  }
}
