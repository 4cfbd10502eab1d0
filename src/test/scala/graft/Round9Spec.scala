package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 gates.
  *
  * Bucket-overflow discipline (VERDICT r8 #1): `bucketPairs` must never
  * drop a bucket silently — the EXACT contract (`setSimPairsExact`)
  * fails loud with `raise_error` when a prefix bucket saturates its
  * `maxBucket` cap, and the LSH family surfaces a dropped-bucket count
  * as an observed metric. At test scale the DuckDB oracle would catch a
  * binding cap; at 100 TB there is no oracle — the engine must defend
  * its own contract.
  */
class Round9Spec extends SparkSpec {

  /** 6 identical docs — every shingle bucket (prefix, band, …) holds
    * all 6 ids, so any cap below 6 is binding. */
  private def hotDocs: DataFrame = {
    import spark.implicits._
    (0L until 6L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
  }

  test("setsim exact FAILS LOUD when a prefix bucket exceeds maxBucket") {
    val ex = intercept[Exception] {
      graft.ops.DedupOps
        .setSimPairsExact(hotDocs, "doc_id", "text", maxBucket = 3)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(ex).mkString(" | ")
    assert(all.contains("exceeded maxBucket=3"),
      s"expected a loud bucket-overflow failure, got: $all")
  }

  test("setsim exact still succeeds when the cap is not binding") {
    // same planted hot corpus, cap above the bucket size: the identical
    // docs are legitimate 1.0-Jaccard pairs and must ALL be reported
    val got = graft.ops.DedupOps
      .setSimPairsExact(hotDocs, "doc_id", "text", maxBucket = 100)
      .collect()
    assert(got.length == 15, s"6 identical docs -> C(6,2)=15 pairs, got ${got.length}")
    assert(got.forall(_.getDouble(2) == 1.0))
  }

  test("LSH family reports dropped-bucket count via observed metric") {
    import spark.implicits._
    // hot corpus PLUS one small legitimate near-dup pair: the surviving
    // bucket keeps the result non-empty, because AQE's empty-relation
    // propagation would otherwise prune the CollectMetrics node out of
    // the final plan (an all-dropped front returns 0 rows — itself the
    // alarm at scale)
    val pairDocs = Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val cand = graft.ops.DedupOps
      .minhashCandidates(hotDocs.union(pairDocs), "doc_id", "text",
        maxBucket = 3)
    val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L)),
      s"only the small bucket survives the cap; got $got")
    val dropped = cand.queryExecution.observedMetrics.collect {
      case (name, row)
          if name.startsWith(graft.ops.DedupOps.DroppedBucketMetricPrefix) =>
        row.getLong(0)
    }
    assert(dropped.nonEmpty, "expected a graft_dropped_buckets metric")
    assert(dropped.sum > 0,
      s"the 6-identical-doc band buckets overflowed; tally was ${dropped.sum}")
  }

  test("LSH dropped-bucket metric is ZERO on the real corpus (no silent loss)") {
    val docs = Tables.documents(spark, Sf0001)
    val cand = graft.ops.DedupOps
      .minhashCandidates(docs, "doc_id", "text")
    cand.queryExecution.toRdd.count()
    val dropped = cand.queryExecution.observedMetrics.collect {
      case (name, row)
          if name.startsWith(graft.ops.DedupOps.DroppedBucketMetricPrefix) =>
        row.getLong(0)
    }
    assert(dropped.nonEmpty && dropped.sum == 0,
      s"default caps must not bind at test scale: $dropped")
  }
}
