package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Gates for the byte-budget shard export: the budget contract
  * (multi-member shards always fit; only single oversize pairs may
  * exceed), exact corpus coverage, layout identity against the
  * independent arithmetic, and the oversize arm on synthetic docs
  * (the real corpus's member pairs are 8.5-15.9 KiB, so no single
  * budget exercises both packing and oversize there). */
class ShardBudgetSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("at a 32 KiB budget shards pack 2-3 member pairs, every " +
      "multi-doc shard fits, and coverage is exact") {
    val budget = 32768L
    val shards = Multimodal.shardExportBudget(spark, docs, budget, 64L)
      .collect()
    assert(shards.nonEmpty)
    shards.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val tarBytes = r.getAs[Long]("tar_bytes")
      assert(r.getAs[Long]("n_members") == nDocs * 2)
      if (nDocs > 1)
        assert(tarBytes <= budget,
          s"multi-doc shard ${r.getAs[Long]("shard_id")} blew the budget")
      assert(r.getAs[Boolean]("fits") ==
        (tarBytes <= budget || nDocs == 1))
    }
    assert(shards.exists(_.getAs[Long]("n_docs") > 1),
      "no packed shard — packing arm not exercised")
    // exact coverage: every doc in exactly one shard
    assert(shards.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // layout identity: built archive lengths == manifest arithmetic
    // (recomputed independently here)
    val expected = docs.collect().map { r =>
      val text = r.getAs[String]("text")
      val (_, w, h, _) = Multimodal.genImage(text)
      val txt = text.getBytes("UTF-8").length.toLong
      val ppm = 9L + w.toString.length + h.toString.length +
        w.toLong * h * 3
      512L + (txt + 511) / 512 * 512 + 512L + (ppm + 511) / 512 * 512
    }.sum + shards.length * 1024L
    assert(shards.map(_.getAs[Long]("tar_bytes")).sum == expected)
  }

  test("shard ids are contiguous from 0 (the withGlobalOffset scan " +
      "concatenates bucket ranges without gaps)") {
    val shards = Multimodal.shardExportBudget(spark, docs, 32768L, 64L)
      .orderBy(col("shard_id")).collect()
    val ids = shards.map(_.getAs[Long]("shard_id"))
    assert(ids.toSeq == (0L until ids.length.toLong))
  }

  test("the oversize arm: a member pair larger than the whole budget " +
      "gets its own flagged shard and never blocks its neighbors") {
    import spark.implicits._
    // doc 1's text alone (30 KiB) exceeds the 16 KiB budget; docs
    // 0/2/3 are small and must still pack together around it
    val synth = Seq(
      (0L, "aa" + ("x" * 100)),
      (1L, "ab" + ("y" * 30000)),
      (2L, "ac" + ("z" * 100)),
      (3L, "ad" + ("w" * 100))).toDF("doc_id", "text")
    val budget = 16384L
    val shards = Multimodal.shardExportBudget(spark, synth, budget, 64L)
      .orderBy(col("shard_id")).collect()
    val oversize = shards.filter(_.getAs[Long]("tar_bytes") > budget)
    assert(oversize.length == 1, "exactly one oversize shard expected")
    assert(oversize.head.getAs[Long]("n_docs") == 1L)
    assert(oversize.head.getAs[Boolean]("fits"),
      "single oversize member is within the next-fit contract")
    shards.filterNot(_ eq oversize.head).foreach { r =>
      assert(r.getAs[Long]("tar_bytes") <= budget)
    }
    assert(shards.map(_.getAs[Long]("n_docs")).sum == 4L)
  }
}
