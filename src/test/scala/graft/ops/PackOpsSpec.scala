package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the global packing family: the scalable exclusive
  * prefix sum ([[PackOps.withGlobalOffset]]) must equal the global
  * window it replaces for ANY partition count, and the block
  * arithmetic must reconstruct every interior training block to
  * exactly its full length from the exploded fragments. */
class PackOpsSpec extends SparkSpec {

  test("withGlobalOffset == global-window cumsum, invariant in parts") {
    import spark.implicits._
    // adversarial lengths: zeros, block-sized, giant multi-block doc
    val rows = Seq(
      (10L, 5L), (11L, 0L), (12L, 128L), (13L, 1L), (14L, 700L),
      (15L, 0L), (16L, 127L), (17L, 129L), (18L, 3L), (19L, 64L))
    // arrival order shuffled: the offset must come from doc_id order
    val df = scala.util.Random.shuffle(rows).toDF("doc_id", "n")
      .repartition(5)
    val naive = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, pn, pOff), (id, n)) =>
        (id, n, pOff + pn) }
      .drop(1).map { case (id, _, off) => (id, off) }.toMap
    for (parts <- Seq(1, 3, 8)) {
      val got = PackOps.withGlobalOffset(df, "doc_id", "n", "off", parts)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("off")).toMap
      assert(got == naive, s"parts=$parts diverged: $got vs $naive")
    }
  }

  test("withGlobalOffset plan has no global window") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("doc_id", "n")
    val out = PackOps.withGlobalOffset(df, "doc_id", "n", "off", 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec [") ||
      !plan.matches("(?s).*Window.*partitionSpec=\\[\\].*"),
      s"global window leaked into the offset plan:\n$plan")
    // and the real check: every Window in the plan partitions by __pid
    import org.apache.spark.sql.execution.window.WindowExec
    out.queryExecution.executedPlan.collect {
      case w: WindowExec => assert(w.partitionSpec.nonEmpty,
        "withGlobalOffset must never use an empty partitionSpec window")
    }
  }

  test("block spans + contributions reconstruct every block exactly") {
    import spark.implicits._
    val L = 128L
    val docs = (1L to 200L).map(i => (i, (i * 37 % 300) + 1)).toDF("doc_id", "n_tok")
    val spans = PackOps.blockSpans(
      PackOps.withGlobalOffset(docs, "doc_id", "n_tok", "tok_start", 4),
      "tok_start", "n_tok", L)
    val contrib = PackOps.blockContributions(spans, "tok_start", "n_tok", L)
    val fills = contrib.groupBy(col("block_id"))
      .agg(sum(col("block_tokens")).as("fill"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = (1L to 200L).map(i => (i * 37 % 300) + 1).sum
    val lastBlock = (total - 1) / L
    assert(fills.keys.max == lastBlock)
    assert(fills.keys.min == 0L)
    assert(fills.size == lastBlock + 1, "no gaps in the block range")
    fills.foreach { case (b, f) =>
      if (b < lastBlock) assert(f == L, s"interior block $b fill $f != $L")
      else assert(f == total - lastBlock * L, s"final block fill $f")
    }
    // per-doc conservation: fragments sum back to each doc's n_tok
    val perDoc = contrib.groupBy(col("doc_id"))
      .agg(sum(col("block_tokens")).as("s"), first(col("n_tok")).as("n"))
      .filter(col("s") =!= col("n")).count()
    assert(perDoc == 0, "doc fragments must sum to the doc's tokens")
  }

  test("pipeline_pack_global manifest is contiguous at sf0.001") {
    val m = graft.SparkEntry.queries("pipeline_pack_global")(spark, Sf0001)
      .collect()
    assert(m.length > 0)
    assert(m.head.getAs[Long]("tok_start") == 0L, "stream starts at 0")
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("tok_start") ==
          a.getAs[Long]("tok_start") + a.getAs[Long]("n_tok"),
          s"gap between ${a.getLong(0)} and ${b.getLong(0)}")
      case _ =>
    }
    // histogram twin conserves the token total
    val total = m.map(_.getAs[Long]("n_tok")).sum
    val hist = graft.SparkEntry.queries("pipeline_pack_blocks")(spark, Sf0001)
      .collect()
    assert(hist.map(_.getAs[Long]("n_tokens")).sum == total,
      "blocks histogram must conserve the global token count")
    assert(hist.map(_.getAs[Long]("n_blocks")).sum == (total + 127) / 128,
      "block count must be ceil(total/128)")
  }
}
