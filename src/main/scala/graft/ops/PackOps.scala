package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GLOBAL sequence packing for pretraining dataloaders — the
  * concat-and-chunk step that flattens a tokenized corpus into one
  * virtual token stream and cuts it into fixed-length training blocks
  * (every doc's tokens land at an absolute stream offset; a block is
  * `[k*L, (k+1)*L)`).
  *
  * The existing `pipeline_shard` / `pipeline_pack` queries run their
  * running token sums PER LANGUAGE, and their scaladocs document the
  * trade: at scale the partition key must widen to (lang, bucket),
  * resetting shard boundaries per bucket. This object closes that
  * trade for the cases that need one uninterrupted global order (a
  * dataloader reading block k of a fixed global schedule): an
  * exclusive global prefix sum WITHOUT a global window.
  *
  * Shape at 100 TB ([[withGlobalOffset]]): range-partition the doc
  * manifest on the order key; per-partition running sums are an
  * ordinary partitioned window; the cross-partition carry is ONE row
  * (pid, token total) per partition collected to the driver — KB at
  * 1000 executors, the [[SuffixArrayOps]] boundary-exchange
  * discipline — and rebroadcast as partition base offsets. No
  * single-task global sort anywhere; the widest thing on the wire is
  * the narrow (order key, length) manifest, never text.
  */
object PackOps {

  /** Adds `offCol` = exclusive prefix sum of `lenCol` over the total
    * order of `orderCol` (the first row gets 0, each next row the
    * running total of everything before it), computed scalably:
    *
    *  1. `repartitionByRange(parts, orderCol)` — the only exchange of
    *     the manifest; partition boundaries need not be deterministic
    *     because the prefix sum over a total order is independent of
    *     where the range sampler cuts it;
    *  2. a PARTITIONED window (per physical partition id) for the
    *     intra-partition running sum — never a global window, so no
    *     single task ever holds the corpus (the pid window costs one
    *     narrow hash exchange of the manifest; acceptable because
    *     rows carry only the order key and a long);
    *  3. per-partition totals — one bounded row per partition —
    *     collect to the driver, exclusive-scan in pid order, and
    *     rejoin as a broadcast base-offset table.
    *
    * `lenCol` must be a non-negative integral column; `orderCol` must
    * be a total order (ties would make the offset assignment between
    * tied rows depend on the range cut). */
  def withGlobalOffset(df: DataFrame, orderCol: String, lenCol: String,
      offCol: String, parts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // checkpoint AFTER the window: pins the pid assignment and lets
    // the totals pass and the final join reuse one materialization
    val local = df
      .repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lstart",
        coalesce(sum(col(lenCol).cast("long")).over(w), lit(0L)))
      .localCheckpoint(true)
    // one row per partition — the bounded cross-partition carry
    val totals = local.groupBy(col("__pid"))
      .agg(max(col("__lstart") + col(lenCol).cast("long")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val base = acc; acc += t; (pid, base)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__poff")
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn(offCol, col("__poff") + col("__lstart"))
      .drop("__pid", "__lstart", "__poff")
  }

  /** Per-doc block-span manifest over the global token stream: each
    * doc with `nTokCol` tokens starting at `offCol` spans blocks
    * `off div L .. (off+n-1) div L`. Integer-exact ([[DedupOps.idiv]],
    * never float division) so the DuckDB oracle replays it with `//`. */
  def blockSpans(manifest: DataFrame, offCol: String, nTokCol: String,
      blockLen: Long): DataFrame = {
    val end = col(offCol) + col(nTokCol)
    manifest
      .withColumn("first_block", DedupOps.idiv(col(offCol), lit(blockLen)))
      .withColumn("last_block", DedupOps.idiv(end - 1, lit(blockLen)))
      .withColumn("start_off", col(offCol) % lit(blockLen))
      .withColumn("n_blocks",
        col("last_block") - col("first_block") + 1)
  }

  /** Explodes the span manifest into one row per (doc, block) with
    * the token count the doc contributes to that block (the middle
    * blocks of a long doc are full `blockLen`; the edges clip).
    * Explode factor is n_tok/L per doc — output is a constant factor
    * of the corpus's token count over L, never quadratic. */
  def blockContributions(spans: DataFrame, offCol: String,
      nTokCol: String, blockLen: Long): DataFrame = {
    val end = col(offCol) + col(nTokCol)
    spans
      .select(col("*"),
        explode(sequence(col("first_block"), col("last_block")))
          .as("block_id"))
      .withColumn("block_tokens",
        least((col("block_id") + 1) * lit(blockLen), end)
          - greatest(col("block_id") * lit(blockLen), col(offCol)))
  }
}
