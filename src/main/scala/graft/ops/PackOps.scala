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
      offCol: String, parts: Int = 32): DataFrame =
    withGlobalOffsetAndTotal(df, orderCol, lenCol, offCol, parts)._1

  /** [[withGlobalOffset]] that ALSO returns the grand total of
    * `lenCol` — the driver just finished summing the per-partition
    * carries, so callers that need the stream's new end offset (the
    * ingest loop's pack-manifest total) read it here instead of
    * running one more aggregation job over the result (r15). */
  def withGlobalOffsetAndTotal(df: DataFrame, orderCol: String,
      lenCol: String, offCol: String,
      parts: Int = 32): (DataFrame, Long) = {
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
    (local.join(broadcast(offDf), Seq("__pid"))
      .withColumn(offCol, col("__poff") + col("__lstart"))
      .drop("__pid", "__lstart", "__poff"), acc)
  }

  /** Range-partition count for an offset scan over `nRows` manifest
    * rows (~16 B each): ~1M rows per partition, at least 1, capped so
    * a pathological count cannot flood the scheduler. parts = 1 also
    * skips RangePartitioner's sampling job entirely — the common case
    * for batch-sized manifests. */
  def partsFor(nRows: Long): Int =
    math.max(1L, math.min(2000L, (nRows + 999999) / 1000000)).toInt

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

  /** Deterministic dataloader epoch shuffle: for each epoch `e` and
    * each id in `idCol`, the id's position in epoch `e`'s read order
    * is its rank under the PORTABLE hash `md5(e:id)` — an unbiased
    * uniform permutation per epoch (md5 is a fixed public function
    * and both engines spell its hex identically, the
    * [[DedupOps.portableMinhashPairs]] lane discipline), with the id
    * as a lexicographic tiebreak so the order is total even under a
    * hash collision.
    *
    * Scale shape: the rank is a global order statistic, but the ONLY
    * thing ordered is the (epoch, hash, id) manifest — the permuted
    * corpus never moves; a trainer reads block `pos` of epoch `e` by
    * manifest lookup. The rank itself is [[withGlobalOffset]] with a
    * unit length column (position = count of rows before me), so the
    * plan is range-exchange + per-partition windows + one bounded
    * carry row per partition — no global window, no single-task sort.
    * All epochs ride ONE offset pass: the order key prefixes the
    * zero-padded epoch, and because every epoch permutes the same id
    * set, `pos = global_pos - e * n` needs only the row count `n`
    * (epochs must all cover the same ids — callers pass one id
    * universe and the epoch explode is internal). */
  def epochOrder(ids: DataFrame, idCol: String, epochs: Int, n: Long,
      parts: Int = 32): DataFrame = {
    val withEpoch = ids
      .select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
    // zero-padded epoch prefix + 32-hex md5 + zero-padded id: binary
    // (ASCII) string order == (epoch, hash, id) order on both engines
    val key = concat(
      lpad(col("epoch").cast("string"), 4, "0"),
      md5(concat(col("epoch").cast("string"), lit(":"),
        col(idCol).cast("string")).cast("binary")),
      lpad(col(idCol).cast("string"), 20, "0"))
    val ranked = withGlobalOffset(
      withEpoch.withColumn("__ord", key).withColumn("__one", lit(1L)),
      "__ord", "__one", "pos_global", parts)
    ranked
      .withColumn("pos", col("pos_global") - col("epoch") * lit(n))
      .drop("__ord", "__one", "pos_global")
  }

  /** Document-boundary-respecting packing (the "sample packing" /
    * no-cross-document-attention dataloader layout): walk docs in
    * `idCol` order and next-fit them into `blockLen`-token blocks —
    * a doc whose tokens don't fit the current block's remainder
    * closes the block (the remainder is padding) and starts fresh; a
    * doc longer than a whole block spans its own consecutive blocks
    * and shares only its last, partial one. Contrast with
    * [[blockSpans]]' concat-and-chunk: zero padding there, but every
    * block boundary cuts a document; here documents stay whole at the
    * cost of measured padding.
    *
    * Next-fit is inherently sequential, so the distribution unit is a
    * FIXED-SIZE id bucket (`bucket = id div bucketSize`): each bucket
    * packs independently starting from a fresh block (deterministic —
    * bucket boundaries are pure arithmetic on the id, never a sampled
    * range cut), and bucket block ranges concatenate via an exclusive
    * prefix sum of per-bucket block counts — computed by
    * [[withGlobalOffset]], NOT a driver collect, because at corpus
    * scale there are millions of buckets (the driver sees one bounded
    * row per PARTITION of the bucket-totals frame, never per bucket).
    * The per-bucket walk is one `aggregate` HOF over the bucket's
    * sorted (id, len) array — ≤ `bucketSize` elements, memory bounded
    * by construction; the HOF is CodegenFallback but runs once per
    * bucket over a KB-sized array, not per token. Boundary waste is
    * at most one partial block per bucket — at `bucketSize` docs per
    * bucket the overhead fraction is ~1/(docs-per-block × bucketSize),
    * negligible, and exactly measurable from the output.
    *
    * Requires `lenCol >= 1` for every row (a zero-length item would
    * make "fits in zero remaining space" ambiguous; token counts with
    * an end-of-doc separator are always >= 1).
    *
    * Output: one row per doc — bucket, id, len, `first_block` /
    * `last_block` (global block ids), `start_off` (tokens before the
    * doc in its first block). */
  def nextFitPack(manifest: DataFrame, idCol: String, lenCol: String,
      blockLen: Long, bucketSize: Long, parts: Int = 32): DataFrame = {
    val bucketed = manifest
      .select(DedupOps.idiv(col(idCol), lit(bucketSize)).as("bucket"),
        col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
    val grouped = bucketed.groupBy(col("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("len"))))
        .as("ds"))
    // the sequential walk: accumulator carries (current block index,
    // its fill, the per-doc placements so far); after any placement
    // the fill is in (0, blockLen], so "blocks used" = last index + 1
    val walk = expr(
      s"""aggregate(ds,
         |  named_struct('blk', 0L, 'fill', 0L,
         |    'out', cast(array() as array<struct<
         |      id: bigint, len: bigint, first_rel: bigint,
         |      last_rel: bigint, start_off: bigint>>)),
         |  (acc, d) -> named_struct(
         |    'blk', acc.blk
         |      + if(d.len <= $blockLen - acc.fill, 0L,
         |           if(acc.fill = 0L, 0L, 1L))
         |      + if(d.len <= $blockLen - acc.fill, 0L,
         |           (d.len - 1L) div $blockLen),
         |    'fill', if(d.len <= $blockLen - acc.fill,
         |      acc.fill + d.len,
         |      d.len - ((d.len - 1L) div $blockLen) * $blockLen),
         |    'out', acc.out || array(named_struct(
         |      'id', d.id, 'len', d.len,
         |      'first_rel', acc.blk
         |        + if(d.len <= $blockLen - acc.fill, 0L,
         |             if(acc.fill = 0L, 0L, 1L)),
         |      'last_rel', acc.blk
         |        + if(d.len <= $blockLen - acc.fill, 0L,
         |             if(acc.fill = 0L, 0L, 1L))
         |        + if(d.len <= $blockLen - acc.fill, 0L,
         |             (d.len - 1L) div $blockLen),
         |      'start_off', if(d.len <= $blockLen - acc.fill,
         |        acc.fill, 0L)))),
         |  acc -> acc.out)""".stripMargin)
    val placed = grouped
      .select(col("bucket"), explode(walk).as("p"))
      .select(col("bucket"), col("p.id").as("id"), col("p.len").as("len"),
        col("p.first_rel"), col("p.last_rel"), col("p.start_off"))
    // per-bucket block counts -> exclusive scan -> global block base;
    // withGlobalOffset keeps this scalable past millions of buckets
    val totals = placed.groupBy(col("bucket"))
      .agg((max(col("last_rel")) + 1L).as("bu"))
    val bases = withGlobalOffset(totals, "bucket", "bu", "base", parts)
      .select(col("bucket"), col("base"))
    placed.join(bases, Seq("bucket"))
      .select(col("bucket"), col("id"), col("len"),
        (col("first_rel") + col("base")).as("first_block"),
        (col("last_rel") + col("base")).as("last_block"),
        col("start_off"))
  }
}
