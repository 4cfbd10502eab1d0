package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.HashFunctions

/** Distributed suffix-array construction by prefix doubling (Manber &
  * Myers '90 rank doubling — public literature, independent
  * implementation; the Spark-native answer to the §8.5 suffix-array
  * gap left after `dedup_span_excise` closed the fixed-L excision
  * path).
  *
  * One row per character position of every document; suffixes never
  * cross documents (each suffix is `text[off..)` of its own doc, so no
  * sentinel concatenation and no phantom cross-doc repeats). Round k
  * re-keys every position by (rank, rank-at-off+2^k) — a co-keyed
  * self-join — and re-ranks. After ⌈log₂ maxLen⌉ rounds ranks are
  * stable; identical suffixes of DIFFERENT documents share a rank by
  * construction (they are equal strings), which is exactly what the
  * repeated-substring consumers want.
  *
  * Scale shape: the only primitives are co-keyed equi-joins on
  * (doc_id, off) and a distributed DENSE RANK implemented the
  * scale-correct way — range-repartition + in-partition sort, then
  * per-partition (firstKey, lastKey, #distinct) summaries (ONE small
  * collect of nPartitions rows) fix global offsets, and a second
  * map-partitions pass assigns ranks. No global single-partition
  * window anywhere in the build; the driver holds per-partition
  * summaries only. Rounds: log₂ of the longest suffix the caller
  * cares about (`maxLen` caps comparison depth — corpus-wide repeats
  * longer than maxLen still rank equal, exactly like a truncated
  * sort key).
  */
object SuffixArrayOps {

  /** (doc_id, off, sa_rank): dense lexicographic rank of
    * `text[off..min(off+maxLen, len))` over all suffixes of all docs. */
  def suffixArray(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int = 256, numParts: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (numParts > 0) numParts
      else math.max(1, spark.conf
        .get("spark.sql.shuffle.partitions", "32").toInt)
    val pos = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("t"))
      .select(col("doc_id"), posexplode(split(col("t"), "")))
      .select(col("doc_id"), col("pos").cast("long").as("off"),
        ascii(col("col")).cast("long").as("c0"))
      .filter(col("c0") > 0) // split("") yields no trailing empty in Spark 3+
    // round 0: rank by first character
    var ranked = denseRank(pos.select(col("doc_id"), col("off"),
      col("c0").as("k1"), lit(-1L).as("k2")), parts).localCheckpoint()
    val n = ranked.count()
    var k = 1L
    // early exit at the refinement FIXED POINT: doubling only ever
    // splits rank classes, so an unchanged distinct-rank count means
    // the partition is stable (r₂ₖ = f(rₖ) = rₖ ⇒ all later rounds are
    // identity) — this fires both when all suffixes separate AND when
    // persistent cross-doc ties (true repeats) stop refining
    var distinctRanks =
      ranked.agg(max(col("rank"))).head.getLong(0) + 1
    var prevDistinct = -1L
    while (k < maxLen && distinctRanks < n && distinctRanks != prevDistinct) {
      prevDistinct = distinctRanks
      val shifted = ranked.select(col("doc_id").as("d2"),
        (col("off") - k).as("o2"), col("rank").as("rk2"))
      val keyed = ranked.join(shifted,
        col("doc_id") === col("d2") && col("off") === col("o2"),
        "left")
        .select(col("doc_id"), col("off"), col("rank").as("k1"),
          coalesce(col("rk2"), lit(-1L)).as("k2"))
      ranked = denseRank(keyed, parts).localCheckpoint()
      distinctRanks = ranked.agg(max(col("rank"))).head.getLong(0) + 1
      k *= 2
    }
    ranked.select(col("doc_id"), col("off"), col("rank").as("sa_rank"))
  }

  /** Distributed dense rank of rows keyed by (k1, k2): range-partition
    * by the key, sort within partitions, summarize each partition's
    * (first key, last key, distinct-key count) — nPartitions rows to
    * the driver — then assign global dense ranks in one more pass.
    * Returns (doc_id, off, rank). */
  private[ops] def denseRank(keyed: DataFrame, parts: Int): DataFrame = {
    val spark = keyed.sparkSession
    val sorted = keyed
      .repartitionByRange(parts, col("k1"), col("k2"))
      .sortWithinPartitions(col("k1"), col("k2"))
      .select(col("doc_id"), col("off"), col("k1"), col("k2"))
      .localCheckpoint()
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var first: (Long, Long) = null
      var last: (Long, Long) = null
      var distinct = 0L
      it.foreach { r =>
        val key = (r.getLong(2), r.getLong(3))
        if (first == null) first = key
        if (last == null || key != last) distinct += 1
        last = key
      }
      if (first == null) Iterator.empty
      else Iterator((pid, first, last, distinct))
    }.collect().sortBy(_._1)
    // global offset per partition; partitions whose first key equals
    // the previous partition's last key share that key's rank
    val offsets = new Array[Long](summaries.length)
    var acc = 0L
    summaries.zipWithIndex.foreach { case ((_, first, last, distinct), i) =>
      val mergesLeft = i > 0 && summaries(i - 1)._3 == first
      offsets(i) = if (mergesLeft) acc - 1 else acc
      acc = offsets(i) + distinct
    }
    val byPid = summaries.map(_._1).zip(offsets).toMap
    val bcOffsets = spark.sparkContext.broadcast(byPid)
    val outRows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val base = bcOffsets.value.getOrElse(pid, 0L)
      var prev: (Long, Long) = null
      var rank = base - 1
      it.map { r =>
        val key = (r.getLong(2), r.getLong(3))
        if (prev == null || key != prev) rank += 1
        prev = key
        Row(r.getLong(0), r.getLong(1), rank)
      }
    }
    spark.createDataFrame(outRows, StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("off", LongType, nullable = false),
      StructField("rank", LongType, nullable = false))))
  }

  /** Longest repeated substring over the corpus slice: adjacent
    * suffixes in SA order compared by the codegen'd CommonPrefixLen —
    * the classic SA+LCP application. Comparison depth caps at
    * `maxLen` (same cap as the array build). Output: one row
    * (lrs_len, lrs_md5, n_positions) where n_positions counts every
    * corpus position whose suffix starts with the winning repeat.
    * The adjacent pairing here uses a global-order window — fine for
    * the bounded declared slice; at full scale pair via
    * range-partition + boundary-row exchange (same summaries trick as
    * denseRank). */
  def longestRepeat(docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int = 256, numParts: Int = 0): DataFrame = {
    val sa = suffixArray(docs, idCol, textCol, maxLen, numParts)
    val texts = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("t"))
    val suff = sa.join(texts, "doc_id")
      .select(col("sa_rank"), col("doc_id"), col("off"),
        expr(s"substring(t, cast(off + 1 as int), $maxLen)").as("s"))
    val w = Window.orderBy(col("sa_rank"), col("doc_id"), col("off"))
    val lcp = suff
      .withColumn("s_next", lead(col("s"), 1).over(w))
      .filter(col("s_next").isNotNull)
      .withColumn("lcp",
        HashFunctions.commonPrefixLen(col("s"), col("s_next")))
    val bestRow = lcp.agg(max(col("lcp")).as("lrs_len")).head
    val best = if (bestRow.isNullAt(0)) 0 else bestRow.getInt(0)
    if (best <= 0) {
      val spark = docs.sparkSession
      import spark.implicits._
      return Seq((0L, "", 0L)).toDF("lrs_len", "lrs_md5", "n_positions")
    }
    val winner = lcp.filter(col("lcp") === best)
      .select(expr(s"substring(s, 1, $best)").as("r"))
      .orderBy(col("r")).limit(1) // deterministic among equal-length
    val positions = suff.join(broadcast(winner),
      expr(s"substring(s, 1, $best)") === col("r"))
    positions
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_positions"))
      .select(lit(best.toLong).as("lrs_len"), md5(col("r")).as("lrs_md5"),
        col("n_positions"))
  }
}
