package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates — the Spark analogue of the reference's
  * `Accumulator` extension point (reference
  * src/physical_plan/accumulator/mod.rs:6-9; SURVEY §2.5 maps it to
  * `Aggregator[IN, BUF, OUT]`).
  */
object Aggregators {

  /** One scored candidate: (score, id). */
  type Scored = (Double, Long)

  /** Bounded top-k by score (desc), ties broken by id (asc).
    *
    * The buffer never exceeds k entries, so Spark's partial aggregation
    * gives per-partition top-k with map-side combine: each partition
    * ships at most k rows to the final reducer instead of every
    * candidate row crossing the shuffle — the difference between a
    * window-function top-k (full shuffle of all candidates) and an
    * O(partitions × k) merge at 100 TB.
    */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0)

    private def better(a: Scored, b: Scored): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], item: Scored): Seq[Scored] =
      insert(buf, item)

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: Seq[Scored], item: Scored): Seq[Scored] = {
      if (buf.size >= k && better(buf.last, item)) buf
      else {
        val (before, after) = buf.span(better(_, item))
        (before ++ (item +: after)).take(k)
      }
    }

    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** One MMR candidate: (neighbor_id, query-sim ×10⁴ as a long,
    * vector). */
  type MmrRow = (Long, Long, Seq[Float])

  /** One MMR selection: (score ×10⁵ as a long, neighbor_id). */
  type MmrPick = (Long, Long)

  /** Greedy Maximal-Marginal-Relevance selection over a BOUNDED
    * per-query shortlist (Carbonell & Goldstein 1998): step t picks
    * argmax of λ·sim(q,d) − μ·max over already-selected s of
    * sim(d,s), ties to the lowest id. The buffer holds the shortlist
    * rows (the caller bounds them — 20ish vectors, KB per group), so
    * the greedy loop is per-group driver-free JVM work.
    *
    * Determinism contract — the greedy loop runs ENTIRELY in integer
    * space: similarities enter as round(sim·10⁴) longs and the score
    * is `lamE1·simq_e4 − muE1·m_e4` (λ = lamE1/10, µ = muE1/10, so
    * the score unit is 10⁻⁵). Rounding a double at 4 dp is NOT
    * cross-engine stable (Spark's round is decimal-string HALF_UP,
    * DuckDB's rounds the binary value; 0.7·0.3985 = 0.27895 sits
    * exactly on the decimal boundary while its binary value sits
    * below — the first cut of this operator hit that and diverged),
    * but rounding sim·10⁴ to an INTEGER is: at scale 0 the .5
    * boundary is binary-representable, so the string and binary
    * views agree. The DuckDB oracle replays the loop as a lockstep
    * recursion over the same longs. */
  class MmrSelect(k: Int, lamE1: Long, muE1: Long)
      extends Aggregator[MmrRow, Seq[MmrRow], Seq[MmrPick]] {
    require(k > 0)

    /** round(x) at scale 0, Spark-round-compatible (HALF_UP on the
      * decimal view — equal to binary rounding at integer scale). */
    private def toLongE0(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

    /** Same formula and accumulation order as the
      * [[graft.functions.CosineSimilarity]] kernel and DuckDB's
      * list_cosine_similarity: sequential double accumulation in
      * index order. */
    private def cosE4(a: Seq[Float], b: Seq[Float]): Long = {
      require(a.length == b.length,
        s"vector dimension mismatch: ${a.length} vs ${b.length}")
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0L
      else toLongE0(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0)
    }

    override def zero: Seq[MmrRow] = Vector.empty
    override def reduce(buf: Seq[MmrRow], item: MmrRow): Seq[MmrRow] =
      buf :+ item
    override def merge(a: Seq[MmrRow], b: Seq[MmrRow]): Seq[MmrRow] =
      a ++ b

    override def finish(buf: Seq[MmrRow]): Seq[MmrPick] = {
      // per-candidate running max-sim-to-selected (e4 longs; starts
      // at 0 and only rises — the redundancy penalty is clamped at
      // non-negative, exactly the oracle frontier's greatest(m, ·)
      // from an initial 0)
      val cands = scala.collection.mutable.ArrayBuffer(
        buf.map(r => (r._1, r._2, r._3, 0L)): _*)
      val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      while (out.size < k && cands.nonEmpty) {
        var bi = 0
        var bs = Long.MinValue
        var bid = Long.MaxValue
        var i = 0
        while (i < cands.length) {
          val (id, simqE4, _, m) = cands(i)
          val sc = lamE1 * simqE4 - muE1 * m
          if (sc > bs || (sc == bs && id < bid)) { bs = sc; bi = i; bid = id }
          i += 1
        }
        val winner = cands.remove(bi)
        out += ((bs, winner._1))
        var j = 0
        while (j < cands.length) {
          val c = cands(j)
          val s = cosE4(c._3, winner._3)
          if (s > c._4) cands(j) = (c._1, c._2, c._3, s)
          j += 1
        }
      }
      out.toSeq
    }

    override def bufferEncoder: Encoder[Seq[MmrRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MmrRow]]()
    override def outputEncoder: Encoder[Seq[MmrPick]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MmrPick]]()
  }

}
