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

}
