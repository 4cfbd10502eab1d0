package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_set` over a long column with a HARD buffer cap: once a
  * group has gathered `limit` distinct values, further values are
  * dropped. The aggregation buffer is bounded by construction — unlike
  * built-in `collect_set`, one degenerate group (an n-gram present in
  * every document, an all-identical LSH band) cannot accumulate an
  * unbounded array in memory.
  *
  * Used by the dedup candidate generators with `limit = maxBucket + 1`:
  * a result of exactly `limit` elements means "bucket overflowed — drop
  * it", so the previous two-pass plan (count-prefilter aggregation +
  * join + collect aggregation) collapses into ONE aggregation over the
  * inverted index — one shuffle instead of two at 100 TB.
  *
  * This is the Catalyst `TypedImperativeAggregate` extension point —
  * the Spark analogue of the reference's `Accumulator` trait
  * (reference src/physical_plan/accumulator/mod.rs:6-9; SURVEY §2.5) —
  * with partial aggregation (map-side combine) handled by Spark.
  * Output is the sorted distinct values (deterministic).
  */
case class BoundedCollectSet(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Long]]
  with UnaryLike[Expression] {

  require(limit > 0, "limit must be positive")

  override def prettyName: String = "bounded_collect_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashSet[Long] =
    mutable.HashSet.empty[Long]

  override def update(buf: mutable.HashSet[Long],
      input: InternalRow): mutable.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size < limit) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(b1: mutable.HashSet[Long],
      b2: mutable.HashSet[Long]): mutable.HashSet[Long] = {
    val it = b2.iterator
    while (it.hasNext && b1.size < limit) b1 += it.next()
    b1
  }

  override def eval(buf: mutable.HashSet[Long]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: mutable.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BoundedCollectSet =
    copy(child = c)
}

object BoundedCollectSet {
  /** Column API: sorted distinct values, at most `limit` per group. */
  def boundedCollectSet(c: Column, limit: Int): Column =
    column(BoundedCollectSet(expression(c), limit).toAggregateExpression())
}
