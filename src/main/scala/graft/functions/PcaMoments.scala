package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Second-moment accumulator for distributed PCA over an
  * `array<float>` embedding column: count, per-dimension sums, and the
  * upper triangle of the raw outer-product matrix Σ x·xᵀ.
  *
  * Every term is rounded to a fixed point (`Scale` = 1e9) and
  * accumulated in LONGS, so merging is integer addition — commutative,
  * associative, and therefore BIT-IDENTICAL under any partitioning
  * (the same discipline as GraphOps.pagerank; double accumulation
  * would make the eigenbasis depend on shuffle order). Precision cost
  * is 1e-9 per term, far below the covariance noise floor of any real
  * corpus. Capacity: unit-scale embeddings give |term| ≤ ~1, so the
  * long accumulator holds ~9.2e9 rows per dimension pair before
  * overflow; past that scale, aggregate per shard and merge the
  * decoded moments (they remain exact integers).
  *
  * One buffer is 8·(2 + d + d(d+1)/2) bytes (d=64 → ~17 KB): only
  * O(d²) bytes per partition move, never the vectors.
  */
final class MomentsBuffer(val d: Int) {
  var n: Long = 0L
  val sums: Array[Long] = new Array[Long](d)
  val prods: Array[Long] = new Array[Long](d * (d + 1) / 2)

  def add(v: ArrayData): Unit = {
    require(v.numElements() == d,
      s"embedding dimension ${v.numElements()} != $d")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = v.getFloat(i).toDouble; i += 1 }
    var t = 0
    i = 0
    while (i < d) {
      sums(i) += math.rint(x(i) * MomentsBuffer.Scale).toLong
      var j = i
      while (j < d) {
        prods(t) += math.rint(x(i) * x(j) * MomentsBuffer.Scale).toLong
        j += 1; t += 1
      }
      i += 1
    }
    n += 1L
  }

  def mergeIn(o: MomentsBuffer): Unit = {
    require(o.d == d, "dimension mismatch")
    n += o.n
    var i = 0
    while (i < d) { sums(i) += o.sums(i); i += 1 }
    i = 0
    while (i < prods.length) { prods(i) += o.prods(i); i += 1 }
  }
}

object MomentsBuffer {
  val Scale: Double = 1e9

  def toBytes(b: MomentsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (2 + b.d + b.prods.length))
    bb.putLong(b.d.toLong).putLong(b.n)
    b.sums.foreach(bb.putLong)
    b.prods.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): MomentsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getLong.toInt
    val b = new MomentsBuffer(d)
    b.n = bb.getLong
    var i = 0
    while (i < d) { b.sums(i) = bb.getLong; i += 1 }
    i = 0
    while (i < b.prods.length) { b.prods(i) = bb.getLong; i += 1 }
    b
  }
}

case class PcaMomentsAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MomentsBuffer]
  with UnaryLike[Expression] {

  require(d > 0, "dimension must be positive")

  override def prettyName: String = "pca_moments"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MomentsBuffer =
    new MomentsBuffer(d)

  override def update(buf: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b1: MomentsBuffer, b2: MomentsBuffer): MomentsBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: MomentsBuffer): Any = MomentsBuffer.toBytes(buf)

  override def serialize(buf: MomentsBuffer): Array[Byte] =
    MomentsBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): MomentsBuffer =
    MomentsBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): PcaMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PcaMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): PcaMomentsAgg =
    copy(child = c)
}

object PcaMoments {
  /** Column API: serialized moments bytes over an array<float> column. */
  def moments(c: Column, d: Int): Column =
    column(PcaMomentsAgg(expression(c), d).toAggregateExpression())
}
