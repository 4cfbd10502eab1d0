package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch buffer (Cormode & Muthukrishnan '05): `depth`
  * hash rows × `width` counters, row-major. Point-frequency estimate
  * = min over rows — NEVER an underestimate (every cell a key maps to
  * receives all of its increments), overestimate bounded by hash
  * collisions: err ≤ e·N/width with probability 1 − e^−depth.
  *
  * Cells are pure sums, so merge is cell-wise addition — commutative
  * AND associative, which makes the sketch bytes bit-identical under
  * any partitioning (unlike Misra-Gries, whose summary is partition-
  * order-sensitive and needs the exact-recount pass). CMS gives point
  * estimates for ANY key, MG gives the guaranteed candidate set —
  * they are complements, and both move O(sketch) per partition
  * instead of shuffling the token stream. */
final class CMSBuffer(val depth: Int, val width: Int) {
  val cells: Array[Long] = new Array[Long](depth * width)
  var n: Long = 0L

  private def cell(bytes: Array[Byte], row: Int): Int = {
    val h = Hash64.hashBytes(bytes, row.toLong)
    (((h % width) + width) % width).toInt + row * width
  }

  def add(bytes: Array[Byte]): Unit = {
    var r = 0
    while (r < depth) { cells(cell(bytes, r)) += 1L; r += 1 }
    n += 1L
  }

  def estimate(bytes: Array[Byte]): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = cells(cell(bytes, r))
      if (v < est) est = v
      r += 1
    }
    est
  }

  def estimate(key: String): Long =
    estimate(key.getBytes(StandardCharsets.UTF_8))

  def mergeIn(o: CMSBuffer): Unit = {
    require(o.depth == depth && o.width == width, "shape mismatch")
    var i = 0
    while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
    n += o.n
  }
}

object CMSBuffer {
  /** Wire format: n, then the depth×width cells (shape travels in the
    * aggregate's parameters, not the bytes). */
  def toBytes(buf: CMSBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.cells.length)
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.cells.length) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], depth: Int, width: Int): CMSBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new CMSBuffer(depth, width)
    out.n = bb.getLong
    var i = 0
    while (i < out.cells.length) { out.cells(i) = bb.getLong; i += 1 }
    out
  }
}

/** Count-Min sketch of a string column as one binary value — the
  * mergeable frequency-statistics artifact (probe any key later, ship
  * between jobs, add across corpus shards; the streaming state-store
  * analogue of the MG summary). Same `TypedImperativeAggregate`
  * extension point as [[MisraGriesKeys]] — the Spark analogue of the
  * reference's `Accumulator` trait (reference
  * src/physical_plan/accumulator/mod.rs:6-9; SURVEY §2.5). */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSBuffer]
  with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def prettyName: String = "count_min_sketch_graft"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CMSBuffer =
    new CMSBuffer(depth, width)

  override def update(buf: CMSBuffer, input: InternalRow): CMSBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(b1: CMSBuffer, b2: CMSBuffer): CMSBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: CMSBuffer): Any = CMSBuffer.toBytes(buf)

  override def serialize(buf: CMSBuffer): Array[Byte] =
    CMSBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): CMSBuffer =
    CMSBuffer.fromBytes(bytes, depth, width)

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CountMinSketchAgg =
    copy(child = c)
}

/** Static probe kernel for codegen: estimate a key directly against
  * the WIRE BYTES of a sketch — O(depth) 8-byte reads at computed
  * offsets, no 32 KB buffer deserialization per probed row. */
object CmsKernels {
  def estimate(bytes: Array[Byte], key: UTF8String, depth: Int,
      width: Int): Long = {
    val kb = key.getBytes
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val h = Hash64.hashBytes(kb, r.toLong)
      val idx = (((h % width) + width) % width).toInt + r * width
      val off = 8 + 8 * idx // first 8 bytes carry n (CMSBuffer.toBytes)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
      if (v < est) est = v
      r += 1
    }
    est
  }
}

/** Point-frequency estimate of a key against a serialized CMS column
  * (codegen'd; the distributed complement of [[CMSBuffer.estimate]]):
  * lets the 32 KB sketch ride a broadcast join and be probed map-side
  * — no driver-side `.head` + loop, the no-driver-compute discipline
  * the rest of the codebase keeps. */
case class CmsPointEstimate(left: Expression, right: Expression,
    depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_point_estimate"

  override def nullSafeEval(sk: Any, key: Any): Any =
    CmsKernels.estimate(sk.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, key) =>
      s"${ev.value} = graft.functions.CmsKernels.estimate(" +
        s"$sk, $key, $depth, $width);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsPointEstimate = copy(left = l, right = r)
}

object CountMin {
  /** Column API: serialized CMS bytes over a string column. */
  def cmsSketch(c: Column, depth: Int = 4, width: Int = 1024): Column =
    column(CountMinSketchAgg(expression(c), depth, width)
      .toAggregateExpression())

  /** Column API: probe a serialized sketch column for a key column. */
  def cmsEstimate(sketch: Column, key: Column, depth: Int = 4,
      width: Int = 1024): Column =
    column(CmsPointEstimate(expression(sketch), expression(key),
      depth, width))
}
