package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary buffer: at most `k` keys, counts
  * stored ABSOLUTE with a shared `base` offset so the classic
  * "decrement every counter" step is O(1) (`base += 1`); an entry is
  * live while `stored > base`. Dead entries are purged lazily, and
  * only when `base` has actually reached the smallest stored count
  * (`minStored` is maintained across purges), so a miss on a full
  * summary is O(1) amortized rather than the textbook O(k) scan. */
final class MGBuffer(val k: Int) {
  val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  var base: Long = 0L
  private var minStored: Long = Long.MaxValue

  private def purge(): Unit = {
    counts.filterInPlace { case (_, c) => c > base }
    resetPurgeFloor()
  }

  /** Recompute the lazy purge floor from `counts` — REQUIRED after any
    * code path that writes `counts` directly (deserialization, merge):
    * a floor left at Long.MaxValue on a full summary makes
    * `base >= minStored` unreachable, so dead entries never purge and
    * no new key can ever be admitted. */
  private[functions] def resetPurgeFloor(): Unit =
    minStored = if (counts.isEmpty) Long.MaxValue else counts.values.min

  /** Record one occurrence of `key` (unit weight only: the weighted
    * miss path would have to bound the decrement by the smallest live
    * margin to preserve the N/(k+1) guarantee, and no caller needs
    * weights — so the API does not offer them). */
  def add(key: String): Unit = {
    counts.get(key) match {
      case Some(c) =>
        counts(key) = c + 1L
        // minStored may now underestimate (the min entry moved up) —
        // safe: it only triggers an early purge, which recomputes it
      case None =>
        if (counts.size >= k && base >= minStored) purge()
        if (counts.size < k) {
          val stored = base + 1L
          counts(key) = stored
          if (stored < minStored) minStored = stored
        } else {
          // MG decrement-all, amortized: the new key is not inserted
          // and every live counter conceptually drops by one
          base += 1L
        }
    }
  }

  /** Live (key, effective-count) pairs. */
  def effective: Iterator[(String, Long)] =
    counts.iterator.collect { case (s, c) if c > base => (s, c - base) }
}

object MGBuffer {
  /** Base-normalized (key, effective-count) wire format — shared by the
    * batch aggregate's shuffle serialization and the streaming
    * operator's state store. */
  def toBytes(buf: MGBuffer): Array[Byte] = {
    val entries = buf.effective.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }.toArray
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte], k: Int): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new MGBuffer(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      out.counts(new String(b, StandardCharsets.UTF_8)) = c
      i += 1
    }
    // restore the lazy purge floor — see resetPurgeFloor: a heavy
    // hitter first appearing after a state-store round-trip
    // (streaming micro-batch 2+) would otherwise never be admitted,
    // breaking the MG containment guarantee across batches
    out.resetPurgeFloor()
    out
  }
}

/** Misra-Gries heavy-hitters candidate keys over a string column — the
  * fixed-size mergeable-summary aggregate (Misra & Gries '82; merge
  * rule per Agarwal et al., PODS '12: add counts, then subtract the
  * (k+1)-th largest and drop non-positive). Guarantee: every key with
  * true frequency > N/(k+1) is present in the output, so a follow-up
  * EXACT recount of the <= k candidates at any threshold phi >= 1/(k+1)
  * returns exactly the true heavy-hitter set — deterministic even
  * though the sketch itself is partition-order-sensitive.
  *
  * This is the 100-TB shape for frequency statistics: partial
  * aggregation moves one <= k-entry summary per partition instead of
  * shuffling every token, and the verify pass is a broadcast semi-join
  * on <= k keys. The Catalyst `TypedImperativeAggregate` extension
  * point is the Spark analogue of the reference's `Accumulator` trait
  * (reference src/physical_plan/accumulator/mod.rs:6-9; SURVEY §2.5).
  *
  * Output: live candidate keys, sorted (array<string>, <= k elements).
  */
case class MisraGriesKeys(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "misra_gries_keys"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    // copy out of the (possibly reused) UnsafeRow-backed UTF8String
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: MGBuffer, b2: MGBuffer): MGBuffer = {
    val sums = mutable.HashMap.empty[String, Long]
    b1.effective.foreach { case (s, c) => sums(s) = c }
    b2.effective.foreach { case (s, c) =>
      sums(s) = sums.getOrElse(s, 0L) + c
    }
    val out = new MGBuffer(k)
    if (sums.size <= k) {
      sums.foreach { case (s, c) => out.counts(s) = c }
    } else {
      // subtract the (k+1)-th largest combined count, keep the > 0 rest
      val d = sums.values.toArray.sortBy(-_).apply(k)
      sums.foreach { case (s, c) => if (c > d) out.counts(s) = c - d }
    }
    // counts were written directly — restore the purge floor so a
    // merged buffer stays safe to add() into (today merged buffers
    // only feed eval/serialize, but the invariant must not depend on
    // that; this is the same hazard fromBytes guards against)
    out.resetPurgeFloor()
    out
  }

  override def eval(buf: MGBuffer): Any = {
    val keys = buf.effective.map(_._1).toArray.sorted
    new GenericArrayData(keys.map(s => UTF8String.fromString(s): Any))
  }

  override def serialize(buf: MGBuffer): Array[Byte] =
    MGBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): MGBuffer =
    MGBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesKeys =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesKeys =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesKeys =
    copy(child = c)
}

object MisraGries {
  /** Column API: sorted candidate heavy-hitter keys (at most k). */
  def mgKeys(c: Column, k: Int): Column =
    column(MisraGriesKeys(expression(c), k).toAggregateExpression())
}
