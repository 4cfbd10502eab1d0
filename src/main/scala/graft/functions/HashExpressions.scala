package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit string hashing shared by the sketch expressions.
  * FNV-1a over UTF-8 bytes with a seed-mixed initial state plus an
  * avalanche finalizer (splitmix64) — self-contained, stable across
  * JVMs/partitions, cheap. Not cryptographic; used only for sketching.
  */
object Hash64 {
  final val FnvPrime = 0x100000001b3L
  final val FnvOffset = 0xcbf29ce484222325L

  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = FnvOffset ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    mix(h)
  }

  /** splitmix64 finalizer. */
  def mix(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** MinHash signature of an array<string> shingle set: for each of k
  * independent hash functions, the minimum hash over the set.
  * One pass over the shingles computes all k lanes (k multiplications
  * per element via the seed-mix), instead of k separate passes that
  * composing built-in `transform`/`aggregate` calls would cost.
  *
  * Output: array<long> of length k. Deterministic: no RNG, lane i's
  * hash function is fixed by the lane index.
  *
  * Beyond-reference extension (the reference has no dedup surface;
  * SURVEY §2.5). Standard MinHash-LSH construction per Broder '97.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val bytes = s.getBytes
        // base hash once per element; per-lane remix is one multiply+xor
        val base = Hash64.hashBytes(bytes, 0L)
        var lane = 0
        while (lane < k) {
          val h = Hash64.mix(base ^ (lane * 0xff51afd7ed558ccdL))
          if (h < sig(lane)) sig(lane) = h
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** 64-bit SimHash of an array<string> token sequence (Charikar '02):
  * each token votes ±1 on each of 64 bit positions according to its
  * hash; the sign of each accumulated position is the output bit.
  * Near-duplicate texts differ in few bits (small Hamming distance).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = Hash64.hashBytes(s.getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Winnowing-style rolling-hash fingerprint of a string (Schleimer et
  * al. '03, simplified): polynomial rolling hash over every k-char
  * window, keeping the minimum window hash per document. Collisions of
  * the minimum select the same "rarest" substring for near-identical
  * texts, making this a cheap single-long blocking key.
  */
case class RollingHashMin(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n == 0) return 0L
    if (n <= k) return Hash64.mix(Hash64.hashBytes(bytes, 1L))
    val B = 257L
    // B^(k-1) for the rolling subtraction
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var minMixed = Hash64.mix(h)
    while (i < n) {
      h = (h - (bytes(i - k) & 0xffL) * bk) * B + (bytes(i) & 0xffL)
      val m = Hash64.mix(h)
      if (m < minMixed) minMixed = m
      i += 1
    }
    minMixed
  }

  override protected def withNewChildInternal(c: Expression): RollingHashMin =
    copy(child = c)
}

object HashFunctions {
  def minhashSignature(tokens: Column, k: Int): Column =
    column(MinHashSignature(expression(tokens), k))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def rollingHashMin(text: Column, k: Int = 8): Column =
    column(RollingHashMin(expression(text), k))
}
