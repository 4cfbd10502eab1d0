package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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

/** The sketch kernels, as plain static-forwardable methods so BOTH
  * execution paths share one implementation: the interpreted
  * `nullSafeEval` calls them directly, and each expression's
  * `doGenCode` emits a call to the same method — the generated code
  * stays inside the whole-stage-codegen span (no CodegenFallback
  * stage split, no per-row boxing through `eval`), while the loop
  * bodies live here in ordinary Scala.
  *
  * Fused one-pass designs (shingling + k minhash lanes in a single
  * traversal, rolling n-gram windows without substring allocation)
  * are what keep the sketches off the profile at 100 TB — the
  * interpreted higher-order-function formulations cost ~100x more.
  */
object SketchKernels {

  /** 64-bit hash of each `shingleN`-token window of a token array
    * (FNV over the tokens' bytes with a separator byte between
    * tokens). Short inputs (< n tokens) produce the single hash of
    * all tokens, so every document has a non-empty shingle set. */
  private def windowHashes(arr: ArrayData, shingleN: Int): Array[Long] = {
    val n = arr.numElements()
    val count = if (n <= shingleN) 1 else n - shingleN + 1
    val out = new Array[Long](count)
    var pos = 0
    while (pos < count) {
      val end = math.min(pos + shingleN, n)
      var h = Hash64.FnvOffset
      var j = pos
      while (j < end) {
        val s = arr.getUTF8String(j)
        if (s != null) {
          val bytes = s.getBytes
          var b = 0
          while (b < bytes.length) {
            h = (h ^ (bytes(b) & 0xffL)) * Hash64.FnvPrime
            b += 1
          }
        }
        h = (h ^ 0x1fL) * Hash64.FnvPrime // token separator
        j += 1
      }
      out(pos) = Hash64.mix(h)
      pos += 1
    }
    out
  }

  /** Sort + dedup in place, returning the compacted prefix. */
  private def sortedDistinct(hs: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  def shingleHashes(arr: ArrayData, shingleN: Int): ArrayData =
    new GenericArrayData(sortedDistinct(windowHashes(arr, shingleN)))

  def minhashSignature(arr: ArrayData, k: Int, shingleN: Int): ArrayData = {
    val hashes = windowHashes(arr, shingleN)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val base = hashes(i)
      var lane = 0
      while (lane < k) {
        val h = Hash64.mix(base ^ (lane * 0xff51afd7ed558ccdL))
        if (h < sig(lane)) sig(lane) = h
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Modulus of the PORTABLE minhash lane family: 2³¹−1 (Mersenne
    * prime). Lane values and multipliers are < 2³¹ so a·h < 2⁶² —
    * exact in any engine's BIGINT arithmetic. */
  val PortableP: Long = 2147483647L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val SpaceByte = Array[Byte](' ')

  /** PORTABLE minhash signature over the `shingleN`-word shingles of a
    * token array: each shingle is md5-hashed ONCE — the digest fed
    * incrementally from the token bytes with ' ' separators, so the
    * joined shingle string is hashed without ever being allocated —
    * the top 60 bits (15 hex chars) parse to a long reduced mod
    * [[PortableP]], and lane i's value is the classic universal affine
    * (aᵢ·h + bᵢ) mod P with aᵢ = (1103515245·(i+1)) mod P,
    * bᵢ = (12345·(i+1)) mod P. EVERY step is reproducible in portable
    * SQL (`md5` of the space-joined shingle, hex-parse, BIGINT
    * mul/add/mod), which is this family's whole reason to exist: the
    * DuckDB oracle replays the signature bit for bit. Duplicate
    * shingles cannot move a minimum, so no distinct pass is needed.
    * Fewer than `shingleN` tokens hash the whole token array as one
    * shingle (the wordShingles fallback). One compiled pass — the HOF
    * spelling of the identical arithmetic interpreted its lambdas per
    * element and was 30× slower. */
  def portableMinhashSignature(toks: ArrayData, k: Int,
      shingleN: Int): ArrayData = {
    val P = PortableP
    val md = md5Local.get()
    val sig = Array.fill(k)(Long.MaxValue)
    val n = toks.numElements()
    val nShingles = if (n >= shingleN) n - shingleN + 1 else 1
    val width = if (n >= shingleN) shingleN else n
    var i = 0
    while (i < nShingles) {
      md.reset()
      var t = 0
      while (t < width) {
        if (t > 0) md.update(SpaceByte)
        md.update(toks.getUTF8String(i + t).getBytes)
        t += 1
      }
      val digest = md.digest()
      // top 15 hex chars == bytes 0..6 (56 bits) + high nibble of byte 7
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      h = ((h << 4) | ((digest(7) & 0xf0L) >> 4)) % P
      var lane = 0
      while (lane < k) {
        val a = (1103515245L * (lane + 1)) % P
        val b = (12345L * (lane + 1)) % P
        val v = (a * h + b) % P
        if (v < sig(lane)) sig(lane) = v
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Sorted distinct PORTABLE shingle hashes of a token array: each
    * `shingleN`-word shingle md5-hashed exactly as in
    * [[portableMinhashSignature]] (digest fed token bytes + ' '
    * separators, top 60 bits mod [[PortableP]]) but returned as the
    * distinct hash SET rather than folded into lane minima. This is
    * the portable-dedup verification sketch: Jaccard over these longs
    * equals Jaccard over the distinct shingle strings (mod md5
    * collisions), and a SQL oracle replays the identical md5 +
    * hex-parse + mod arithmetic, so exact-verification joins can move
    * and intersect 8-byte longs instead of shingle strings. */
  def portableShingleHashes(toks: ArrayData, shingleN: Int): ArrayData = {
    val P = PortableP
    val md = md5Local.get()
    val n = toks.numElements()
    val nShingles = if (n >= shingleN) n - shingleN + 1 else 1
    val width = if (n >= shingleN) shingleN else n
    val hs = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      md.reset()
      var t = 0
      while (t < width) {
        if (t > 0) md.update(SpaceByte)
        md.update(toks.getUTF8String(i + t).getBytes)
        t += 1
      }
      val digest = md.digest()
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      hs(i) = ((h << 4) | ((digest(7) & 0xf0L) >> 4)) % P
      i += 1
    }
    new GenericArrayData(sortedDistinct(hs))
  }

  /** PORTABLE SimHash signature over the `shingleN`-word shingles of a
    * token array: each shingle (WITH multiplicity — frequency weights
    * the vote, the Charikar '02 convention) is md5-hashed exactly as in
    * [[portableMinhashSignature]] to a 60-bit value mod [[PortableP]],
    * and signature bit j is set iff the (+1/−1) vote sum over shingles'
    * bit j is strictly positive (tie → 0). Every step — md5, hex
    * parse, shift, compare — replays in portable SQL, so a banded
    * Hamming near-dup pipeline over this signature is
    * hash-oracle-checkable end-to-end (the xxhash-based [[SimHash64]]
    * stays the production wire format). */
  def portableSimhash(toks: ArrayData, shingleN: Int): Long = {
    val P = PortableP
    val md = md5Local.get()
    val n = toks.numElements()
    val nShingles = if (n >= shingleN) n - shingleN + 1 else 1
    val width = if (n >= shingleN) shingleN else n
    val votes = new Array[Int](60)
    var i = 0
    while (i < nShingles) {
      md.reset()
      var t = 0
      while (t < width) {
        if (t > 0) md.update(SpaceByte)
        md.update(toks.getUTF8String(i + t).getBytes)
        t += 1
      }
      val digest = md.digest()
      var h = 0L
      var j = 0
      while (j < 7) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
      h = ((h << 4) | ((digest(7) & 0xf0L) >> 4)) % P
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def charNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val count = if (len <= n) 1 else len - n + 1
    val hs = new Array[Long](count)
    var pos = 0
    while (pos < count) {
      val end = math.min(pos + n, len)
      var h = Hash64.FnvOffset
      var j = pos
      while (j < end) {
        h = (h ^ (bytes(j) & 0xffL)) * Hash64.FnvPrime
        j += 1
      }
      hs(pos) = Hash64.mix(h)
      pos += 1
    }
    new GenericArrayData(sortedDistinct(hs))
  }

  /** Space-delimited word bigrams as substrings of the input: because
    * the delimiter is a single space, bigram i IS the byte range from
    * the start of token i to the end of token i+1 — no token array and
    * no per-gram string concatenation, just offset slices over one
    * byte array (0x20 never occurs inside a UTF-8 multibyte sequence,
    * so the byte scan is codepoint-safe). Token semantics match
    * split(text, ' ') exactly: consecutive spaces yield empty tokens,
    * a single token yields no bigrams. */
  def wordBigrams(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < 2) return new GenericArrayData(new Array[AnyRef](0))
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[AnyRef](nTok - 1)
    var j = 0
    while (j < nTok - 1) {
      val s = starts(j)
      val e = if (j + 2 < nTok) starts(j + 2) - 1 else len
      out(j) = UTF8String.fromBytes(bytes, s, e - s)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** All nine Gopher repetition metrics of one document in ONE pass
    * (Rae et al. 2021 Table A1) as exact integers — the float
    * fractions and their rounding stay in the SQL layer, where the
    * DuckDB oracle replays them. Word n-grams are BYTE SLICES of the
    * input (the [[wordBigrams]] discipline: the separator is a single
    * space, so gram (i, n) is the byte range from token i's start to
    * token i+n-1's end — no per-gram concatenation); counts come from
    * one hash map per n; tie-breaks compare gram bytes (=
    * UTF8String / DuckDB binary varchar order).
    *
    * Output layout (array<long>, 1-based from SQL):
    * [1..6]  = topCnt2, topLen2, topCnt3, topLen3, topCnt4, topLen4
    *           (occurrence count and CHAR length of the most frequent
    *           n-gram, ties (count DESC, gram ASC); count 0 when the
    *           doc has < n tokens)
    * [7..12] = covch5..covch10 (characters of words covered by ANY
    *           duplicated n-gram occurrence — the UNION of covered
    *           positions, overlaps counted once)
    * [13]    = total word characters. */
  def gopherRepetition(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = len + 1 // sentinel: token j ends at starts(j+1) - 2
    val wlen = new Array[Int](nTok)
    var wchars = 0L
    var j = 0
    while (j < nTok) {
      wlen(j) = UTF8String
        .fromBytes(bytes, starts(j), starts(j + 1) - 1 - starts(j))
        .numChars()
      wchars += wlen(j)
      j += 1
    }
    val out = new Array[Long](13)
    out(12) = wchars
    var n = 2
    while (n <= 10) {
      if (nTok >= n) {
        val m = nTok - n + 1
        val counts = new java.util.HashMap[UTF8String, Array[Int]](m * 2)
        val grams = new Array[UTF8String](m)
        var p = 0
        while (p < m) {
          val s = starts(p)
          val e = starts(p + n) - 1
          val g = UTF8String.fromBytes(bytes, s, e - s)
          grams(p) = g
          val c = counts.get(g)
          if (c == null) counts.put(g, Array(1)) else c(0) += 1
          p += 1
        }
        if (n <= 4) {
          var bestCnt = 0
          var bestGram: UTF8String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            val c = en.getValue()(0)
            if (c > bestCnt ||
              (c == bestCnt && en.getKey.compareTo(bestGram) < 0)) {
              bestCnt = c; bestGram = en.getKey
            }
          }
          out((n - 2) * 2) = bestCnt.toLong
          out((n - 2) * 2 + 1) = bestGram.numChars().toLong
        } else {
          val covered = new Array[Boolean](nTok)
          p = 0
          while (p < m) {
            if (counts.get(grams(p))(0) >= 2) {
              var q = p
              while (q < p + n) { covered(q) = true; q += 1 }
            }
            p += 1
          }
          var covch = 0L
          j = 0
          while (j < nTok) { if (covered(j)) covch += wlen(j); j += 1 }
          out(6 + (n - 5)) = covch
        }
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** (center, context) skip-gram struct pairs with context offsets
    * 1..window — the word2vec co-occurrence generator, one pass over
    * the UTF-8 bytes with byte-slice tokens (the [[wordBigrams]]
    * discipline: no token array of Strings, no per-pair concat; 0x20
    * never occurs inside a UTF-8 multibyte sequence so the byte scan
    * is codepoint-safe). Token semantics match split(text, ' '); docs
    * with fewer than 2 tokens yield an empty array. */
  def wordSkipgrams(text: UTF8String, window: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < 2) return new GenericArrayData(new Array[AnyRef](0))
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    def slice(j: Int): UTF8String = {
      val s = starts(j)
      val e = if (j + 1 < nTok) starts(j + 1) - 1 else len
      UTF8String.fromBytes(bytes, s, e - s)
    }
    var total = 0
    var j = 0
    while (j < nTok - 1) { total += math.min(window, nTok - 1 - j); j += 1 }
    val out = new Array[AnyRef](total)
    var k = 0
    j = 0
    while (j < nTok - 1) {
      val c = slice(j)
      var o = 1
      while (o <= window && j + o < nTok) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](c, slice(j + o)))
        k += 1
        o += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit Morton (z-order) code from two 16-bit normalized values:
    * bit-spread each and interleave (a gets the odd bits). Rows sorted
    * by this value are clustered in BOTH dimensions at once, so
    * per-file min/max stats are tight on either column. */
  def interleave16(a: Long, b: Long): Long =
    (spread16(a) << 1) | spread16(b)

  /** Hilbert-curve distance of a 2-D cell, `order` bits per dimension
    * (xy→d form of the public iterative algorithm — Hilbert 1891 via
    * the standard quadrant-rotation formulation). Unlike the Morton
    * code, CONSECUTIVE distances are grid-adjacent — no quadrant-
    * boundary jumps — so equal-size d-ranges cover tighter x/y
    * bounding boxes, which is exactly what per-file min/max skipping
    * keys on. */
  def hilbertD(order: Int, xIn: Long, yIn: Long): Long = {
    val mask = (1L << order) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate the quadrant so the sub-curve composes
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert16(x: Long, y: Long): Long = hilbertD(16, x, y)

  /** Length of the common prefix of two strings (in chars) — the LCP
    * primitive of suffix-array post-processing. */
  def commonPrefixLen(a: UTF8String, b: UTF8String): Int = {
    val sa = a.toString; val sb = b.toString
    val n = math.min(sa.length, sb.length)
    var i = 0
    while (i < n && sa.charAt(i) == sb.charAt(i)) i += 1
    i
  }

  private def spread16(vIn: Long): Long = {
    var v = vIn & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def simhash64(arr: ArrayData): Long = {
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

  def rollingHashMin(text: UTF8String, k: Int): Long = {
    val bytes = text.getBytes
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

  def hyperplaneBits(v: ArrayData, nbits: Int): Long = {
    val d = v.numElements()
    val dots = new Array[Double](nbits)
    var i = 0
    while (i < d) {
      val x = v.getFloat(i).toDouble
      var p = 0
      while (p < nbits) {
        // component in [-1, 1] from the (plane, dim) pair
        val h = Hash64.mix(p.toLong * 0x9e3779b97f4a7c15L + i)
        dots(p) += x * (h.toDouble / Long.MaxValue.toDouble)
        p += 1
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < nbits) {
      if (dots(p) >= 0.0) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** Base for sketch expressions whose codegen is a call into
  * [[SketchKernels]] — subclasses provide the kernel invocation as a
  * Java expression over the child's codegen value. */
private[functions] trait KernelCallExpression extends UnaryExpression {
  /** Java source for the kernel call, given the child value term. */
  protected def kernelCall(childTerm: String): String

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelCall(c)};")
}

/** Hashes of the `shingleN`-word shingles of a token array — the
  * verification-side companion of [[MinHashSignature]]: Jaccard over
  * these long arrays equals shingle-set Jaccard (minus a vanishing
  * hash-collision error) at ~1/8 the shuffle width of string shingles.
  * Output is distinct + sorted for cheap set operations downstream. */
case class ShingleHashes(child: Expression, shingleN: Int)
    extends KernelCallExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.shingleHashes(input.asInstanceOf[ArrayData], shingleN)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.shingleHashes($c, $shingleN)"

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** MinHash signature over the `shingleN`-word shingles of a token
  * array: for each of k independent hash functions, the minimum hash
  * over the shingle set. Shingling + all k lanes in ONE pass — no
  * intermediate shingle strings exist at all.
  *
  * Output: array<long> of length k. Deterministic: no RNG, lane i's
  * hash function is fixed by the lane index.
  *
  * Beyond-reference extension (the reference has no dedup surface;
  * SURVEY §2.5). Standard MinHash-LSH construction per Broder '97.
  */
case class MinHashSignature(child: Expression, k: Int, shingleN: Int = 1)
    extends KernelCallExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashSignature(input.asInstanceOf[ArrayData], k, shingleN)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.minhashSignature($c, $k, $shingleN)"

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** PORTABLE minhash signature of a token array (md5 base hash over
  * the space-joined word shingles + affine lane family mod 2³¹−1 —
  * see [[SketchKernels.portableMinhashSignature]]): the
  * engine-portable twin of [[MinHashSignature]], existing so a SQL
  * oracle can replay the signature exactly. Output: array<long> of
  * length k. */
case class PortableMinhashSignature(child: Expression, k: Int,
    shingleN: Int = 3) extends KernelCallExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // SQL-path registered: reject / coerce mistyped input at analysis
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_signature"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.portableMinhashSignature(
      input.asInstanceOf[ArrayData], k, shingleN)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.portableMinhashSignature($c, $k, $shingleN)"

  override protected def withNewChildInternal(c: Expression)
      : PortableMinhashSignature = copy(child = c)
}

/** Sorted distinct portable (md5 mod 2³¹−1) shingle hashes of a token
  * array — the verification-sketch twin of [[PortableMinhashSignature]]
  * (see [[SketchKernels.portableShingleHashes]]). Output: array<long>. */
case class PortableShingleHashes(child: Expression, shingleN: Int = 3)
    extends KernelCallExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // SQL-path registered: reject / coerce mistyped input at analysis
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.portableShingleHashes(
      input.asInstanceOf[ArrayData], shingleN)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.portableShingleHashes($c, $shingleN)"

  override protected def withNewChildInternal(c: Expression)
      : PortableShingleHashes = copy(child = c)
}

/** Portable (md5 mod 2³¹−1 base hash) SimHash of a token array's word
  * shingles — see [[SketchKernels.portableSimhash]]. Output: long
  * (bits 0..59 used). */
case class PortableSimhash(child: Expression, shingleN: Int = 3)
    extends KernelCallExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // SQL-path registered: reject / coerce mistyped input at analysis
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.portableSimhash(input.asInstanceOf[ArrayData], shingleN)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.portableSimhash($c, $shingleN)"

  override protected def withNewChildInternal(c: Expression)
      : PortableSimhash = copy(child = c)
}

/** Distinct hashes of the character n-grams of a string — one pass
  * over the UTF-8 bytes with a true rolling window (no substring
  * allocation), for the n-gram-Jaccard dedup path. Strings shorter
  * than n hash as a single whole-string gram. */
case class CharNgramHashes(child: Expression, n: Int)
    extends KernelCallExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.charNgramHashes(input.asInstanceOf[UTF8String], n)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.charNgramHashes($c, $n)"

  override protected def withNewChildInternal(c: Expression): CharNgramHashes =
    copy(child = c)
}

/** 64-bit SimHash of an array<string> token sequence (Charikar '02):
  * each token votes ±1 on each of 64 bit positions according to its
  * hash; the sign of each accumulated position is the output bit.
  * Near-duplicate texts differ in few bits (small Hamming distance).
  */
case class SimHash64(child: Expression)
    extends KernelCallExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.simhash64($c)"

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
    extends KernelCallExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash_min"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.rollingHashMin(input.asInstanceOf[UTF8String], k)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.rollingHashMin($c, $k)"

  override protected def withNewChildInternal(c: Expression): RollingHashMin =
    copy(child = c)
}

/** Random-hyperplane LSH signature of an array<float> vector: bit p is
  * the sign of <v, h_p>, where hyperplane component h_p[i] is a
  * pseudo-random value in [-1, 1] derived from splitmix64(p, i) — no
  * RNG state, so every executor derives identical hyperplanes and the
  * signature is fully deterministic (resume/retry safe at scale).
  *
  * One fused pass: d × nbits multiply-adds per row, no intermediate
  * arrays — replaces an nbits-fold stack of `aggregate`/`zip_with`
  * higher-order functions that re-walked the vector per bit.
  */
case class HyperplaneBits(child: Expression, nbits: Int)
    extends KernelCallExpression {
  require(nbits > 0 && nbits <= 64, "nbits must be in 1..64")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.hyperplaneBits(input.asInstanceOf[ArrayData], nbits)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.hyperplaneBits($c, $nbits)"

  override protected def withNewChildInternal(c: Expression): HyperplaneBits =
    copy(child = c)
}

/** Space-delimited word bigrams of a raw text column in one codegen'd
  * pass (see [[SketchKernels.wordBigrams]]). Equivalent to building
  * grams with transform/sequence/concat_ws over split(text, ' '), but
  * higher-order functions evaluate their lambda interpreted per
  * element and break the enclosing whole-stage-codegen span — this
  * kernel keeps scan → explode → aggregate in one span (3x on the
  * corpus bigram-frequency query). Equivalence is ExpressionsSpec-
  * gated, including empty/single-token/consecutive-space edge cases. */
case class WordBigrams(child: Expression) extends KernelCallExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_bigrams"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordBigrams(input.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.wordBigrams($c)"

  override protected def withNewChildInternal(c: Expression): WordBigrams =
    copy(child = c)
}

/** (center, context) word skip-gram pairs of a raw text column with
  * offsets 1..window, in one codegen'd pass (see
  * [[SketchKernels.wordSkipgrams]]) — the compiled replacement for the
  * nested flatten/transform/filter HOF spelling, whose lambdas
  * evaluate interpreted per token and profiled as pure per-row CPU on
  * the skip-gram count query (the [[WordBigrams]] precedent: 5.7× vs
  * the HOF). Equivalence with the HOF spelling is ExpressionsSpec-
  * gated, including single-token/empty/consecutive-space edges. */
case class WordSkipgrams(child: Expression, window: Int)
    extends KernelCallExpression {
  require(window >= 1, s"window must be >= 1 (got $window)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("center", StringType, nullable = false),
      StructField("context", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "word_skipgrams"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.wordSkipgrams(input.asInstanceOf[UTF8String], window)

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.wordSkipgrams($c, $window)"

  override protected def withNewChildInternal(c: Expression): WordSkipgrams =
    copy(child = c)
}

/** All nine Gopher repetition metrics in one compiled pass — see
  * [[SketchKernels.gopherRepetition]] for the layout. Replaces a
  * nine-window formulation that measured 7.8 s at sf0.1 (nine
  * full-row in-partition sorts); the kernel is a per-row map with
  * integer outputs, so the query is shuffle-free and the rounding
  * stays in the SQL layer where the oracle replays it. */
case class GopherRepetition(child: Expression)
    extends KernelCallExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_repetition"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.gopherRepetition(input.asInstanceOf[UTF8String])

  override protected def kernelCall(c: String): String =
    s"graft.functions.SketchKernels.gopherRepetition($c)"

  override protected def withNewChildInternal(c: Expression)
      : GopherRepetition = copy(child = c)
}

/** 32-bit Morton (z-order) code of two 16-bit-normalized long columns
  * (see [[SketchKernels.interleave16]]) — the clustering key behind
  * [[graft.ops.StorageOps.zorderWrite]]. Declares long inputs so a
  * SQL-path call with int (or other) arguments gets an analysis-time
  * implicit cast instead of an interpreted-eval ClassCastException
  * that the widening codegen path would mask. */
case class ZOrderValue(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // covariant override: AbstractDataType is private[sql]
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchKernels.interleave16($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ZOrderValue = copy(left = l, right = r)
}

/** Common-prefix length of two string columns (codegen'd) — the LCP
  * step after suffix-array construction. */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "common_prefix_len"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.commonPrefixLen(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchKernels.commonPrefixLen($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CommonPrefixLen = copy(left = l, right = r)
}

/** 32-bit Hilbert distance of two 16-bit-normalized long columns (see
  * [[SketchKernels.hilbert16]]) — the locality-tighter alternative
  * clustering key behind [[graft.ops.StorageOps.hilbertWrite]]. */
case class HilbertValue(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.hilbert16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchKernels.hilbert16($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): HilbertValue = copy(left = l, right = r)
}

object HashFunctions {
  def wordBigrams(text: Column): Column =
    column(WordBigrams(expression(text)))

  def wordSkipgrams(text: Column, window: Int = 2): Column =
    column(WordSkipgrams(expression(text), window))

  def gopherRepetition(text: Column): Column =
    column(GopherRepetition(expression(text)))

  def zorderValue(a: Column, b: Column): Column =
    column(ZOrderValue(expression(a), expression(b)))

  def hilbertValue(a: Column, b: Column): Column =
    column(HilbertValue(expression(a), expression(b)))

  def commonPrefixLen(a: Column, b: Column): Column =
    column(CommonPrefixLen(expression(a), expression(b)))

  def hyperplaneBits(vec: Column, nbits: Int): Column =
    column(HyperplaneBits(expression(vec), nbits))

  def minhashSignature(tokens: Column, k: Int, shingleN: Int = 1): Column =
    column(MinHashSignature(expression(tokens), k, shingleN))

  def portableMinhashSignature(tokens: Column, k: Int,
      shingleN: Int = 3): Column =
    column(PortableMinhashSignature(expression(tokens), k, shingleN))

  def shingleHashes(tokens: Column, shingleN: Int): Column =
    column(ShingleHashes(expression(tokens), shingleN))

  def portableShingleHashes(tokens: Column, shingleN: Int = 3): Column =
    column(PortableShingleHashes(expression(tokens), shingleN))

  def portableSimhash(tokens: Column, shingleN: Int = 3): Column =
    column(PortableSimhash(expression(tokens), shingleN))

  def charNgramHashes(text: Column, n: Int): Column =
    column(CharNgramHashes(expression(text), n))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def rollingHashMin(text: Column, k: Int = 8): Column =
    column(RollingHashMin(expression(text), k))
}
