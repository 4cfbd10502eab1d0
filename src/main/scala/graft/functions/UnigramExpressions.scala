package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A trained unigram-LM tokenizer (Kudo '18, "Subword Regularization" —
  * the SentencePiece unigram model; public literature, independent
  * implementation). `pieces(i)` has log-probability `logProbs(i)`;
  * segmentation is the Viterbi-best split of each pre-token under the
  * unigram likelihood. The model is a few kilobytes and ships to
  * executors as a codegen reference object, exactly like [[BpeModel]].
  *
  * Determinism: Viterbi compares doubles computed identically on every
  * executor from the same model arrays; ties prefer the LONGER piece
  * (then the earlier scan position), so the split never depends on
  * hash-map iteration order. Single characters are always in the
  * vocabulary (training guarantees it), so any input encodes.
  */
final class UnigramModel(val pieces: Array[String],
    val logProbs: Array[Double]) extends Serializable {
  require(pieces.length == logProbs.length)

  @transient lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), i); i += 1 }
    m
  }
  @transient lazy val maxPieceLen: Int =
    if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  def size: Int = pieces.length
}

/** Static kernels shared by interpreted eval and codegen (same
  * discipline as [[BpeKernels]], whose pre-tokenizer is reused so BPE
  * and unigram segment the identical pre-token stream). */
object UnigramKernels {

  /** Viterbi-best segmentation of one pre-token: best(end) = max over
    * admissible cut points of best(start) + logP(piece). Ties keep the
    * LONGER piece (start scans ascending with strict improvement, so
    * the first — longest — candidate wins). Falls back to per-character
    * pieces for characters missing from the vocabulary (log-prob
    * `UnkLogProb`), so arbitrary input always encodes. */
  val UnkLogProb: Double = -100.0

  def viterbi(word: String, model: UnigramModel): ArrayBuffer[String] = {
    val n = word.length
    val out = new ArrayBuffer[String]()
    if (n == 0) return out
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the final piece
    var end = 1
    while (end <= n) {
      best(end) = Double.NegativeInfinity
      back(end) = end - 1
      val lo = math.max(0, end - model.maxPieceLen)
      var start = lo
      var found = false
      while (start < end) {
        val idx = model.index.get(word.substring(start, end))
        if (idx != null) {
          val cand = best(start) + model.logProbs(idx)
          if (!found || cand > best(end)) {
            best(end) = cand
            back(end) = start
            found = true
          }
        }
        start += 1
      }
      if (!found) { // unknown single character fallback
        best(end) = best(end - 1) + UnkLogProb
        back(end) = end - 1
      }
      end += 1
    }
    // reconstruct
    val cuts = new ArrayBuffer[Int]()
    var p = n
    while (p > 0) { cuts += p; p = back(p) }
    var i = cuts.length - 1
    var start = 0
    while (i >= 0) {
      out += word.substring(start, cuts(i))
      start = cuts(i)
      i -= 1
    }
    out
  }

  /** PORTABLE Viterbi for the hard-EM TRAINING E-step: identical
    * recurrence and tie-break to [[viterbi]] (start scans ascending
    * with strict improvement → longest candidate wins ties), but the
    * path score is the PROBABILITY PRODUCT `Π cnt_i/total` instead of
    * a log-prob sum. Division and multiplication are IEEE-754
    * correctly-rounded in every engine — no libm transcendental —
    * so a DuckDB lambda performing the same operations in the same
    * order reproduces every comparison bit for bit. That is what
    * makes `text_unigram_train` oracle-replayable from the raw
    * corpus: the E-step was the only float-boundary left once counts
    * are exact longs. Underflow is structurally out of reach: pieces
    * carry prob ≥ 1/total ≥ 1e-12 at any testable corpus, and
    * pre-tokenized word types are bounded well under 100 chars, so
    * the smallest path product stays far above Double.MinValue's
    * 1e-308 range; the training corpus always covers every char, so
    * the UNK arc (mirrored at 1e-100 for totality) never fires. */
  def viterbiPortable(word: String,
      counts: java.util.HashMap[String, java.lang.Long], total: Double,
      maxPieceLen: Int): ArrayBuffer[String] = {
    val n = word.length
    val out = new ArrayBuffer[String]()
    if (n == 0) return out
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    best(0) = 1.0
    var end = 1
    while (end <= n) {
      best(end) = 0.0
      back(end) = end - 1
      val lo = math.max(0, end - maxPieceLen)
      var start = lo
      var found = false
      while (start < end) {
        val c = counts.get(word.substring(start, end))
        if (c != null) {
          val cand = best(start) * (c.longValue.toDouble / total)
          if (!found || cand > best(end)) {
            best(end) = cand
            back(end) = start
            found = true
          }
        }
        start += 1
      }
      if (!found) { // unknown single character fallback (unreachable
        best(end) = best(end - 1) * 1e-100 // in training: chars floored)
        back(end) = end - 1
      }
      end += 1
    }
    val cuts = new ArrayBuffer[Int]()
    var p = n
    while (p > 0) { cuts += p; p = back(p) }
    var i = cuts.length - 1
    var start = 0
    while (i >= 0) {
      out += word.substring(start, cuts(i))
      start = cuts(i)
      i -= 1
    }
    out
  }

  /** Viterbi LOG-LIKELIHOOD of the best segmentation, optionally with
    * one piece masked out of the vocabulary (`masked` may be null) —
    * the primitive behind likelihood-loss pruning: loss(p) =
    * Σ_w freq(w)·(score(w) − score(w | p masked)). Single characters
    * stay unmasked, so every word keeps a finite score. */
  def viterbiScore(word: String, model: UnigramModel,
      masked: String): Double = {
    val n = word.length
    if (n == 0) return 0.0
    val best = new Array[Double](n + 1)
    var end = 1
    while (end <= n) {
      best(end) = Double.NegativeInfinity
      val lo = math.max(0, end - model.maxPieceLen)
      var start = lo
      var found = false
      while (start < end) {
        val piece = word.substring(start, end)
        if (masked == null || piece != masked) {
          val idx = model.index.get(piece)
          if (idx != null) {
            val cand = best(start) + model.logProbs(idx)
            if (!found || cand > best(end)) {
              best(end) = cand; found = true
            }
          }
        }
        start += 1
      }
      if (!found) best(end) = best(end - 1) + UnkLogProb
      end += 1
    }
    best(n)
  }

  /** Forward-backward expected piece counts for one word under the
    * model (the soft-EM E-step of the actual Kudo '18 algorithm):
    * E[piece p spanning s..e] = exp(α(s) + logP(p) + β(e) − Z), with
    * α/β the log-space forward/backward lattice sums and Z = α(n) the
    * total segmentation likelihood. Adds `weight × E` into `out`.
    * Missing single characters use the same UnkLogProb arc as Viterbi
    * so the lattice stays connected; their mass is attributed to the
    * character piece when present. Driver-side, single-threaded,
    * fixed iteration order — deterministic. */
  def expectedCounts(word: String, model: UnigramModel, weight: Double,
      out: scala.collection.mutable.HashMap[String, Double]): Unit = {
    val n = word.length
    if (n == 0) return
    val NegInf = Double.NegativeInfinity
    def logAdd(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val maxLen = model.maxPieceLen
    // arcs(s)(e): log-prob of piece word[s, e) if admissible
    val alpha = Array.fill(n + 1)(NegInf)
    val beta = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    var e = 1
    while (e <= n) {
      var s = math.max(0, e - maxLen)
      var any = false
      while (s < e) {
        val idx = model.index.get(word.substring(s, e))
        if (idx != null) {
          alpha(e) = logAdd(alpha(e), alpha(s) + model.logProbs(idx))
          any = true
        }
        s += 1
      }
      if (!any && alpha(e) == NegInf) // unknown-char fallback arc
        alpha(e) = alpha(e - 1) + UnkLogProb
      e += 1
    }
    beta(n) = 0.0
    var s2 = n - 1
    while (s2 >= 0) {
      var e2 = s2 + 1
      var any = false
      val hi = math.min(n, s2 + maxLen)
      while (e2 <= hi) {
        val idx = model.index.get(word.substring(s2, e2))
        if (idx != null) {
          beta(s2) = logAdd(beta(s2), model.logProbs(idx) + beta(e2))
          any = true
        }
        e2 += 1
      }
      if (!any && beta(s2) == NegInf)
        beta(s2) = UnkLogProb + beta(s2 + 1)
      s2 -= 1
    }
    val z = alpha(n)
    if (z == NegInf) return
    var s3 = 0
    while (s3 < n) {
      var e3 = s3 + 1
      val hi = math.min(n, s3 + maxLen)
      while (e3 <= hi) {
        val piece = word.substring(s3, e3)
        val idx = model.index.get(piece)
        if (idx != null) {
          val post = math.exp(alpha(s3) + model.logProbs(idx) + beta(e3) - z)
          if (post > 0.0) {
            out.update(piece, out.getOrElse(piece, 0.0) + weight * post)
          }
        }
        e3 += 1
      }
      s3 += 1
    }
  }

  /** Full-text encode: shared pre-tokenizer, per-word Viterbi, concat. */
  def unigramEncode(text: UTF8String, model: UnigramModel): ArrayData = {
    val words = BpeKernels.preTokenize(text.toString)
    val out = new ArrayBuffer[UTF8String]()
    var i = 0
    while (i < words.length) {
      val toks = viterbi(words(i), model)
      var j = 0
      while (j < toks.length) {
        out += UTF8String.fromString(toks(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Viterbi unigram segmentation of a text column — native codegen'd
  * expression; the model rides as a reference object so the Project
  * stays inside the enclosing whole-stage-codegen span. */
case class UnigramEncode(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def nullSafeEval(input: Any): Any =
    UnigramKernels.unigramEncode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramKernels.unigramEncode($c, $modelRef);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
}

object UnigramFunctions {
  def unigramEncode(text: Column, model: UnigramModel): Column =
    column(UnigramEncode(expression(text), model))
}
