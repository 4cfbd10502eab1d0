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
