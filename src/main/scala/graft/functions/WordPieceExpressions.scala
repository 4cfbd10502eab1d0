package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A trained WordPiece tokenizer (Schuster & Nakajima 2012; the
  * likelihood-scored merge variant popularized by BERT — public
  * literature, independent implementation). Vocabulary pieces use the
  * "##" continuation convention: a word's first piece is bare, every
  * later piece carries the "##" prefix. Inference is the published
  * greedy longest-match-first algorithm. The model is a few kilobytes
  * and ships to executors as a codegen reference object, exactly like
  * [[BpeModel]] / [[UnigramModel]].
  *
  * Determinism: greedy longest-match has no ties by construction (one
  * longest prefix per position); a word with any unmatchable position
  * — or longer than `maxInputChars` — encodes as the single `unk`
  * token (the BERT convention), so any input encodes.
  */
final class WordPieceModel(val vocab: Array[String],
    val unk: String = "[UNK]",
    val maxInputChars: Int = 100) extends Serializable {

  @transient lazy val index: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { s.add(vocab(i)); i += 1 }
    s
  }
  @transient lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max
  def size: Int = vocab.length
}

/** Static kernels shared by interpreted eval and codegen (the
  * [[BpeKernels]] discipline; the pre-tokenizer is reused so BPE,
  * unigram and WordPiece segment the identical pre-token stream). */
object WordPieceKernels {

  /** Greedy longest-match-first segmentation of one pre-token: at each
    * position take the LONGEST vocabulary piece (continuation pieces
    * carry the "##" prefix); any unmatchable position collapses the
    * whole word to `unk` — the published BERT inference, verbatim. */
  def encodeWord(word: String, model: WordPieceModel): ArrayBuffer[String] = {
    val out = new ArrayBuffer[String]()
    if (word.isEmpty) return out
    if (word.length > model.maxInputChars) {
      out += model.unk
      return out
    }
    var start = 0
    while (start < word.length) {
      // longest admissible end for this position
      val prefix = if (start == 0) "" else "##"
      var end = math.min(word.length, start + model.maxPieceLen)
      var found: String = null
      while (found == null && end > start) {
        val cand = prefix + word.substring(start, end)
        if (model.index.contains(cand)) found = cand
        else end -= 1
      }
      if (found == null) { // unmatchable position: whole word is UNK
        out.clear()
        out += model.unk
        return out
      }
      out += found
      start = end
    }
    out
  }

  /** Full-text encode: shared pre-tokenizer, per-word greedy match. */
  def wordpieceEncode(text: UTF8String, model: WordPieceModel): ArrayData = {
    val words = BpeKernels.preTokenize(text.toString)
    val out = new ArrayBuffer[UTF8String]()
    var i = 0
    while (i < words.length) {
      val toks = encodeWord(words(i), model)
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

/** Greedy WordPiece segmentation of a text column — native codegen'd
  * expression; the model rides as a reference object so the Project
  * stays inside the enclosing whole-stage-codegen span. */
case class WordPieceEncode(child: Expression, model: WordPieceModel)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def nullSafeEval(input: Any): Any =
    WordPieceKernels.wordpieceEncode(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("wordpieceModel", model,
      classOf[WordPieceModel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceKernels.wordpieceEncode($c, $modelRef);")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceEncode =
    copy(child = c)
}

object WordPieceFunctions {
  def wordpieceEncode(text: Column, model: WordPieceModel): Column =
    column(WordPieceEncode(expression(text), model))
}
