package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * A single fused pass over both arrays (dot + both norms in one loop)
  * beats composing `zip_with`/`aggregate` (which allocates an
  * intermediate array per row) — this sits in the innermost loop of
  * brute-force ANN, where at 100 TB the candidate stream is billions of
  * rows. The reference has no vector surface at all (SURVEY §2.5); this
  * is a beyond-reference extension for the training-data pipeline.
  *
  * Accumulation is sequential in index order in double precision, so
  * results are bit-deterministic regardless of partitioning.
  */
/** Shared by interpreted + codegen paths: vector kernels REQUIRE equal
  * dimensions — a corrupt embedding fails loudly instead of silently
  * producing a truncated similarity (the DuckDB oracle's
  * `list_cosine_similarity` errors on mismatched lengths too). */
object VectorExprUtil {
  def checkedDim(x: ArrayData, y: ArrayData): Int = {
    val nx = x.numElements(); val ny = y.numElements()
    if (nx != ny) throw new IllegalArgumentException(
      s"vector dimension mismatch: $nx vs $ny")
    nx
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExprUtil.checkedDim(x, y)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = graft.functions.VectorExprUtil.checkedDim($x, $y);
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product over two float-array columns (same rationale). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorExprUtil.checkedDim(x, y)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = graft.functions.VectorExprUtil.checkedDim($x, $y);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Cosine similarity between two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Dot product between two array<float> columns. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Reference implementation via built-in higher-order functions —
    * used in tests to cross-check the native expressions. */
  def cosineSimBuiltin(a: Column, b: Column): Column = {
    val dotp = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) =>
      acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) =>
      acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, 0.0)
      .otherwise(dotp / (sqrt(na) * sqrt(nb)))
  }
}
