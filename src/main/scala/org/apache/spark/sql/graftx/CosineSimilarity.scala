package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Codegen'd cosine similarity over two double OR float arrays — single
  * pass accumulating dot, |a|², |b|² together; `dot / sqrt(na*nb)`;
  * zero-norm inputs score 0.0.
  *
  * Float inputs are widened per ELEMENT inside the loop (float→double
  * widening is exact, so the arithmetic is bit-identical to casting the
  * whole array first) — the r12 optimization: a `cast(array<float> →
  * array<double>)` materializes a fresh 64-element array per EVALUATION,
  * which in a pair join (bitext mining, near-dup scoring) meant two
  * allocations + 128 element copies per candidate pair before any math.
  *
  * Lives under `org.apache.spark.sql` because `ExpressionUtils` /
  * `AbstractDataType` are `private[sql]`; the public engine API is
  * `graft.functions.VectorOps`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // float/double arrays are read natively (no cast node); any other array
  // type gets an analyzer-inserted implicit cast to array<double>
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = leftFloat; val yf = rightFloat
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: plain `i`/`n` would collide with variables of the
      // enclosing whole-stage-generated method and break compilation
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getX; double $y = $getY;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / Math.sqrt($na * $nb);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column wrapper: float32 and float64 array columns pass through
    * uncast (the expression reads both natively — ImplicitCastInputTypes
    * only inserts a cast for other element types, e.g. array<int>).
    */
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
