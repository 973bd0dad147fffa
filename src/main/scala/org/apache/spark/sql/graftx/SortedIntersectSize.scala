package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED long arrays as a codegen'd merge walk —
  * O(n+m) primitive comparisons with zero per-row allocation, unlike
  * `array_intersect` which builds a hash set per evaluation. The workhorse
  * of the set-similarity (n-gram Jaccard) pair verifier, where it runs once
  * per candidate pair across the whole corpus.
  *
  * Inputs MUST be sorted ascending (callers sort once per document, not
  * per pair) and duplicate-free for exact set semantics.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: plain `i`/`n` would collide with variables of the
      // enclosing whole-stage-generated method and break compilation
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Threshold-aware [[SortedIntersectSize]]: returns |A ∩ B| when it is
  * >= `minKeep`, else -1 — and ABORTS the merge walk the moment the best
  * still-possible intersection (`c + min(remaining_a, remaining_b)`) drops
  * below `minKeep`. For a similarity-threshold pair verifier most
  * candidates are true negatives, so most walks terminate in a fraction of
  * O(n+m); survivors pay the full walk and get the EXACT count, so a
  * downstream exact-jaccard filter is unaffected.
  */
case class SortedIntersectAtLeast(left: Expression, right: Expression, minKeep: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = minKeep

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_at_least"

  override protected def nullSafeEval(a: Any, b: Any, lb: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val need = lb.asInstanceOf[Int]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (c + math.min(n - i, m - j) < need) return -1
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    if (c < need) -1 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, lb) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val ra = ctx.freshName("ra"); val rb = ctx.freshName("rb")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  int $ra = $n - $i; int $rb = $m - $j;
         |  if ($c + ($ra < $rb ? $ra : $rb) < $lb) { $c = -1; break; }
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = ($c < $lb) ? -1 : $c;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, minKeep = newThird)
}

object SortedIntersectAtLeast {
  def asColumn(a: Column, b: Column, minKeep: Column): Column =
    ExpressionUtils.column(SortedIntersectAtLeast(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(minKeep)))
}
