package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Jaro 1989; Winkler 1990) as a native codegen
  * expression — THE record-linkage string comparator (census dedup,
  * author-name matching), sharper than Levenshtein on short names
  * because transpositions and shared prefixes dominate human typos.
  * Standard parameterization: prefix bonus up to 4 chars, scaling
  * p = 0.1, boost threshold 0.7 — the same algorithm DuckDB's
  * `jaro_winkler_similarity` implements. Unit caveat: this kernel walks
  * UTF-16 code units (proper per-character semantics for the BMP) while
  * DuckDB walks UTF-8 BYTES, so scores agree exactly on ASCII — the
  * q196 oracle's domain — but diverge on multi-byte text ("café" vs
  * "cafe": 0.8833 here, 0.8483 in DuckDB, which over-weights the accent
  * as two byte mismatches).
  *
  * A Scala UDF would box every candidate pair out of Tungsten; here the
  * kernel is a static JVM method invoked from the generated code, so
  * the pair verifier stays inside WholeStageCodegen like the
  * [[SortedIntersectSize]] family.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftx.JaroWinklerImpl.compute($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** The scalar kernel, exposed as a static forwarder so generated Java
  * calls it directly.
  */
object JaroWinklerImpl {

  def compute(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
}
