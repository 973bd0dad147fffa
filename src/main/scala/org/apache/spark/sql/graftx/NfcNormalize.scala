package org.apache.spark.sql.graftx

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — Spark has no
  * built-in `normalize`, and a Scala UDF would box every row out of
  * Tungsten. Canonical composition is the standard first step of text
  * cleaning for a crawl corpus: visually identical strings with composed
  * vs decomposed accents (`é` vs `e`+U+0301) must hash/dedup/tokenize
  * identically.
  *
  * The JDK's `java.text.Normalizer` implements the Unicode standard, so
  * results agree with any conformant engine (DuckDB's `nfc_normalize` — the
  * q61 oracle leans on that).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(s.asInstanceOf[UTF8String].toString, Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(col: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(col)))
}
