package org.apache.spark.sql.graftx

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd deterministic hash embedding — the
  * [[graft.index.DeterministicEmbedder]] formula
  *
  *   v_d(text) = ((md5_31(text || ':' || d) mod 2001) - 1000) / 1000.0
  *
  * computed with ONE md5 pass over the text: the digest state after
  * `text || ':'` is cloned per dimension and finished with the dimension's
  * decimal digits. Incremental md5 over a concatenation is by definition
  * md5 of the concatenation, so every value is bit-identical to the SQL
  * form `conv(substring(md5(concat(text, ':', d)), 1, 15), 16, 10) % p
  * % 2001 ...` that the DuckDB oracles replay — but the old
  * `transform(sequence(0, dim-1), d -> ...)` HOF evaluated an interpreted
  * lambda per element and re-hashed the FULL text dim times, plus a
  * 32-char hex format + substring + base-16 parse per element that this
  * skips entirely (r12 optimization; guide §4 "prefer codegen
  * expressions", §1.2 "per-task work").
  */
case class DeterministicEmbed(child: Expression, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deterministic_embed"

  override protected def nullSafeEval(t: Any): Any =
    DeterministicEmbed.embed(t.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftx.DeterministicEmbed.embed($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeterministicEmbed {

  private val md5Local =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** One full-text md5 absorb, then per dimension: clone state + finish
    * with the dimension's decimal digits. JDK MD5 supports clone(); the
    * state copy is ~100 bytes vs re-hashing the whole text.
    */
  def embed(text: UTF8String, dim: Int): ArrayData = {
    val md = md5Local.get()
    md.reset()
    md.update(text.getBytes)
    md.update(':'.toByte)
    val prefix = md.clone().asInstanceOf[MessageDigest]
    val out = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      val m =
        if (d < dim - 1) prefix.clone().asInstanceOf[MessageDigest] else prefix
      m.update(Integer.toString(d).getBytes(StandardCharsets.US_ASCII))
      val dig = m.digest()
      // value of the first 15 hex digits = top 60 bits (graft.core.Ids.top60)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
      val h = (v >>> 4) % 2147483647L
      out(d) = ((h % 2001L) - 1000L) / 1000.0
      d += 1
    }
    new GenericArrayData(out)
  }

  def asColumn(text: Column, dim: Int): Column =
    ExpressionUtils.column(DeterministicEmbed(ExpressionUtils.expression(text), dim))
}
