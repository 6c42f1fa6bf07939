package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonicalization step that must run BEFORE any
  * hash-keyed dedup, or visually identical documents ("é" composed
  * vs "e"+U+0301 decomposed) land in different fingerprint groups and
  * near-dup shingles stop colliding.
  *
  * Spark has no built-in Unicode normalizer; `java.text.Normalizer`
  * implements the Unicode-spec NFC algorithm, the same one DuckDB's
  * `nfc_normalize` implements, so results are engine-portable by
  * construction. The quick-check fast path (`Normalizer.isNormalized`)
  * skips the transform for already-normalized text — on mostly-ASCII
  * corpora the common case is a pure scan with zero allocation. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.nfc($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared by interpreted eval and generated code. */
  def nfc(v: UTF8String): UTF8String = {
    val s = v.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

object NfcNormalize {
  /** Column API: Unicode NFC normalization. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))
}
