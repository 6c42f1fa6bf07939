package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many elements of an `array<string>`
  * column are members of a COMPILE-TIME string set (with multiplicity —
  * every matching occurrence counts; null elements don't match).
  *
  * This is `size(filter(ws, w => w.isin(words)))` — the stopword /
  * marker-word counter under the quality score (t02), language-ID (t03),
  * and the streaming quality gate — with the lambda removed: higher-order
  * functions carry no `doGenCode`, so the composed form drops the WHOLE
  * projection out of whole-stage codegen and evaluates per row through
  * the interpreted path. Here the membership probe is one hash lookup per
  * element inside generated code (the [[ArrayIntersectCountLong]] /
  * [[Md5Long60]] precedent). Value- and type-identical to the composed
  * form: INT result, null array → null, null elements skipped (In(null)
  * is null, so filter dropped them), byte-equality membership (In's
  * string comparison is binary, as is UTF8String.equals).
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty, "CountInSet needs a non-empty word set")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  /** Membership is unconditionally BINARY (UTF8String.equals / hash set):
    * the "value-identical to size(filter(ws, isin))" claim holds only for
    * UTF8_BINARY string arrays — on a collated column the composed form
    * becomes collation-aware while this probe stays byte-wise (ADVICE
    * r15). All call sites are split()/tokenizer output (default
    * collation); anything else is rejected at analysis, not miscounted. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // == the UTF8_BINARY singleton (StringType.equals is by collationId;
    // isUTF8BinaryCollation is private[sql])
    case ArrayType(st: StringType, _) if st == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckFailure(
      "count_in_set: membership is byte-equality; non-UTF8_BINARY " +
        "collated string arrays are not supported")
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set needs array<string>, got ${other.sql}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (!xs.isNullAt(i) && set.contains(xs.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the set is built once on the driver and shipped as a codegen
    // reference object — the generated loop does one hash probe per element
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    $acc++;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  /** Column surface: count of `ws` elements that are in `words`. */
  def countIn(ws: Column, words: Seq[String]): Column =
    Bridge.column(CountInSet(Bridge.expression(ws), words))
}
