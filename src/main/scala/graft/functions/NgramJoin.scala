package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: space-joined word n-grams of an
  * `array<string>` column — `["a","b","c"], n=2 → ["a b","b c"]`;
  * fewer than n tokens → empty array.
  *
  * This is `transform(sequence(1, size(ws)-n+1), i =>
  * array_join(slice(ws, i, n), ' '))` (and the concat(element_at...)
  * sibling) with the lambda removed: the n-gram builder sits directly on
  * the documents SCAN in every shingle-generating operator (dd03/dd11/
  * dd17 shingles, t07/t09/t20/t28 n-gram stats, c04/c07/c09
  * decontamination), and as a higher-order function it dropped each of
  * those per-row projections out of whole-stage codegen (r16 lambda
  * audit; the CountInSet mechanism). Here the grams are built in one
  * generated loop via UTF8String.concatWs.
  *
  * Value parity with the composed forms: array_join skips null elements,
  * as does UTF8String.concatWs — and every call site feeds split()
  * output, which contains no nulls. Null ARRAY → null (callers that
  * relied on when(size(ws) >= n, ...) mapping null to [] wrap this in
  * coalesce(..., array())).
  */
case class NgramJoinExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 16, s"ngram width: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_join"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_join needs array<string>, got ${other.sql}")
  }

  @transient private lazy val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val len = xs.numElements()
    val out = new Array[Any](math.max(0, len - n + 1))
    var i = 0
    while (i < out.length) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (xs.isNullAt(i + j)) null else xs.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      s"""
         |int $m = java.lang.Math.max(0, $a.numElements() - ${n - 1});
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $a.isNullAt($i + $j) ? null : $a.getUTF8String($i + $j);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($spaceRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramJoinExpr =
    copy(child = newChild)
}

object NgramJoin {
  /** Column surface: space-joined n-grams; null array → null — wrap in
    * coalesce(..., array()) where the composed form mapped null to []. */
  def ngrams(ws: Column, n: Int): Column =
    Bridge.column(NgramJoinExpr(Bridge.expression(ws), n))
}
