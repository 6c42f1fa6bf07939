package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: dot product of two `array<bigint>` columns.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0L, _+_)`: higher-order functions
  * evaluate their lambdas interpretively per element — outside whole-stage
  * codegen — and `zip_with` materializes an intermediate array per row. For
  * all-pairs similarity (n²·dim evaluations) that interpretation overhead
  * dominates the runtime. This expression generates a tight primitive loop
  * inside the codegen stage: no allocation, no virtual calls.
  *
  * Null semantics: null if either array is null (standard binary-expression
  * propagation); elements are assumed non-null (quantized vectors).
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += xs.getLong(i) * ys.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      // ev.value is already declared by the enclosing nullSafeCodeGen
      // template — redeclaring it is a janino compile error (and a silent
      // interpreted fallback). Accumulate in a fresh local, assign at end.
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDotLong = copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column API: dot product of two quantized (array<bigint>) vectors. */
  def dotLong(a: Column, b: Column): Column =
    Bridge.column(ArrayDotLong(Bridge.expression(a), Bridge.expression(b)))
}
