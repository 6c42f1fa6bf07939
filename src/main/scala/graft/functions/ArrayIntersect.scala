package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED `array<bigint>`
  * columns (distinct elements), via a two-pointer merge — the inner loop of
  * set-similarity (Jaccard / overlap / containment) joins.
  *
  * Why: counting intersections by exploding both sets and join+groupBy
  * shuffles Σ|A∩B| rows across the cluster; with the per-doc sets held as
  * sorted arrays the count is a tight O(|A|+|B|) primitive loop inside
  * whole-stage codegen, and the only data movement is the (small) array
  * side of the pair join. */
case class ArrayIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_intersect_count_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n1 = xs.numElements(); val n2 = ys.numElements()
    while (i < n1 && j < n2) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val acc = ctx.freshName("acc")
      // ev.value is pre-declared by nullSafeCodeGen's template; accumulate
      // in a fresh local and assign once (redeclaration = janino error +
      // silent interpreted fallback).
      s"""
         |int $i = 0, $j = 0;
         |int $n1 = $a.numElements(), $n2 = $b.numElements();
         |long $acc = 0L;
         |while ($i < $n1 && $j < $n2) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $acc++; $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayIntersectCountLong =
    copy(left = newLeft, right = newRight)
}

object ArrayIntersect {
  /** Column API: intersection size of two sorted array<bigint> sets. */
  def intersectCount(a: Column, b: Column): Column =
    Bridge.column(
      ArrayIntersectCountLong(Bridge.expression(a), Bridge.expression(b)))
}
