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

/** [[ArrayIntersectCountLong]] with a Jaccard-threshold EARLY EXIT (r16
  * optimization round): when even counting every remaining element of the
  * shorter tail cannot reach `c/(|A|+|B|−c) ≥ minJ`, the merge aborts and
  * returns −1 — a sentinel every downstream `jraw ≥ minJ` filter drops,
  * so the result set is provably identical to the exhaustive count while
  * non-matching pairs (the overwhelming majority of an all-pairs or
  * banded-candidate scan) pay only the prefix of the merge.
  *
  * Exactness guard: the exit bound is the algebraic rearrangement
  * `c_upper < minJ·S/(1+minJ)` computed in double, SLACKED BY 1.0 —
  * rounding drift of the rearranged form is ulps, far below one count —
  * so any pair the final double-division filter would keep can never be
  * exited (jraw is monotone in c, and double division is monotone too). */
case class ArrayIntersectAtLeastLong(left: Expression, right: Expression,
    minJ: Double) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_intersect_at_least_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n1 = xs.numElements(); val n2 = ys.numElements()
    val exitBound = minJ * (n1 + n2) / (1.0 + minJ) - 1.0
    while (i < n1 && j < n2) {
      val rem = math.min(n1 - i, n2 - j)
      if (c + rem < exitBound) return -1L
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
      val acc = ctx.freshName("acc"); val rem = ctx.freshName("rem")
      val bound = ctx.freshName("bound")
      s"""
         |int $i = 0, $j = 0;
         |int $n1 = $a.numElements(), $n2 = $b.numElements();
         |long $acc = 0L;
         |double $bound = $minJ * ($n1 + $n2) / (1.0 + $minJ) - 1.0;
         |while ($i < $n1 && $j < $n2) {
         |  int $rem = ($n1 - $i < $n2 - $j) ? ($n1 - $i) : ($n2 - $j);
         |  if ($acc + $rem < $bound) { $acc = -1L; break; }
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $acc++; $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayIntersectAtLeastLong =
    copy(left = newLeft, right = newRight)
}

object ArrayIntersect {
  /** Column API: intersection size of two sorted array<bigint> sets. */
  def intersectCount(a: Column, b: Column): Column =
    Bridge.column(
      ArrayIntersectCountLong(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: intersection size, or −1 as soon as the pair provably
    * cannot reach Jaccard `minJ` (see [[ArrayIntersectAtLeastLong]]). */
  def intersectCountAtLeast(a: Column, b: Column, minJ: Double): Column =
    Bridge.column(ArrayIntersectAtLeastLong(
      Bridge.expression(a), Bridge.expression(b), minJ))
}
