package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: Bloom-filter membership probe on an int64
  * key. The filter rides the expression tree into the task binary (same
  * distribution cost as a broadcast for the MB-scale filters this is for)
  * and the generated code is one `mightContainLong` call — no ScalaUDF
  * boxing, no interpreted fallback, stays inside whole-stage codegen.
  *
  * Why not a UDF: the probe sits on the BIG side of an incremental-dedup
  * join ([[graft.operators.Dedup.bloomAdmit]]) — at 100 TB it runs once
  * per ledger row, exactly the place where per-row boxing and the codegen
  * fence around ScalaUDF cost real time.
  *
  * Determinism: a Bloom filter's bit set is an OR of per-item bit sets, so
  * the built filter — and therefore every probe — is independent of row
  * order and partitioning. False positives are expected and must be
  * resolved by an exact join downstream; there are no false negatives.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomMightContain {
  /** Column API: true iff `key` (int64) might be in `bloom`. */
  def mightContainLong(key: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(key), bloom))
}
