package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import graft.functions.ArrayDotLong

/** SQL-surface registration of graft's native expressions, so
  * `spark.sql("... array_dot_long(a, b) ...")` works like a built-in.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (the standard plugin path for clusters);
  *  - `GraftExtensions.register(spark)` on a live session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.arrayDotLong)
}

object GraftExtensions {
  private val arrayDotLong: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot_long"),
    new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"array_dot_long takes 2 arguments, got ${children.length}")
      ArrayDotLong(children.head, children(1))
    })

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = arrayDotLong
    Bridge.registerFunction(spark, id, info, builder)
  }
}
