package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's 60-bit md5 hash
  * ([[Hashing.md5Long]] at its full 15-hex-char width) computed directly
  * from the digest bytes.
  *
  * Semantically IDENTICAL to `conv(substring(md5(s), 1, 15), 16, 10)` —
  * the first 15 hex characters of an md5 rendering ARE the top 60 bits of
  * the digest, so the value is assembled from `digest[0..7]` with shifts
  * (property-tested against the composed form). What changes is the cost:
  * the composed chain allocates a 32-char hex string, substrings it, and
  * routes through conv's radix converter ON EVERY CALL — tolerable inside
  * whole-stage codegen, but the minhash/winnow families evaluate their
  * hashes inside higher-order-function lambdas, which Spark always
  * interprets per element. There the chain's constant factor multiplies
  * by every gram of every document (measured: the dominant term of dd11's
  * map pass). This expression is one thread-local digest + eight shifts,
  * interpreted or generated. */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override protected def nullSafeEval(v: Any): Any =
    Md5Long60.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Long60.hash($c.getBytes());")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Long60 = copy(child = newChild)
}

object Md5Long60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code: top 60 bits of
    * md5(bytes) == int64 value of the first 15 hex chars. */
  def hash(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(bytes)
    ((b(0) & 0xffL) << 52) | ((b(1) & 0xffL) << 44) |
      ((b(2) & 0xffL) << 36) | ((b(3) & 0xffL) << 28) |
      ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) |
      ((b(6) & 0xffL) << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** Column API: 60-bit md5 hash (15 hex chars, always positive). */
  def md5Long60(c: Column): Column =
    Bridge.column(Md5Long60(Bridge.expression(c)))
}
