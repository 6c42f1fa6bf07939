package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Exact cross-engine presentation rounding for RATIONAL-valued outputs.
  *
  * `round(x, k)` on a DOUBLE is engine-dependent wherever the true value
  * is a ratio of integers that lands on (or within an ulp of) a half at
  * the k-th decimal. Spark rounds the double's SHORTEST-DECIMAL
  * representation half-up (`BigDecimal.valueOf`); DuckDB multiplies by
  * 10^k — itself a rounding step — and rounds half-away-from-zero. For a
  * SINGLE float division the computed double is the nearest double to the
  * true rational and the two algorithms agree, which is why the
  * one-division ratios (quality, jaccard, percent_rank, 1/n weights) have
  * never diverged. But MULTI-STEP float arithmetic (sum/1e6/n chains,
  * FK-grade's a/b + c/d) can drift the double one ulp past the half, and
  * then the engines disagree: observed at sf0.1, t20 doc 3431 — the true
  * mean is EXACTLY −140012950/(10⁶·41) = −3.41495; Spark printed −3.4149,
  * DuckDB −3.415, identical int64 sums on both sides.
  *
  * The fix: round in int64 — t = sgn(num)·(2·|num|·10ᵏ + den) div (2·den)
  * — and make the double with ONE division t/10ᵏ, the same IEEE operation
  * in both engines, bit-identical by construction. [[roundDivSql]] emits
  * the DuckDB twin so a query and its oracle share one formula.
  *
  * Left alone, with rationale: single-division ratios (see above);
  * irrational maps (sqrt/ln/sigmoid shapes — cosines, BM25, entropy's
  * ln(n) shift), which sit on a decimal half with probability ~ulp; and
  * raw double sums (money columns), where a decimal half is reachable
  * only through a binary-rational sum (the 0.125 class) AND the engines'
  * different summation orders must first agree to the last bit.
  */
object ExactPresent {

  /** round-half-up-away-from-zero(num/den) in pure int64 (den > 0).
    *
    * The ×2 headroom is CHECKED in-plan, not left to caller audits:
    * 2·|num|+den and 2·den must both fit int64, else Spark's non-ANSI
    * long arithmetic wraps silently while DuckDB widens to HUGEINT and
    * the engines diverge — the exact failure class this object exists
    * to eliminate. The guard is one codegen'd comparison per row
    * (the pqPartsQ in-plan-check precedent, Similarity.scala:384). */
  def roundHalfUpInt(num: Column, den: Column): Column = {
    val n = num.cast("long")
    val d = den.cast("long")
    // Each guard is ONE condition evaluated ONCE, then a single branch.
    // The first shipped shape wrapped num and den each in their own
    // when/raise_error and threaded the WRAPPED columns through the
    // arithmetic — every downstream reference replicated the full
    // guard+raise subtree, blowing the expression tree up ~10x and
    // costing 1.3-1.9x on per-row emissions (r14's t02-family
    // regression). Guards and semantics are unchanged: nulls pass
    // through, raise_error only on NON-null out-of-range values.
    val denOk = d > 0L && d <= Long.MaxValue / 2
    // the explicit MinValue exclusion closes abs()'s two's-complement
    // wrap (abs(MinValue) = MinValue < any bound — it would slip the
    // guard and corrupt q); MinValue is out of range anyway
    val numOk = n =!= Long.MinValue &&
      abs(n) <= idiv(lit(Long.MaxValue) - d, lit(2L))
    val q = idiv(abs(n) * lit(2L) + d, d * lit(2L)) *
      when(n < 0, lit(-1L)).otherwise(lit(1L))
    // den is validated FIRST: a null numerator must not mask a non-null
    // out-of-range denominator (the raise-on-any-non-null-bad-value
    // contract). A null den makes !denOk null, which CaseWhen skips,
    // falling through to the null branch — still one evaluation each.
    when(!denOk, raise_error(concat(
        lit("roundHalfUpInt: den out of range (0, 2^62]: "), d))
        .cast("long"))
      .when(n.isNull || d.isNull, lit(null).cast("long"))
      .when(numOk, q)
      .otherwise(raise_error(concat(
        lit("roundHalfUpInt: 2*|num|+den overflows int64: num="), n,
        lit(" den="), d)).cast("long"))
  }

  /** round(num/den, k) emitted as DOUBLE, exactly and engine-portably:
    * one int64 rounding, one double division by 10ᵏ. The ×10ᵏ scaling
    * is guarded in-plan: |num| must stay ≤ (2⁶³−1−den)/(2·10ᵏ), else
    * raise_error — a silent wrap here would make the Spark side wrong
    * while the DuckDB twin (HUGEINT) stays right. */
  def roundDiv(num: Column, den: Column, k: Int): Column = {
    require(k >= 0 && k <= 9, s"k: $k")
    val p = math.pow(10, k).toLong
    val n = num.cast("long")
    val d = den.cast("long")
    // Inlined rather than delegating to [[roundHalfUpInt]]: nesting the
    // guarded num column inside a second guarded function replicated the
    // whole roundDiv guard subtree at every roundHalfUpInt reference
    // (r14's t02-family regression). Guards are identical in strength:
    // |num| ≤ (MaxValue − den) / (2·10ᵏ)  ⇒  |num·10ᵏ|·2 + den fits, and
    // a fortiori num·10ᵏ itself fits (den ≥ 1); den ∈ (0, 2^62] keeps
    // 2·den in range. Each condition evaluates ONCE, then one branch.
    val denOk = d > 0L && d <= Long.MaxValue / 2
    // MinValue exclusion: see roundHalfUpInt (abs() wrap)
    val numOk = n =!= Long.MinValue &&
      abs(n) <= idiv(lit(Long.MaxValue) - d, lit(2L * p))
    val q = idiv(abs(n) * lit(2L * p) + d, d * lit(2L)) *
      when(n < 0, lit(-1L)).otherwise(lit(1L))
    // den first, so a null numerator cannot mask a bad denominator —
    // see [[roundHalfUpInt]] for the branch-order rationale.
    when(!denOk, raise_error(concat(
        lit("roundDiv: den out of range (0, 2^62]: "), d))
        .cast("double"))
      .when(n.isNull || d.isNull, lit(null).cast("double"))
      .when(numOk, q.cast("double") / lit(p.toDouble))
      .otherwise(raise_error(concat(
        lit(s"roundDiv: |num|*2*10^$k+den overflows int64: num="), n,
        lit(" den="), d)).cast("double"))
  }

  /** The DuckDB twin of [[roundDiv]] as SQL text (num/den are SQL
    * expressions; den > 0). `//` on the positive operands floors =
    * truncates, matching Spark's `div`. */
  def roundDivSql(num: String, den: String, k: Int): String = {
    require(k >= 0 && k <= 9, s"k: $k")
    val p = math.pow(10, k).toLong
    s"(CASE WHEN ($num) >= 0 THEN (2 * ($num) * $p + ($den)) // (2 * ($den)) " +
      s"ELSE -((-2 * ($num) * $p + ($den)) // (2 * ($den))) END / $p.0)"
  }

  private def idiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
}
