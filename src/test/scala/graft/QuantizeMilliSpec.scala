package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantizeMilli

/** The native quantizer must be value- and type-identical to the lambda
  * it replaced: `transform(v, x => round(cast(x as double)*1000)
  * .cast("long"))` — including HALF_UP ties, negatives, null arrays,
  * null elements, and the float→double widening. */
class QuantizeMilliSpec extends SparkSpec {

  test("parity with the transform/round lambda across edge shapes") {
    import spark.implicits._
    val rows: Seq[(Long, Option[Seq[Option[Float]]])] = Seq(
      (1L, Some(Seq(Some(0.1234567f), Some(-0.9876543f), Some(0.0f)))),
      (2L, Some(Seq(Some(0.0005f), Some(-0.0005f), Some(0.0015f)))), // ties
      (3L, Some(Seq(Some(1.5f), Some(-1.5f), Some(Float.MinPositiveValue)))),
      (4L, None),
      (5L, Some(Seq(None, Some(0.25f), None))),
      (6L, Some(Seq.empty))
    )
    val df = rows.toDF("id", "v")
    val out = df.select(
      col("id"),
      QuantizeMilli.quantize(col("v")).as("native"),
      transform(col("v"),
        x => round(x.cast("double") * 1000).cast("long")).as("composed"))
    assert(out.schema("native").dataType == out.schema("composed").dataType,
      out.schema.treeString)
    out.orderBy("id").collect().foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity broke: $r")
      if (!r.isNullAt(1))
        assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"value parity broke: $r")
    }
  }

  test("parity on a dense random grid (both float and double arrays)") {
    import spark.implicits._
    // deterministic pseudo-random floats spanning sign/magnitude
    val f = spark.range(0, 2000).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => (sin(col("id") * i * 0.7138) * 1.1).cast("float")).as("v"))
    val cmpF = f.select(
      QuantizeMilli.quantize(col("v")).as("n"),
      transform(col("v"),
        x => round(x.cast("double") * 1000).cast("long")).as("c"))
      .where(not(col("n") === col("c"))).count()
    assert(cmpF == 0L, s"$cmpF float rows diverge")
    val d = spark.range(0, 2000).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => sin(col("id") * i * 0.7138) * 1.1).as("v"))
    val cmpD = d.select(
      QuantizeMilli.quantize(col("v")).as("n"),
      transform(col("v"),
        x => round(x * 1000).cast("long")).as("c"))
      .where(not(col("n") === col("c"))).count()
    assert(cmpD == 0L, s"$cmpD double rows diverge")
  }

  test("generated code compiles (fallback disabled) and rejects bad input types") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark.range(0, 100).select(
        QuantizeMilli.quantize(transform(sequence(lit(1), lit(8)),
          i => (i * 0.001).cast("float"))).as("q"))
        .select(sum(element_at(col("q"), 1))).head.getLong(0)
      assert(s == 100L, s.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    val e = intercept[Exception] {
      spark.range(1).select(QuantizeMilli.quantize(array(lit("a")))).head
    }
    assert(e.getMessage.contains("array<float|double>"), e.getMessage)
  }
}
