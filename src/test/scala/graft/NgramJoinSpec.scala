package graft

import org.apache.spark.sql.functions._
import graft.functions.NgramJoin

/** The native n-gram builder must be value-identical to the composed
  * forms it replaced: `transform(sequence(1, size(ws)-n+1), i =>
  * array_join(slice(ws, i, n), ' '))` and the concat(element_at...)
  * sibling — for split() output (no null elements), across lengths
  * shorter than, equal to, and longer than n. */
class NgramJoinSpec extends SparkSpec {

  test("parity with transform/array_join across n and lengths") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("one")),
      (3L, Seq.empty[String]),
      (4L, Seq("x", "y")),
      (5L, Seq("multi word", "tokens", "here", "ok", "end")))
    for (n <- Seq(1, 2, 3, 5)) {
      val df = rows.toDF("id", "ws")
      val out = df.select(
        col("id"),
        NgramJoin.ngrams(col("ws"), n).as("native"),
        when(size(col("ws")) >= n,
          transform(sequence(lit(1), size(col("ws")) - (n - 1)),
            i => array_join(slice(col("ws"), i, lit(n)), " ")))
          .otherwise(array()).as("composed"))
      out.collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n parity broke: $r")
      }
    }
  }

  test("null array -> null (callers wrap in coalesce for the [] mapping)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Seq[String]])).toDF("id", "ws")
    assert(df.select(NgramJoin.ngrams(col("ws"), 2)).head.isNullAt(0))
    assert(df.select(coalesce(NgramJoin.ngrams(col("ws"), 2), array()))
      .head.getSeq[String](0).isEmpty)
  }

  test("generated code compiles (fallback disabled); rejects non-string arrays") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val s = spark.range(0, 500)
        .select(split(concat_ws(" ", lit("a"), col("id").cast("string"),
          lit("b")), " ").as("ws"))
        .select(explode(NgramJoin.ngrams(col("ws"), 2)).as("g"))
        .count()
      assert(s == 1000L, s.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
    val e = intercept[Exception] {
      spark.range(1).select(NgramJoin.ngrams(array(lit(1), lit(2)), 2)).head
    }
    assert(e.getMessage.contains("array<string>"), e.getMessage)
  }
}
