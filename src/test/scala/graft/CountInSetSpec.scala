package graft

import org.apache.spark.sql.functions._
import graft.functions.CountInSet

/** The native count-in-set expression must be value- and type-identical
  * to the higher-order composition it replaced
  * (`size(filter(ws, w => w.isin(words)))`) — including duplicates
  * (multiplicity counts), null elements (dropped), null arrays (null
  * out), empty arrays (0), and the empty-match case. */
class CountInSetSpec extends SparkSpec {

  private val words = Seq("the", "a", "of")

  test("parity with size(filter(isin)) across edge shapes") {
    import spark.implicits._
    val rows: Seq[(Long, Option[Seq[Option[String]]])] = Seq(
      (1L, Some(Seq(Some("the"), Some("cat"), Some("the"), Some("a")))),
      (2L, Some(Seq(Some("dog")))),
      (3L, Some(Seq.empty)),
      (4L, None),
      (5L, Some(Seq(None, Some("the"), None))),
      (6L, Some(Seq(Some("THE"), Some("tHe")))) // case-sensitive: no match
    )
    val df = rows.toDF("id", "ws")
    val out = df.select(
      col("id"),
      CountInSet.countIn(col("ws"), words).as("native"),
      size(filter(col("ws"), w => w.isin(words: _*))).as("composed"))
    // type parity: both INT
    assert(out.schema("native").dataType == out.schema("composed").dataType,
      out.schema.treeString)
    val got = out.orderBy("id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity broke: $r")
      if (!r.isNullAt(1))
        assert(r.getInt(1) == r.getInt(2), s"value parity broke: $r")
    }
    // and the expected values themselves, pinned
    val byId = got.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(byId == Map(1L -> 3, 2L -> 0, 3L -> 0, 4L -> -1, 5L -> 1, 6L -> 0))
  }

  test("runs inside whole-stage codegen (no interpreted fallback crash)") {
    import spark.implicits._
    // a wide range forces actual generated-loop execution across batches
    val df = spark.range(0, 10000)
      .select(col("id"), split(concat_ws(" ",
        lit("the"), col("id").cast("string"), lit("of")), " ").as("ws"))
    val s = df.select(sum(CountInSet.countIn(col("ws"), words))).head.getLong(0)
    assert(s == 20000L, s"expected 2 matches per row: $s")
  }

  test("the generated code actually COMPILES (fallback would hide it)") {
    // a janino error silently drops the whole stage to the interpreted
    // path — correctness survives, performance doesn't, and nothing
    // fails. Disabling fallback turns a codegen bug into a hard error.
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(0, 100)
        .select(split(concat_ws(" ",
          lit("the"), col("id").cast("string")), " ").as("ws"))
      val s = df.select(sum(CountInSet.countIn(col("ws"), words)))
        .head.getLong(0)
      assert(s == 100L, s.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("non-UTF8_BINARY and non-string-array inputs fail analysis, not counting") {
    import spark.implicits._
    // the probe is byte-equality; on a collated array the composed twin
    // would be collation-aware — reject at analysis instead of silently
    // diverging (ADVICE r15)
    val collated = spark.range(1)
      .select(expr("array(collate('The', 'UTF8_LCASE'))").as("ws"))
    val e = intercept[Exception] {
      collated.select(CountInSet.countIn(col("ws"), words)).head
    }
    assert(e.getMessage.contains("UTF8_BINARY"), e.getMessage)
    val wrong = spark.range(1).select(array(lit(1), lit(2)).as("ws"))
    val e2 = intercept[Exception] {
      wrong.select(CountInSet.countIn(col("ws"), words)).head
    }
    assert(e2.getMessage.contains("array<string>"), e2.getMessage)
  }
}
