package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayDot.dotLong

/** Native codegen'd dot-product expression vs the higher-order-function
  * reference implementation. */
class ArrayDotSpec extends SparkSpec {

  import spark.implicits._

  test("dotLong equals the zip_with/aggregate reference on random vectors") {
    val df = spark.range(100).select(
      transform(sequence(lit(0), lit(63)),
        i => pmod(xxhash64(col("id") * 64 + i), lit(1000)) - 500).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => pmod(xxhash64(col("id") * 64 + i + 7), lit(1000)) - 500).as("b"))
    val out = df.select(
      dotLong(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("ref"))
    assert(out.where(col("fast") =!= col("ref")).isEmpty)
  }

  test("intersectCount equals the explode/join reference and compiles") {
    import graft.functions.ArrayIntersect.intersectCount
    // sorted distinct sets per row; fallback=false (SparkSpec) means a
    // codegen compile failure aborts this query instead of hiding in WARNs
    val df = spark.range(200).select(
      col("id"),
      array_sort(array_distinct(transform(sequence(lit(0), lit(19)),
        i => pmod(xxhash64(col("id") * 20 + i), lit(40))))).as("a"),
      array_sort(array_distinct(transform(sequence(lit(0), lit(19)),
        i => pmod(xxhash64(col("id") * 20 + i + 3), lit(40))))).as("b"))
    val out = df.select(
      intersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    assert(out.where(col("fast") =!= col("ref")).isEmpty)
  }

  test("intersectCountAtLeast: exact where kept, sentinel only below the " +
      "threshold, and compiles") {
    import graft.functions.ArrayIntersect.{intersectCount, intersectCountAtLeast}
    val df = spark.range(500).select(
      col("id"),
      array_sort(array_distinct(transform(sequence(lit(0), lit(19)),
        i => pmod(xxhash64(col("id") * 20 + i), lit(40))))).as("a"),
      array_sort(array_distinct(transform(sequence(lit(0), lit(19)),
        i => pmod(xxhash64(col("id") * 20 + i + 3), lit(40))))).as("b"))
    for (t <- Seq(0.0, 0.3, 0.9)) {
      val out = df.select(col("a"), col("b"),
        intersectCountAtLeast(col("a"), col("b"), t).as("fast"),
        intersectCount(col("a"), col("b")).as("ref"),
        size(col("a")).as("na"), size(col("b")).as("nb"))
        .withColumn("jref", col("ref").cast("double") /
          (col("na") + col("nb") - col("ref")))
      // every pair at or above the threshold keeps the exact count …
      assert(out.where(col("jref") >= t && col("fast") =!= col("ref")).isEmpty,
        s"threshold $t dropped or altered a qualifying pair")
      // … and the sentinel appears only strictly below it
      assert(out.where(col("fast") === -1L && col("jref") >= t).isEmpty)
      // non-sentinel values are always the exhaustive count
      assert(out.where(col("fast") =!= -1L && col("fast") =!= col("ref")).isEmpty)
    }
  }

  test("dotLong null propagation and empty arrays") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),
      (None, Some(Seq(1L))),
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])))
      .toDF("a", "b")
    val rows = df.select(dotLong(col("a"), col("b"))).collect()
    assert(rows(0).getLong(0) == 11L)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 0L)
  }
}
