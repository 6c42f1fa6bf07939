package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

/** Q23 as-of join: the sort-merge union+window formulation must equal the
  * brute-force range join (latest click at-or-before each error, per user),
  * including errors with no prior click (null attach). */
class AsofSpec extends SparkSpec {

  test("q23 as-of equals the brute-force latest-at-or-before range join") {
    val asof = Relational.q23AsofJoin(spark, sf)
    val e = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        expr("CAST(ts DIV 1000 AS BIGINT)").as("tsn"),
        col("event_type"), col("value"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("tsn").as("ctsn"),
        col("event_id").as("cid"), col("value").as("cval"))
    val errors = e.where(col("event_type") === "error")
      .select("event_id", "user_id", "tsn")
    val brute = errors
      .join(clicks, col("user_id") === col("cu") && col("ctsn") <= col("tsn"),
        "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_id")
          .orderBy(col("ctsn").desc_nulls_last, col("cid").desc_nulls_last)))
      .where(col("rk") === 1)
      .select(col("event_id"), col("user_id"), col("tsn"),
        col("cid").as("click_id"), col("cval").as("click_value"))
    assert(asof.count() == errors.count()) // every error appears exactly once
    assert(asof.except(brute).isEmpty && brute.except(asof).isEmpty)
    // sanity: the as-of respects time (no click after its error)
    assert(asof.join(clicks, col("click_id") === col("cid"))
      .where(col("ctsn") > col("tsn")).isEmpty)
  }
}
