package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Co-located joins via bucketing — the scale story made concrete: two
  * tables bucketed on the join key join WITHOUT any shuffle exchange
  * (prompt: "use broadcast() for small dims, repartition()/bucketing for
  * co-located joins"). At 100 TB this is the difference between a join that
  * moves both fact tables across the network and one that reads co-located
  * buckets. */
class BucketingSpec extends SparkSpec {

  test("fact-fact join on the bucket key plans with zero shuffle exchanges") {
    val orders = Tables.t(spark, sf, "orders")
    val li = Tables.t(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))

    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bkt")

    val joined = spark.table("orders_bkt")
      .join(spark.table("li_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_totalprice", "n_lines")

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected bucketed join without shuffle, got:\n$plan")

    // and it is still correct
    val expected = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
  }
}
