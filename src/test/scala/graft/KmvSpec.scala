package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvMinK

/** The KMV distinct sketch's load-bearing properties: exact below
  * saturation, estimator accuracy at it, and MERGEABILITY — the result
  * must be a pure function of the value SET, independent of how rows are
  * split across partitions (that independence is what makes the k-long
  * partial state shuffle-safe). */
class KmvSpec extends SparkSpec {

  private val K = 64

  private def sketch(n: Int, parts: Int): (Long, Long) = {
    import spark.implicits._
    val df = (1 to n).map(i => s"v$i").toDF("v").repartition(parts)
      .select(graft.functions.Hashing.md5Long(col("v"), 15).as("h"))
    val r = df.agg(KmvMinK.kmvMinK(col("h"), K).as("s"))
      .select(KmvMinK.estimate(col("s"), K).as("est"),
        col("s").getField("held").cast("long").as("held"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("below saturation the sketch IS the exact distinct count") {
    val (est, held) = sketch(40, 8)
    assert(held == 40L && est == 40L)
  }

  test("estimate lands within the k-governed error bound; duplicates ignored") {
    import spark.implicits._
    for (n <- Seq(500, 5000)) {
      val (est, held) = sketch(n, 16)
      assert(held == K)
      // ±1/sqrt(k−2) ≈ 12.7% at k=64; allow 4σ — a deterministic check
      // (fixed hash function), generous enough to never flap
      assert(math.abs(est - n).toDouble / n < 0.5,
        s"n=$n est=$est — estimator off by ${math.abs(est - n) * 100 / n}%")
    }
    // duplicate VALUES must not move the sketch: same 500 distinct, 10x rows
    import spark.implicits._
    val dup = (1 to 5000).map(i => s"v${i % 500 + 1}").toDF("v")
      .select(graft.functions.Hashing.md5Long(col("v"), 15).as("h"))
      .agg(KmvMinK.kmvMinK(col("h"), K).as("s"))
      .select(KmvMinK.estimate(col("s"), K).as("est")).collect()(0).getLong(0)
    assert(dup == sketch(500, 16)._1)
  }

  test("partition-split invariance: 1, 4, and 32 partitions agree exactly") {
    val results = Seq(1, 4, 32).map(p => sketch(3000, p))
    assert(results.distinct.size == 1,
      s"sketch depends on partitioning: $results")
  }

  test("sketch algebra: merging grouped kmv_min_k_set arrays == one-pass sketch") {
    import spark.implicits._
    // raw rows with a grouping dimension (the 'hour' of q41)
    val df = (1 to 3000).map(i => (i % 24, s"v${i % 900 + 1}"))
      .toDF("cell", "v").repartition(16)
      .select(col("cell"), graft.functions.Hashing.md5Long(col("v"), 15).as("h"))
    // path A: one pass over raw rows
    val direct = df.agg(KmvMinK.kmvMinK(col("h"), K).as("s"))
      .select(KmvMinK.estimate(col("s"), K).as("est")).collect()(0).getLong(0)
    // path B: per-cell sketch arrays, then re-aggregate over the sketch
    // CONTENTS only — the pre-aggregation pattern
    val perCell = df.groupBy("cell")
      .agg(KmvMinK.kmvMinKSet(col("h"), K).as("sk"))
    val merged = perCell.select(explode(col("sk")).as("h"))
      .agg(KmvMinK.kmvMinKSet(col("h"), K).as("sk"))
      .select(KmvMinK.estimateFromSet(col("sk"), K).as("est"))
      .collect()(0).getLong(0)
    assert(merged == direct,
      s"sketch union must equal the one-pass sketch: $merged vs $direct")
    // the arrays themselves are the k minima, sorted ascending, distinct
    val arr = perCell.select(col("sk")).collect()
      .map(_.getSeq[Long](0))
    assert(arr.forall(a => a.length <= K && a == a.sorted &&
      a.distinct.length == a.length))
    // SQL surface parity (GraftExtensions registration)
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("kmv_alg_rows")
    val viaSql = spark.sql(
      s"SELECT kmv_min_k_set(h, $K) AS sk FROM kmv_alg_rows")
      .select(KmvMinK.estimateFromSet(col("sk"), K).as("est"))
      .collect()(0).getLong(0)
    assert(viaSql == direct)
  }
}
