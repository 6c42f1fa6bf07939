package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew handling for LSH-style bucket self-joins.
  *
  * The failure mode at 100 TB: candidate generation is an equi-self-join on
  * a bucket id, and pair volume per bucket is n_b². AQE's skew-join split
  * cannot help — it splits *partitions*, but a single hot KEY (one 12-bit
  * SimHash band bucket over a boilerplate-heavy corpus slice, one dense LSH
  * hyperplane bucket) still lands its whole n_b² blow-up in one task.
  *
  * Salting scheme (pair set provably identical to the naive join):
  * each bucket of size n gets g = ⌈n / maxGroup⌉ salt groups; a member's
  * salt is hash(id) mod g. The LEFT side replicates each member g times,
  * once per target salt t ∈ [0, g); the RIGHT side keeps its own salt. Join
  * on (bucket, t = salt_right) with id_left < id_right. A pair (x, y),
  * x < y, is produced exactly once — by left-row x with t = salt(y) (the
  * mirrored left-row y, t = salt(x) fails the id ordering) — so the output
  * is the exact same pair SET, only spread over g² cells of ≤ maxGroup
  * right-rows each instead of one n_b²-pair task.
  */
object Skew {

  /** All same-bucket pairs (a, b) with a.`id` < b.`id`, as two struct
    * columns holding every non-key column. `df` columns = `keys` ++ payload
    * (payload must include `id`). Per-task right-side group size is bounded
    * by `maxGroup` (up to hash imbalance within a bucket). */
  def selfPairs(df: DataFrame, keys: Seq[String], id: String,
      maxGroup: Int): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val kc = keys.map(col)
    // one shuffle on the bucket key computes group sizes in-place
    val n = count(lit(1)).over(Window.partitionBy(kc: _*))
    val salted = df
      .select(kc :+ struct(payload.map(col): _*).as("p"): _*)
      .withColumn("g",
        greatest(lit(1L), ceil(n.cast("double") / maxGroup)).cast("int"))
      .withColumn("salt",
        pmod(xxhash64(col("p").getField(id)), col("g").cast("long")).cast("int"))
      // both join sides consume this; materialize once (bounded: input rows)
      .localCheckpoint()
    val left = salted
      .withColumn("t", explode(sequence(lit(0), col("g") - 1)))
      .select(kc :+ col("t") :+ col("p").as("a"): _*)
    val right = salted
      .select(kc :+ col("salt").as("t") :+ col("p").as("b"): _*)
    left.join(right, keys :+ "t")
      .where(col("a").getField(id) < col("b").getField(id))
      .select(col("a"), col("b"))
  }
}
