package graft.operators

import org.apache.spark.sql.DataFrame
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
  *
  * When NO bucket exceeds `maxGroup` the whole salting apparatus is skipped
  * and the join is the plain bucket self-join — an unskewed corpus pays one
  * cheap bucket-histogram aggregation (one row per bucket), not the
  * explode/replicate bookkeeping. Bucket sizes come from a groupBy count
  * joined back, never from an unbounded window frame: a window would buffer
  * every row of a hot bucket in a single task — re-introducing the exact
  * single-key pressure this module exists to remove.
  */
object Skew {

  /** Internal working-column names; caller frames must not use them. The
    * OUTPUT columns `a`/`b` are fine as input names — the pair structs live
    * under __skew_a/__skew_b until the final select, after every input
    * column has been packed away or dropped. */
  private val Reserved =
    Seq("__skew_p", "__skew_n", "__skew_g", "__skew_salt", "__skew_t",
      "__skew_a", "__skew_b")

  /** All same-bucket pairs (a, b) with a.`id` < b.`id`, as two struct
    * columns holding every non-key column. `df` columns = `keys` ++ payload
    * (payload must include `id`); any names except the `__skew_*` internals
    * are allowed. Per-task right-side group size is bounded by `maxGroup`
    * (up to hash imbalance within a bucket). */
  def selfPairs(df: DataFrame, keys: Seq[String], id: String,
      maxGroup: Int): DataFrame = {
    val clash = df.columns.intersect(Reserved)
    require(clash.isEmpty,
      s"selfPairs reserves column names ${Reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    val payload = df.columns.filterNot(keys.contains)
    val kc = keys.map(col)
    // both join sides (and the size histogram) consume this; materialize
    // once (bounded: input rows)
    val packed = df
      .select(kc :+ struct(payload.toIndexedSeq.map(col): _*).as("__skew_p"): _*)
      .transform(graft.Materialize.pin)
    // one row per bucket — a bounded aggregate, shuffled map-side-combined
    val sizes = packed.groupBy(kc: _*).agg(count(lit(1)).as("__skew_n"))
    val maxN = Option(sizes.agg(max("__skew_n")).collect()(0).get(0))
      .fold(0L)(_.asInstanceOf[Long])
    val pairs =
      if (maxN <= maxGroup) {
        // unskewed fast path: no salt columns, no left-side replication —
        // the plain bucket self-join, with per-task pair volume already
        // bounded by maxGroup²
        packed.select(kc :+ col("__skew_p").as("__skew_a"): _*)
          .join(packed.select(kc :+ col("__skew_p").as("__skew_b"): _*), keys)
      } else {
        // sizes is one row per bucket; as a plain equi-join AQE broadcasts
        // it when small (no mandatory-broadcast hint — same 8 GB-ceiling
        // rationale as the LSH candidate-attach joins)
        val salted = packed.join(sizes, keys)
          .withColumn("__skew_g", greatest(lit(1L),
            ceil(col("__skew_n").cast("double") / maxGroup)).cast("int"))
          .withColumn("__skew_salt",
            pmod(xxhash64(col("__skew_p").getField(id)),
              col("__skew_g").cast("long")).cast("int"))
          .transform(graft.Materialize.pin)
        val left = salted
          .withColumn("__skew_t",
            explode(sequence(lit(0), col("__skew_g") - 1)))
          .select(kc :+ col("__skew_t") :+ col("__skew_p").as("__skew_a"): _*)
        val right = salted
          .select(kc :+ col("__skew_salt").as("__skew_t") :+
            col("__skew_p").as("__skew_b"): _*)
        left.join(right, keys :+ "__skew_t")
      }
    pairs
      .where(col("__skew_a").getField(id) < col("__skew_b").getField(id))
      .select(col("__skew_a").as("a"), col("__skew_b").as("b"))
  }
}
