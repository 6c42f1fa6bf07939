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
  * The salt factor g is computed PER BUCKET inside the plan (from a
  * one-row-per-bucket histogram joined back — never an unbounded window
  * frame, which would buffer every row of a hot bucket in one task,
  * re-introducing the exact single-key pressure this module exists to
  * remove). A bucket at or under `maxGroup` gets g = 1, where the scheme
  * degenerates to the plain self-join by construction (the left side's
  * explode emits the single salt 0, the right side's hash-mod-1 is 0) — so
  * an unskewed corpus pays only the histogram join, and NO data-dependent
  * decision happens on the driver: constructing the plan fires no Spark
  * job beyond the [[graft.Materialize.pin]] policy sites, and composing
  * selfPairs inside a larger lazy pipeline stays lazy.
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
    // one row per bucket — a bounded aggregate, shuffled map-side-combined;
    // pinned because both join sides re-derive the salted frame from it
    // (pinning the tiny histogram instead of the full salted copy of the
    // data keeps executor memory ∝ bucket count, not corpus size — the
    // repeated packed ⋈ sizes join is a map-only pass over pinned blocks)
    val sizes = packed.groupBy(kc: _*).agg(count(lit(1)).as("__skew_n"))
      .transform(graft.Materialize.pin)
    // sizes is one row per bucket; as a plain equi-join AQE broadcasts it
    // when small (no mandatory-broadcast hint — same 8 GB-ceiling
    // rationale as the LSH candidate-attach joins)
    val salted = packed.join(sizes, keys)
      .withColumn("__skew_g", greatest(lit(1L),
        ceil(col("__skew_n").cast("double") / maxGroup)).cast("int"))
      .withColumn("__skew_salt",
        pmod(xxhash64(col("__skew_p").getField(id)),
          col("__skew_g").cast("long")).cast("int"))
    val left = salted
      .withColumn("__skew_t",
        explode(sequence(lit(0), col("__skew_g") - 1)))
      .select(kc :+ col("__skew_t") :+ col("__skew_p").as("__skew_a"): _*)
    val right = salted
      .select(kc :+ col("__skew_salt").as("__skew_t") :+
        col("__skew_p").as("__skew_b"): _*)
    val pairs = left.join(right, keys :+ "__skew_t")
    pairs
      .where(col("__skew_a").getField(id) < col("__skew_b").getField(id))
      .select(col("__skew_a").as("a"), col("__skew_b").as("b"))
  }
}
