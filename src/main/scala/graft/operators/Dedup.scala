package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Deduplication operators for training-data pipelines (SURVEY.md §7.6):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash — over `documents.text`.
  *
  * Scale design (the reason each variant exists):
  *  - dd01 exact: one hash-groupBy shuffle on a 32-byte fingerprint; at
  *    100 TB the shuffle carries (fp, doc_id) pairs only, never the text.
  *  - dd02 n-gram Jaccard: exact all-pairs scoring with per-doc sorted
  *    hash-set arrays and a native two-pointer intersection expression —
  *    zero shuffle, pure codegen. (An inverted-index join on shingles costs
  *    Σ_shingle df(s)² shuffled rows and loses badly when the vocabulary is
  *    hot; measured 5× slower here.) Quadratic in documents by nature.
  *  - dd03 MinHash+LSH: the scale path. K=16 min-wise hashes → 8 bands of 2;
  *    candidate pairs only where a band collides, then exact-Jaccard
  *    verification of candidates only. Hash family is md5-derived modular
  *    hashing — deterministic and engine-portable, so even the probabilistic
  *    candidate set is bit-identical between Spark and the DuckDB oracle.
  *  - dd04/dd05 SimHash: 32-bit signatures; near-dup = Hamming ≤ 4 found via
  *    4×8-bit band blocking (pigeonhole: Hamming ≤ 4 over 4 bands ⇒ some
  *    band is... — NOT exact for ≤4; it is the standard recall/blocking
  *    trade-off, and deterministic, so the oracle computes the identical set).
  *
  * All hashing goes through md5 hex (identical in every engine); the only
  * numeric tower is int64 modular arithmetic — no float drift anywhere until
  * the final ROUND(jaccard, 3) presentation column.
  */
object Dedup {

  /** Modulus for min-wise hashing (2^31 − 1, prime). */
  private val P = 2147483647L
  private val K = 16 // minhash signature length
  private val R = 2  // rows per band → 8 bands

  /** Distinct word-bigram shingles per doc: (doc_id, s). */
  private def shingles(spark: SparkSession, dir: String): DataFrame = {
    val ws = TextAnalysis.toks
    val grams = when(size(col("ws")) >= 2,
      transform(sequence(lit(1), size(col("ws")) - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1))))
      .otherwise(array())
    t(spark, dir, "documents")
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), explode(grams).as("s"))
      .distinct()
  }

  /** 60-bit integer hash of a string via md5 (engine-portable: DuckDB
    * computes CAST('0x'||substr(md5(s),1,15) AS BIGINT)). */
  private def md5Long(s: Column, hexChars: Int): Column =
    conv(substring(md5(s), 1, hexChars), 16, 10).cast("long")

  /** dd01 — exact dedup: normalize → fingerprint → keep the min doc_id per
    * fingerprint group. Window over fp = one shuffle on the fingerprint. */
  def dd01Exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("fp")
    t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
      .orderBy("doc_id")
  }

  /** Distinct shingles hashed to int64 — all set operations downstream run
    * on fixed-width longs, not strings (cheaper movement, codegen-friendly
    * comparisons). Collision probability over |shingle vocab|² / 2⁶⁴ is
    * negligible at any realistic corpus. */
  private def hashedShingles(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir).select(col("doc_id"), xxhash64(col("s")).as("hs"))

  /** Each doc's shingle set as ONE sorted array<bigint> row. Intersections
    * are then a codegen'd two-pointer merge per pair
    * ([[graft.functions.ArrayIntersect]]) — no exploded join, no
    * Σ|A∩B|-row shuffle. */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    hashedShingles(spark, dir)
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("hs"))).as("set"))
      // consumed twice (streamed side + broadcast side of the pair join);
      // materialize once instead of replicating the shingle pipeline
      .localCheckpoint()

  /** Scored candidate pairs: size prefilter, then the codegen'd two-pointer
    * intersection. c ≤ min(|A|,|B|) implies J ≤ min/max, so pairs with
    * min/max < sizeRatioMin can never reach that Jaccard — the O(|A|+|B|)
    * merge is skipped for size-mismatched pairs at the cost of two
    * comparisons. Emits the raw Jaccard as `jraw`. */
  private def scoredPairs(pairs: DataFrame, sizeRatioMin: Double): DataFrame = {
    import graft.functions.ArrayIntersect.intersectCount
    pairs
      .withColumn("na", size(col("seta")).cast("long"))
      .withColumn("nb", size(col("setb")).cast("long"))
      .where(least(col("na"), col("nb")).cast("double") /
        greatest(col("na"), col("nb")) >= sizeRatioMin)
      .withColumn("c", intersectCount(col("seta"), col("setb")))
      .withColumn("jraw",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
  }

  /** Jaccard ≥ threshold (raw-value cut, oracle-parity for dd02/dd03). */
  private def jaccardOfPairs(pairs: DataFrame, threshold: Double): DataFrame =
    scoredPairs(pairs, threshold)
      .where(col("jraw") >= threshold)
      .select(col("ida"), col("idb"), round(col("jraw"), 3).as("jaccard"))
      .orderBy("ida", "idb")

  /** dd02 — n-gram Jaccard near-dup, exact: all pairs scored by the native
    * sorted-merge intersection. The doc-set side broadcasts (|docs|·|set|·8 B);
    * the pair loop is O(n²·set) primitive ops with zero shuffle. Quadratic by
    * nature — the exact baseline; dd03 is the sub-quadratic scale path. */
  private def allPairs(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingleSets(spark, dir)
    // repartition the STREAMED side: the doc corpus arrives as few parquet
    // splits, and a nested-loop pair join is only as parallel as the
    // streamed side's partition count
    val a = sets.select(col("doc_id").as("ida"), col("set").as("seta"))
      .repartition(64, col("ida"))
    val b = sets.select(col("doc_id").as("idb"), col("set").as("setb"))
    a.join(broadcast(b), col("ida") < col("idb"))
  }

  def dd02NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardOfPairs(allPairs(spark, dir), 0.3)

  /** Near-dup LOSERS at rounded Jaccard ≥ `roundedMin` — the curation-path
    * variant: the size prefilter is pushed down to the strict threshold
    * (J ≥ 0.9 needs min/max ≥ 0.8995, so the −0.01 margin skips the merge
    * for nearly every pair a loose prefilter would admit), and the final
    * filter is on the ROUNDED value, matching the oracle's post-round cut. */
  private[operators] def nearDupLosers(spark: SparkSession, dir: String,
      roundedMin: Double): DataFrame =
    scoredPairs(allPairs(spark, dir), roundedMin - 0.01)
      .where(round(col("jraw"), 3) >= roundedMin)
      .select(col("idb").as("doc_id")).distinct()

  /** dd03 — MinHash+LSH near-dup: shingle → K min-wise hashes → band-bucket
    * join → exact-Jaccard verification of the (tiny) candidate set. The
    * banding join shuffles only (band, k1, k2, doc_id) tuples — at 100 TB
    * this is the formulation that survives; dd02's inverted index does not
    * once document frequency grows. */
  def dd03MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val hashed = sh.select(col("doc_id"), xxhash64(col("s")).as("hs"),
      (md5Long(col("s"), 15) % P).as("hm"))
    // one pass per doc: the sorted shingle set AND all K minhashes
    val sigCols = (1 to K).map { j =>
      val a = (j * 2654435761L) % P
      val b = (j * 40503L + 7) % P
      min((lit(a) * col("hm") + lit(b)) % P).as(s"m$j")
    }
    // materialize the per-doc signatures once: sig feeds the band self-join
    // (both sides) AND both set broadcasts — left as a pure plan the whole
    // shingle pipeline is replicated 4-8x (verified: 8 parquet scans).
    // localCheckpoint trades fault-tolerance for speed (blocks are not
    // recomputable after executor loss): right for this bounded |docs|-row
    // aggregate; a spot-instance deployment would use reliable checkpointing
    val sig = hashed.groupBy("doc_id")
      .agg(sort_array(collect_set(col("hs"))).as("set"), sigCols: _*)
      .localCheckpoint()
    val bandStructs = (0 until K / R).map { b =>
      struct(lit(b).as("band"), col(s"m${2 * b + 1}").as("k1"),
        col(s"m${2 * b + 2}").as("k2"))
    }
    val bands = sig.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band"), col("bd.k1"), col("bd.k2"))
    val cand = bands.select(col("doc_id").as("ida"), col("band"), col("k1"), col("k2"))
      .join(bands.select(col("doc_id").as("idb"), col("band"), col("k1"), col("k2")),
        Seq("band", "k1", "k2"))
      .where(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    // exact-Jaccard verification of the candidates only, via the native
    // sorted-merge intersection on the per-doc sets
    val sets = sig.select(col("doc_id"), col("set"))
    val pairs = cand
      .join(broadcast(sets.select(col("doc_id").as("ida"), col("set").as("seta"))),
        Seq("ida"))
      .join(broadcast(sets.select(col("doc_id").as("idb"), col("set").as("setb"))),
        Seq("idb"))
    jaccardOfPairs(pairs, 0.3)
  }

  /** Per-doc 32-bit SimHash signature frame: (doc_id, simhash). */
  private def simhashSig(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), explode(TextAnalysis.toks).as("w"))
      .distinct()
    val hashed = tok.withColumn("h", md5Long(col("w"), 8))
    val bits = hashed
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("j"))
      .groupBy("doc_id", "j")
      .agg(sum(when(expr("shiftright(h, j) & 1") === 1, 1).otherwise(-1)).as("v"))
      .withColumn("bit", when(col("v") >= 0, 1L).otherwise(0L))
    bits.groupBy("doc_id")
      .agg(sum(expr("bit * shiftleft(cast(1 as bigint), j)")).as("simhash"))
      // both sides of the band self-join consume this; materialize once
      .localCheckpoint()
  }

  /** dd04 — SimHash signatures (the per-document sketch; 32 bits here, 64 in
    * production — the plan shape is identical). */
  def dd04Simhash(spark: SparkSession, dir: String): DataFrame =
    simhashSig(spark, dir).orderBy("doc_id")

  /** dd05 — SimHash near-dup pairs: block on 4×8-bit bands, verify
    * Hamming ≤ 4 via bit_count(xor). */
  def dd05SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSig(spark, dir)
    val bands = sig
      .select(col("doc_id"), col("simhash"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bk", expr("shiftright(simhash, band * 8) & 255"))
    // hamming filter BEFORE distinct: it depends only on (ha, hb), so
    // filtering the (duplicated) band-collision rows first shrinks the
    // distinct's input by the filter selectivity
    bands.select(col("doc_id").as("ida"), col("simhash").as("ha"),
        col("band"), col("bk"))
      .join(bands.select(col("doc_id").as("idb"), col("simhash").as("hb"),
        col("band"), col("bk")), Seq("band", "bk"))
      .where(col("ida") < col("idb"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .where(col("hamming") <= 4)
      .select("ida", "idb", "hamming").distinct()
      .orderBy("ida", "idb")
  }
}
