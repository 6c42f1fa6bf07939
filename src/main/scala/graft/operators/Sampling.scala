package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Deterministic sampling / split assignment for training-mix construction
  * (SURVEY.md §7.6 north star: the step between curation and training).
  *
  * Everything here is HASH-derived, never RNG-derived: split assignment and
  * sampling decisions must be properties of the DOCUMENT, not of the run —
  * a reshuffle, a retry, a cluster resize, or a different engine must never
  * move a document across splits or flip its sampling decision (train/test
  * leakage). `rand(seed)` fails all of these (row-order dependent);
  * md5-derived buckets are stable everywhere, including in the DuckDB
  * oracle, which computes the identical values. */
object Sampling {

  /** Salted md5 bucket in [0, 100): independent decisions per salt from one
    * id (split assignment and sampling rate must not correlate — an
    * unsalted shared bucket would put every sampled-out document in the
    * same split region). */
  private def bucket(salt: String, id: Column): Column =
    (graft.functions.Hashing.md5Long(
      concat(lit(salt + ":"), id.cast("string")), 15) % 100).cast("int")

  /** sp01 — split assignment + per-language stratified sampling in one
    * map-only pass: bucket < 90 → train, < 95 → val, else test; languages
    * keep configured fractions (en 100%, fr 50%, de 25%, others 10%) — the
    * data-mixing knob of a corpus pipeline. Zero shuffle except the
    * presentation sort; at 100 TB this is scan-bandwidth-bound and
    * embarrassingly parallel, and the decisions are reproducible
    * bit-for-bit by any engine that can compute md5. */
  /** sp02 — per-source QUOTA sampling: keep at most `quota` documents per
    * source, best quality first — the mixing-cap that stops one crawl
    * domain / data vendor from dominating a training mix. The rank
    * functions sit alone in their window node, so the `rk <= quota`
    * filter plans as WindowGroupLimit: each input partition pre-prunes to
    * its own top-quota BEFORE the per-source shuffle (the q27/t06
    * machinery) — a hot source never buffers its whole document set in
    * one task. Ordering (quality DESC, doc_id) is total, so the kept set
    * is deterministic and engine-portable. */
  def sp02SourceQuota(spark: SparkSession, dir: String): DataFrame =
    sourceQuota(spark, dir, quota = 10)

  /** Library surface: per-source quota at a caller-chosen cap (the
    * declared query pins 10 for the oracle). One recipe with t06 — the
    * shared stratified top-k in [[TextAnalysis.qualityTopKBy]]. */
  def sourceQuota(spark: SparkSession, dir: String, quota: Int): DataFrame =
    TextAnalysis.qualityTopKBy(spark, dir, stratum = "source", k = quota)

  /** sp03 — temperature-based source mixing (the inverse-sqrt downsampling
    * of multilingual/multi-source training mixes): each source keeps its
    * documents with probability min(1, c/√n_source), so over-represented
    * sources are downweighted toward ∝ √n — the α=0.5 temperature knob —
    * while sources at or below c² docs are kept whole. The per-source
    * count table has one row per source (thousands at most against
    * billions of documents), so the count pass is a map-side-combined
    * aggregation whose shuffle carries sources, and the attach back is an
    * AQE broadcast join; the keep decision itself is the salted-md5 bucket
    * against a threshold — a property of the DOCUMENT and the corpus
    * composition, not of the run, so retries/resizes/engines agree.
    * Determinism across engines: √ and ÷ are IEEE-correctly-rounded, so
    * the double threshold 10000·min(1, c/√n) is bit-identical in Spark and
    * DuckDB and the strict `<` compare never straddles an engine. */
  def sp03TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(spark, dir, c = 3.0)

  /** Library surface: temperature mix at a caller-chosen c (the declared
    * query pins c=3 so both small and mid fixtures exercise real
    * downsampling). */
  def temperatureMix(spark: SparkSession, dir: String, c: Double): DataFrame = {
    require(c > 0, s"c: $c")
    val counts = t(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_source"))
    val kb = (graft.functions.Hashing.md5Long(
      concat(lit("mix:"), col("doc_id").cast("string")), 15) % 10000)
      .cast("int")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(counts, "source")
      .withColumn("kept", kb.cast("double") <
        lit(10000.0) * least(lit(1.0), lit(c) / sqrt(col("n_source"))))
      .select("doc_id", "source", "n_source", "kept")
      .orderBy("doc_id")
  }

  /** sp04 — training-sequence packing: concatenate each source's documents
    * in doc_id order and assign every document to the fixed-token-budget
    * bin its STARTING offset falls in (the GPT-style pack-then-chunk
    * doc→shard map: bin = floor(start_offset / budget)). One running-sum
    * window PARTITIONED BY SOURCE — packing parallelizes across sources
    * and never needs a corpus-wide single-task sort. A source hot enough
    * to bottleneck one task sub-shards first (partition by (source,
    * pmod(doc_id, k)) via [[packSequences]]' partition column) — bins are
    * then per-shard, which is what a sharded training run wants anyway. */
  def sp04PackSequences(spark: SparkSession, dir: String): DataFrame =
    packSequences(spark, dir, budget = 512)

  /** Library surface: sequence packing at a caller-chosen token budget
    * (the declared query pins 512 for the oracle). */
  def packSequences(spark: SparkSession, dir: String,
      budget: Long): DataFrame =
    packSequencesOf(t(spark, dir, "documents"), budget).orderBy("doc_id")

  /** Generic Of-surface: packing over ANY (doc_id, text, partitionCol)
    * frame; a hot partition value sub-shards by also passing e.g.
    * `pmod(col("doc_id"), lit(16))` pre-mixed into `partitionCol`. */
  def packSequencesOf(docs: DataFrame, budget: Long,
      partitionCol: String = "source"): DataFrame = {
    require(budget >= 1, s"budget: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCol).orderBy("doc_id")
    docs
      .select(col("doc_id"), col(partitionCol),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long")
          .as("n_tokens"))
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer division on both engines — no float rounding to straddle
      .withColumn("bin", expr(s"start_offset div $budget"))
      .select("doc_id", partitionCol, "n_tokens", "start_offset", "bin")
  }

  /** sp05 — exact per-stratum k-sample: exactly min(k, |stratum|)
    * documents per language, chosen by salted-md5 order — rate-based
    * sampling (sp01) cannot hit an exact count; this is the "give me
    * precisely 10k eval docs per language" shape. The md5 order key makes
    * the SAMPLE ITSELF a deterministic property of the corpus (reruns,
    * resizes, engines agree), and WindowGroupLimit prunes every partition
    * to its own top-k before the per-stratum shuffle — the t06/sp02
    * recipe, never a full sort. */
  def sp05StratifiedK(spark: SparkSession, dir: String): DataFrame =
    stratifiedK(spark, dir, k = 20)

  /** Library surface: exact stratified k-sample (the declared query pins
    * k=20 for the oracle). */
  def stratifiedK(spark: SparkSession, dir: String, k: Int): DataFrame =
    stratifiedKOf(t(spark, dir, "documents"), k).orderBy("lang", "rk")

  /** Generic Of-surface: exact k per stratum over ANY frame bearing
    * doc_id and `stratumCol`. */
  def stratifiedKOf(docs: DataFrame, k: Int,
      stratumCol: String = "lang"): DataFrame = {
    require(k >= 1, s"k: $k")
    val ord = graft.functions.Hashing.md5Long(
      concat(lit("strat:"), col("doc_id").cast("string")), 15)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(ord, col("doc_id"))
    docs
      .select(col("doc_id"), col(stratumCol))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(stratumCol, "rk", "doc_id")
  }

  /** sp06 — deterministic corpus shuffle into training shards: every
    * document gets a shard in [0, nShards) and a position within its
    * shard, BOTH hash-derived. This is the last step of a training
    * pipeline — the "global shuffle" that breaks source/time locality
    * before sequence packing — done without `rand()` (row-order
    * dependent, unrepeatable) and without a corpus-wide total sort (one
    * task at any scale). Two independent salts decorrelate placement
    * and order: a document's shard must not predict its position.
    * Scale contract: the within-shard sort is a per-shard window —
    * parallel across shards, one task per shard — so nShards is the
    * task-size knob: size it so a shard's documents fit a task
    * (100 TB / 10 GB-shards → ~10k shards), exactly how training shards
    * are sized anyway. Writing `writeCurated(out, path,
    * partitionCols=Seq("shard"), sortCols=Seq("pos"))` materializes the
    * shuffle as one ordered file set per shard. The (shard, pos) pair is
    * a pure document property: reruns, retries, cluster resizes, and the
    * DuckDB oracle all derive the identical global permutation. */
  def sp06ShuffleShard(spark: SparkSession, dir: String): DataFrame =
    shuffleShardOf(t(spark, dir, "documents"), nShards = 8)
      .orderBy("shard", "pos")

  /** Generic Of-surface: deterministic shuffle-shard over ANY frame with
    * an id column (the declared query pins nShards=8 for the oracle). */
  def shuffleShardOf(docs: DataFrame, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards: $nShards")
    val shard = pmod(graft.functions.Hashing.md5Long(
      concat(lit("shard:"), col(idCol).cast("string")), 15),
      lit(nShards.toLong)).cast("int")
    val ord = graft.functions.Hashing.md5Long(
      concat(lit("shuffle:"), col(idCol).cast("string")), 15)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("ord"), col(idCol))
    docs
      .select(col(idCol), shard.as("shard"), ord.as("ord"))
      .withColumn("pos", row_number().over(w))
      .select(idCol, "shard", "pos")
  }

  /** sp07 — context-window chunking: split every document's token stream
    * into windows of `window` tokens advancing by `stride` (overlap =
    * window − stride), the step that turns curated documents into
    * training-context rows (and RAG passages). Map-only: one explode per
    * document of ⌈len/stride⌉ rows — no shuffle, no state, so at 100 TB it
    * runs at scan speed and the output partitioning inherits the input's.
    * Window starts are 1, 1+stride, 2·stride+1, … while the start lands
    * inside the document, so every token is covered (stride ≤ window) and
    * the final window may be short — the standard pack-then-pad shape.
    * Chunk identity (doc_id, chunk) is position-derived, not run-derived:
    * reruns and the oracle enumerate identical windows. */
  def sp07ChunkWindows(spark: SparkSession, dir: String): DataFrame =
    chunkWindowsOf(t(spark, dir, "documents"), window = 40, stride = 30)
      .orderBy("doc_id", "chunk")

  /** Generic Of-surface: token-window chunking over ANY frame with an id
    * and a text column (the declared query pins 40/30 for the oracle). */
  def chunkWindowsOf(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1, s"window: $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window] or tokens are skipped: $stride")
    val ws = split(lower(trim(col(textCol))), "\\s+")
    docs
      .select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        // `div`, not `/`: Spark's / is always double division
        explode(sequence(lit(0),
          expr(s"(size(__ws) - 1) div $stride"))).as("__i"),
        col("__ws"))
      .withColumn("__start", col("__i") * stride + 1)
      .select(col(idCol), (col("__i") + 1).as("chunk"),
        size(slice(col("__ws"), col("__start"), lit(window))).as("n_tokens"),
        array_join(slice(col("__ws"), col("__start"), lit(window)), " ")
          .as("chunk_text"))
  }

  /** sp08 — EXACT weighted mixture: fill a document budget at declared
    * per-mille source proportions (the DoReMi-style static-weights mixing
    * knob). Where sp02 CAPS a source and sp03 FLATTENS the distribution,
    * sp08 hits stated targets: k_src = budget·w_src/1000 documents per
    * source, chosen best-salted-hash-first so the selection is a corpus
    * property (reruns, retries, and the oracle pick identical documents).
    * A source with fewer than k_src documents under-fills — capped at
    * what exists, never upsampled; re-normalize weights upstream if exact
    * totals matter more than exact proportions. All arithmetic is int64
    * (per-mille weights, integer division both engines) — no float
    * rounding to straddle an engine boundary.
    *
    * Scale shape: one per-source window (parallel across sources) + a
    * broadcast weights table (bounded by the source vocabulary) + a
    * 1-row corpus count. The declared query pins budget = |corpus|/10
    * and weights 400/300/200/100 over src0–src3 (unlisted sources drop —
    * weight zero). */
  def sp08WeightedMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val total = docs.agg(count(lit(1)).as("__n"))
    mixToWeightsOf(docs,
      Seq("src0" -> 400, "src1" -> 300, "src2" -> 200, "src3" -> 100),
      budget = expr("__n div 10"), budgetFrame = Some(total))
      .orderBy("source", "rk")
  }

  /** Library surface: exact weighted mixture over ANY frame with an id
    * and a source column. `weights` are per-mille; `budget` is the target
    * output size (a literal for the common call, or an expression over
    * `budgetFrame` — a 1-row frame cross-joined in, the declared query's
    * in-plan |corpus|/10). Emits (source, rk, id) with rk ≤ k_source. */
  def mixToWeightsOf(docs: DataFrame, weights: Seq[(String, Int)],
      budget: Column, budgetFrame: Option[DataFrame] = None,
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 1),
      s"per-mille weights must be >= 1: $weights")
    val spark = docs.sparkSession
    import spark.implicits._
    val wts = weights.toDF(srcCol, "__wm")
    val ranked = docs
      .withColumn("__ord", graft.functions.Hashing.md5Long(
        concat(lit("mix:"), col(idCol).cast("string")), 15))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(srcCol).orderBy(col("__ord"), col(idCol))))
    val budgeted = budgetFrame match {
      case Some(f) => ranked.crossJoin(broadcast(f))
      case None => ranked
    }
    budgeted
      .join(broadcast(wts), srcCol)
      .withColumn("__budget", budget.cast("long"))
      .withColumn("__k", expr("(__budget * __wm) div 1000"))
      .where(col("rk") <= col("__k"))
      .select(col(srcCol), col("rk"), col(idCol))
  }

  /** sp09 — EPOCH-weighted repetition (upsampling): where sp08 selects a
    * weighted SUBSET, sp09 materializes the doc→training-sequence map when
    * per-source epoch factors exceed 1 (the "2.5 epochs of curated, 0.3
    * epochs of crawl" mix every LLM data recipe publishes). A factor of
    * 2.5 means every doc appears twice and a deterministic 50% of docs a
    * third time — which docs get the extra copy is the salted-md5
    * per-mille bucket, a DOCUMENT property: retries, reshuffles, or a
    * different engine reproduce the identical replicated corpus. */
  def sp09EpochMix(spark: SparkSession, dir: String): DataFrame =
    epochMixOf(t(spark, dir, "documents"),
      Seq("src0" -> 2500, "src1" -> 1000, "src2" -> 300, "src3" -> 1500))
      .orderBy("doc_id", "copy")

  /** Library surface: epoch repetition over any (id, source) frame.
    * `epochsPermille` maps source → repetition factor in per-mille
    * (2500 = 2.5 epochs; 300 = keep 30% once; unlisted sources drop).
    * Emits (source, id, copy) with copy ∈ [1, n_copies].
    *
    * Scale shape: MAP-ONLY — broadcast weights join + per-row explode;
    * no shuffle at any corpus size. Output rows = Σ_s w_s·|s| by
    * construction, so the blow-up is declared, not emergent; n_copies is
    * bounded by max(w)/1000 + 1. Everything is int64 (per-mille weights,
    * integer division, md5 bucket) — bit-identical across engines. */
  def epochMixOf(docs: DataFrame, epochsPermille: Seq[(String, Int)],
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(epochsPermille.nonEmpty, "epochsPermille must be non-empty")
    require(epochsPermille.forall(_._2 >= 0),
      s"per-mille epoch factors must be >= 0: $epochsPermille")
    val spark = docs.sparkSession
    import spark.implicits._
    val wts = epochsPermille.toDF(srcCol, "__wm")
    docs.join(broadcast(wts), srcCol)
      .withColumn("__pm", graft.functions.Hashing.md5Long(
        concat(lit("epoch:"), col(idCol).cast("string")), 15) % 1000)
      .withColumn("n_copies", expr(
        "__wm div 1000 + (CASE WHEN __pm < __wm % 1000 THEN 1 ELSE 0 END)"))
      // sequence(1, 0) would generate a DESCENDING [1, 0] — the zero-copy
      // filter must run before the explode, not after
      .where(col("n_copies") > 0)
      .select(col(srcCol), col(idCol),
        explode(sequence(lit(1), col("n_copies"))).as("copy"))
  }

  /** sp10 — CURRICULUM ordering: a single contiguous training-order index
    * 1..N over the whole corpus by (quality DESC, doc_id) — easy examples
    * first, the schedule curriculum-learning trainers consume. The naive
    * formulation (`row_number() OVER (ORDER BY ...)`) is a one-task global
    * window — the exact anti-pattern at 100 TB. This computes the SAME
    * total order distributed: per-score-bucket ranks (a window PARTITIONED
    * by the rounded score — parallel) plus broadcast cumulative offsets
    * from the per-bucket counts. Only the offsets frame is single-task,
    * and it has one row per DISTINCT score (≤ 1001 at 3-decimal rounding)
    * at any corpus size. */
  def sp10Curriculum(spark: SparkSession, dir: String): DataFrame =
    curriculumOrderOf(
      t(spark, dir, "documents").select(col("doc_id"),
        TextAnalysis.quality(col("text")).as("quality")),
      scoreCol = "quality")
      .orderBy("seq")

  /** Library surface: exact global row number over (score DESC, id ASC)
    * for ANY scored frame, without a corpus-sized single-partition window.
    * Contract: `scoreCol` must be LOW-CARDINALITY (a rounded/bucketed
    * score) — the offsets side is one row per distinct value; a raw
    * unrounded double degrades it toward corpus size. Ties inside a score
    * rank by `idCol`, so the order is a pure data property (rerun- and
    * engine-stable, like every split/shuffle decision in this file). */
  def curriculumOrderOf(scored: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = scored.groupBy(scoreCol).agg(count(lit(1)).as("__n"))
    // tiny frame (distinct scores): the unpartitioned window is bounded
    // by the score's cardinality, not the corpus
    val off = cnt.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.orderBy(col(scoreCol).desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(scoreCol), col("__off"))
    val w = Window.partitionBy(scoreCol).orderBy(idCol)
    scored.join(broadcast(off), Seq(scoreCol))
      .withColumn("seq", col("__off") + row_number().over(w))
      .select(col(idCol), col(scoreCol), col("seq"))
  }

  /** sp11 — per-source TOKEN-BUDGET selection: each source contributes its
    * best-quality documents until a token budget is exhausted — the
    * "compose a 500B-token mix from these sources" primitive, where caps
    * are expressed in tokens (what trainers actually buy), not document
    * counts (sp02's quota). A document is admitted iff the budget was not
    * already spent BEFORE it in (quality DESC, doc_id) order, so the kept
    * set is a pure data property and the last admitted document may
    * straddle the budget (truncation is the trainer's call, not the
    * sampler's).
    *
    * Scale shape: the naive form is a per-source cumulative-sum window —
    * a single task buffering an entire source (billions of documents for
    * a big crawl). This computes the SAME running sum distributed, the
    * sp10 two-level trick re-keyed by (source, quality bin): within-bin
    * windows are partitioned by (source, quality) — parallel across bins —
    * and the cross-bin prefix comes from a per-(source, bin) token-total
    * frame (bounded by sources × ≤1001 rounded scores at ANY corpus size)
    * that broadcasts onto the scan. */
  def sp11TokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSelect(spark, dir, budget = 2000L)

  /** Library surface: per-source token budget at a caller-chosen budget
    * (the declared query pins 2000 so both fixtures exercise real
    * exhaustion). */
  def tokenBudgetSelect(spark: SparkSession, dir: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget: $budget")
    val ws = split(lower(trim(col("text"))), "\\s+")
    val scored = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), size(ws).cast("long").as("n_tokens"),
        TextAnalysis.quality(col("text")).as("quality"))
    // per-(source, quality-bin) token totals; strictly-better bins form
    // the prefix offset. The offsets frame is tiny and the window inside
    // it is bounded by distinct scores per source, never by documents.
    val binTotals = scored.groupBy("source", "quality")
      .agg(sum("n_tokens").as("__tq"))
    val offW = Window.partitionBy("source").orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = binTotals.withColumn("__off",
      coalesce(sum(col("__tq")).over(offW), lit(0L)))
      .select(col("source"), col("quality"), col("__off"))
    val inW = Window.partitionBy("source", "quality").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(off), Seq("source", "quality"))
      .withColumn("cum_tokens", col("__off") + sum("n_tokens").over(inW))
      .where(col("cum_tokens") - col("n_tokens") < budget)
      .select("doc_id", "source", "quality", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** sp12 — STRIDE-SCHEDULED source interleaving: the materialized
    * data-loader ORDER for a weighted mix. sp08 decides WHICH documents a
    * weighted mixture keeps; sp12 decides the sequence they stream in so
    * that EVERY prefix of the training order holds the declared source
    * proportions to O(1) — within ±2 documents per source at any horizon,
    * the bound the spec asserts (the textbook ±1 stride bound holds for
    * the virtual times alone; the (v, source, rk) tie-break can shift one
    * more document across a prefix cut) — no "all of source A, then all
    * of B" drift, no RNG. Classic stride scheduling: document k of source
    * s (in salted-hash order) gets virtual time v = k·10⁶ div w_s; the
    * global order is (v, source, rk). Heavier sources take smaller
    * strides, so they appear proportionally more often at every horizon.
    *
    * Scale shape: one per-source window for the rank (parallel across
    * sources, same as sp08), a broadcast weights table, and v is a pure
    * map expression; there is NO global sequence window — v itself IS the
    * order key, so downstream consumers sort/range-partition on (v,
    * source, rk), and cutting the first N positions of the mix is a
    * filter on v against a threshold, not a rank computation. */
  def sp12InterleaveMix(spark: SparkSession, dir: String): DataFrame =
    interleaveMixOf(t(spark, dir, "documents"),
      Seq("src0" -> 400, "src1" -> 300, "src2" -> 200, "src3" -> 100))
      .orderBy("v", "source", "rk")

  /** Library surface: stride-scheduled interleave over ANY frame with an
    * id and a source column; `weights` are per-mille shares (sources not
    * listed drop — weight zero). Emits (id, source, rk, v); stream in
    * (v, source, rk) order. */
  def interleaveMixOf(docs: DataFrame, weights: Seq[(String, Int)],
      srcCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 >= 1),
      s"per-mille weights must be >= 1: $weights")
    val spark = docs.sparkSession
    import spark.implicits._
    val wts = weights.toDF(srcCol, "__wm")
    docs
      .join(broadcast(wts), srcCol)
      .withColumn("__ord", graft.functions.Hashing.md5Long(
        concat(lit("mix:"), col(idCol).cast("string")), 15))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(srcCol).orderBy(col("__ord"), col(idCol))))
      // rk is a 32-bit row_number: widen BEFORE the multiply — at a
      // billion-document source rk·10⁶ overflows int by six orders
      .withColumn("v", expr("(CAST(rk AS BIGINT) * 1000000) div __wm"))
      .select(col(idCol), col(srcCol), col("rk").cast("long").as("rk"),
        col("v"))
  }

  /** sp13 — PRIORITY SAMPLING (Duffield–Lund–Thorup): a weighted
    * WITHOUT-replacement sample of k documents that is simultaneously an
    * unbiased subset-sum ESTIMATOR — the "audit 50 documents but still
    * estimate total tokens per source" primitive. Where sp08 hits declared
    * per-source counts and sp05 takes per-stratum k, sp13 weights by SIZE:
    * each item draws priority p = w/u with u a salted-md5 uniform in
    * (0, 1]; the global top-k by priority is the sample, and est_w =
    * max(w, τ) with τ the (k+1)-th priority makes Σ est_w over the sample
    * an unbiased estimate of Σ w over the corpus (big items enter
    * near-certainly with est = their weight; small items ride u's tail
    * and est = τ compensates the inclusion probability w/τ).
    *
    * Determinism across engines, deliberately: u = (h+1)/2⁶⁰ from the
    * shared md5 recipe, and every float step is IEEE-exact — (h+1) casts
    * once, /2⁶⁰ is a pure exponent shift, w/u is one correctly-rounded
    * division — so Spark and the DuckDB oracle agree on priorities BIT
    * FOR BIT, not approximately. `rand()`-based reservoirs can't replay;
    * this can.
    *
    * Scale shape: the top-(k+1) plans as TakeOrderedAndProject — each
    * input partition retains k+1 candidates, no global sort materializes.
    * The only single-task step is the rank over the ALREADY-REDUCED k+1
    * rows (driver-bounded by the sample size, not the corpus); τ joins
    * back by broadcast of a 1-row frame. */
  def sp13PrioritySample(spark: SparkSession, dir: String): DataFrame =
    prioritySampleOf(
      t(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          greatest(col("n_chars"), lit(1L)).as("w")),
      k = 50)
      .orderBy("doc_id")

  /** Library surface: priority sample of k rows from ANY frame with an id
    * and a positive int64 weight column. Passes every input column
    * through and appends `est_w` (the DLT estimator: Σ est_w over the
    * output is an unbiased estimate of Σ w over the input; per-group sums
    * of est_w estimate the group totals). With ≤ k input rows the sample
    * is the whole input and est_w = w exactly (τ = 0). */
  def prioritySampleOf(items: DataFrame, k: Int, idCol: String = "doc_id",
      wCol: String = "w"): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1: $k")
    val h = graft.functions.Hashing.md5Long(
      concat(lit("prio:"), col(idCol).cast("string")), 15)
    // (h+1) ∈ [1, 2^60]: the cast rounds to 53 bits, the 2^60 divide is
    // an exact exponent shift, and w/u is one IEEE division — every step
    // correctly rounded, so the oracle's priorities are bit-identical
    val prio = col(wCol).cast("double") /
      ((h + lit(1L)).cast("double") / lit(1152921504606846976.0))
    val top = items.withColumn("__p", prio)
      .orderBy(col("__p").desc, col(idCol)).limit(k + 1)
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("__p").desc, col(idCol))
    val ranked = top.withColumn("__rn", row_number().over(rankW))
    val tau = ranked.agg(coalesce(
      max(when(col("__rn") === k + 1, col("__p"))), lit(0.0)).as("__tau"))
    ranked.where(col("__rn") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("est_w", round(
        greatest(col(wCol).cast("double"), col("__tau")), 3))
      .drop("__p", "__rn", "__tau")
  }

  def sp01SplitSample(spark: SparkSession, dir: String): DataFrame = {
    val sb = bucket("split", col("doc_id"))
    val kb = bucket("sample", col("doc_id"))
    val keepRate = when(col("lang") === "en", 100)
      .when(col("lang") === "fr", 50)
      .when(col("lang") === "de", 25)
      .otherwise(10)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("split_bucket", sb)
      .withColumn("split",
        when(col("split_bucket") < 90, "train")
          .when(col("split_bucket") < 95, "val")
          .otherwise("test"))
      .withColumn("kept", kb < keepRate)
      .select("doc_id", "lang", "split", "kept")
      .orderBy("doc_id")
  }

  /** sp14 — PREFERENCE-PAIR construction: per source, pair the i-th best
    * document with the i-th worst (rank-symmetric pairing by quality),
    * keeping pairs whose quality margin clears a floor — the
    * (chosen, rejected) dataset a reward model trains on, built
    * deterministically from a scored corpus (no sampling noise: the pair
    * set is a pure data property, re-runs and engines agree exactly).
    * Rank-symmetric pairing maximizes the summed margin over all perfect
    * matchings of top-half to bottom-half (sorted-sequence pairing), so
    * the pairs are the most-informative ones this corpus can yield.
    *
    * Scale shape: the per-source quality rank is the sp10/sp11 two-level
    * trick, NOT a per-source window over the corpus (a single task
    * buffering a billion-document crawl source is the hazard): within-
    * (source, score) windows run parallel across score bins, cross-bin
    * offsets come from a (source, score)-cardinality frame (≤ sources ×
    * 1001 rounded scores) that BROADCASTS onto the scan; the final
    * top↔bottom match is an equi-join on (source, pair index). */
  def sp14PreferencePairs(spark: SparkSession, dir: String): DataFrame =
    preferencePairsOf(t(spark, dir, "documents"), minMargin = 0.001)

  /** Library surface: rank-symmetric preference pairs over ANY
    * (doc_id, source, text) frame. */
  def preferencePairsOf(docs: DataFrame, minMargin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned (r17): consumed by the (source, q) histogram AND the ranked
    // join — unpinned, the quality-scoring scan ran once per consumer
    val scored = docs.select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.quality(col("text")).as("q"))
      .transform(graft.Materialize.pin)
    val cnt = scored.groupBy("source", "q").agg(count(lit(1)).as("__n"))
    val off = cnt.withColumn("__off",
      coalesce(sum(col("__n")).over(Window.partitionBy("source")
        .orderBy(col("q").desc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("q"), col("__off"))
    val tot = cnt.groupBy("source").agg(sum("__n").as("__tot"))
    // pinned (r17): both the top half and the bottom half read this —
    // unpinned, the rank window (and everything under it) ran twice
    val ranked = scored
      .join(broadcast(off), Seq("source", "q"))
      .withColumn("rk", col("__off") + row_number().over(
        Window.partitionBy("source", "q").orderBy("doc_id")))
      .join(broadcast(tot), "source")
      .transform(graft.Materialize.pin)
    val top = ranked.where(col("rk") <= floor(col("__tot") / 2))
      .select(col("source"), col("rk").as("i"),
        col("doc_id").as("chosen_id"), col("q").as("q_chosen"))
    val bot = ranked
      .select(col("source"), (col("__tot") - col("rk") + 1).as("i"),
        col("doc_id").as("rejected_id"), col("q").as("q_rejected"))
    top.join(bot, Seq("source", "i"))
      .withColumn("margin", round(col("q_chosen") - col("q_rejected"), 3))
      .where(col("margin") >= minMargin)
      .select(col("source"), col("i"), col("chosen_id"),
        col("rejected_id"), col("margin"))
      .orderBy("source", "i")
  }

  /** sp15 — EXPONENT-SMOOTHED mixture rates (the multilingual α-smoothing
    * rule: sampling probability ∝ n^α normalized to the LARGEST group, so
    * the dominant language keeps everything and smaller ones are damped
    * toward it — the rebalancing used to train multilingual encoders).
    * Distinct from [[sp03TemperatureMix]], which is the BUDGET rule
    * (absolute per-doc keep cap c/√n, reported per doc): sp15 computes
    * the relative mixture WEIGHTS (per-group ppm rates + realized kept
    * counts — the report a mix designer reads), anchored so α only
    * reshapes the ratio between groups, never the ceiling. Keep decisions
    * are salted-hash acceptance per doc (sp01's rule) — deterministic,
    * re-run- and engine-stable, no rand().
    *
    * α is deliberately 1/2: sqrt is IEEE-correctly-rounded, so
    * `floor(10⁶·√n/√nmax)` is bit-identical across engines — a pow(n, α)
    * temperature would round differently engine-to-engine at the ppm
    * boundary. (For other temperatures, precompute the ppm table
    * driver-side and broadcast it — the acceptance rule is unchanged.)
    *
    * Scale shape: source cardinalities are one map-side-combined
    * aggregation to a |sources|-row table; rates broadcast back onto the
    * scan; acceptance is a codegen'd per-row predicate; the report is a
    * second |sources|-row aggregation. No window, no corpus shuffle. */
  def sp15TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    // lang, not source: the fixture's sources are uniform (temperature
    // mixing would be the identity); languages are skewed (en ≈ 2.7× de)
    // — and language rebalancing IS the canonical use of this rule
    temperatureMixOf(t(spark, dir, "documents"), groupCol = "lang")
      .orderBy("lang")

  /** Library surface: temperature mix over ANY frame with a group column
    * and a unique id. Output per group: size, keep rate (ppm), kept. */
  def temperatureMixOf(docs: DataFrame, groupCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val n = docs.groupBy(groupCol).agg(count(lit(1)).as("n_docs"))
    val mx = n.agg(max("n_docs").as("__mx"))
    val rates = n.crossJoin(broadcast(mx))
      .withColumn("rate_ppm",
        floor(lit(1000000.0) * sqrt(col("n_docs").cast("double")) /
          sqrt(col("__mx").cast("double"))).cast("long"))
      .select(col(groupCol), col("n_docs"), col("rate_ppm"))
    val kept = docs.select(col(groupCol), col(idCol))
      .join(broadcast(rates.select(col(groupCol), col("rate_ppm"))),
        Seq(groupCol))
      .where(graft.functions.Hashing.md5Long(
        concat(lit("alpha:"), col(idCol).cast("string")), 15) % 1000000L
        < col("rate_ppm"))
      .groupBy(groupCol).agg(count(lit(1)).as("n_kept"))
    // kept is a |groups|-row aggregate — broadcast it explicitly (post-agg
    // frames carry no size stats, so the static planner would SMJ here)
    rates.join(broadcast(kept), Seq(groupCol), "left")
      .select(col(groupCol), col("n_docs"), col("rate_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** sp15b — GENERAL-α temperature mixture rates (r10 directive #3): the
    * same α-smoothing rule as [[temperatureMixOf]] at ANY rational
    * temperature α = p/q, engine-exact. sp15 pinned α = 1/2 because sqrt
    * is the one IEEE-correctly-rounded power; the general path instead
    * computes the |groups|-row ppm table ON THE DRIVER with exact BigInt
    * arithmetic — rate_ppm = ⌊10⁶·(n/nmax)^{p/q}⌋ as the largest r with
    * r^q · nmax^p ≤ 10^{6q} · n^p (a 20-step integer binary search, no
    * floating point anywhere) — and broadcasts it as a literal local
    * relation. The acceptance rule is unchanged (sp01's salted-hash ppm
    * predicate, same salt as sp15, so keep decisions NEST monotonically
    * across temperatures: for n < nmax the rate (n/nmax)^α FALLS as α
    * rises, so LOWERING α only ever adds documents — α = 0 keeps
    * everything, α = 1 is the most aggressive damping in the range).
    *
    * Scale shape: one map-side-combined |groups|-row aggregate is the
    * only driver fetch; the ppm table re-attaches by broadcast equi-join
    * (PlanAuditSpec-gated — no corpus shuffle); acceptance is the same
    * codegen'd predicate as sp15; the report is a second |groups|-row
    * aggregate. The declared query pins α = 1/4 on documents.lang; the
    * DuckDB oracle replays the identical integers via
    * ⌊(10²⁴·n ÷ nmax)^{1/4}⌋ = isqrt(isqrt(10²⁴·n ÷ nmax)) in HUGEINT
    * with a ±2 correction around the double-sqrt seed (nested-floor
    * identity: ⌊√⌊x⌋⌋ = ⌊√x⌋ for any real x ≥ 0). */
  def sp15bTemperatureMixQuarter(spark: SparkSession, dir: String): DataFrame =
    temperatureMixAtOf(t(spark, dir, "documents"), alphaNum = 1,
      alphaDen = 4, groupCol = "lang").orderBy("lang")

  /** Library surface: temperature mix at rational α = alphaNum/alphaDen
    * over ANY frame with a group column (castable to string) and a unique
    * id. Output per group: size, keep rate (ppm), kept — [[temperatureMixOf]]'s
    * report shape. α ∈ [0, 1]: since rate = (n/nmax)^α and n ≤ nmax, α = 0
    * keeps every document in every group (the identity mix), α = 1 samples
    * each group at its proportional rate n/nmax (keeping ~n²/nmax of it),
    * and intermediate α interpolate — raising α only ever REMOVES
    * documents (keep sets nest downward in α). A NULL group value is its
    * own group: null rows are counted, rated, and returned like any other
    * (the join key is null-coalesced internally; the output group column
    * keeps the original null). */
  def temperatureMixAtOf(docs: DataFrame, alphaNum: Int, alphaDen: Int,
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val rates = ratesAtOf(docs, alphaNum, alphaDen, groupCol)
    val kept = docs
      .select(nullSafeGroup(col(groupCol)).as(groupCol), col(idCol))
      .join(broadcast(rates.select(col(groupCol), col("rate_ppm"))),
        Seq(groupCol))
      .where(alphaAccept(col(idCol)) < col("rate_ppm"))
      .groupBy(groupCol).agg(count(lit(1)).as("n_kept"))
    rates.join(broadcast(kept), Seq(groupCol), "left")
      .select(unsentinel(col(groupCol)).as(groupCol), col("n_docs"),
        col("rate_ppm"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Per-document keep DECISIONS at rational α — the acceptance half of
    * [[temperatureMixAtOf]], exposed so a pipeline can ACT on the mix
    * instead of only reading its report: EVERY input row comes back with
    * `kept`, with the original group column untouched — including rows
    * whose group is NULL (joined via an internal null-coalesced key, so
    * SQL null-join semantics can't drop them silently). Same exact-BigInt
    * ppm table, same salted-hash rule — a doc kept here is counted in the
    * report's `n_kept`, definitionally. */
  def temperatureKeepAtOf(docs: DataFrame, alphaNum: Int, alphaDen: Int,
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val rates = ratesAtOf(docs, alphaNum, alphaDen, groupCol)
    // The internal join key must not collide with a caller column: a
    // fixed "__g" would silently overwrite (then drop) a pre-existing
    // "__g" in the caller's frame, violating the every-row-comes-back
    // contract for that column. NUL-prefixed names can't appear in any
    // sane schema; extend until free for the pathological caller.
    val gk = {
      var n = "\u0000g"
      while (docs.columns.contains(n)) n += "\u0000"
      n
    }
    docs
      .withColumn(gk, nullSafeGroup(col(groupCol)))
      .join(broadcast(rates.select(col(groupCol).as(gk),
        col("rate_ppm"))), Seq(gk))
      .withColumn("kept", alphaAccept(col(idCol)) < col("rate_ppm"))
      .drop("rate_ppm", gk)
  }

  /** NULL group values must survive the rate join (SQL equi-join on a
    * null key matches nothing — the advisor's row-loss finding), so every
    * internal group key is coalesced to this sentinel and the report maps
    * it back to a real null on the way out. A leading NUL byte can't appear in any
    * fixture string and makes accidental collision with a real group name
    * practically impossible. */
  private[graft] val NullGroupSentinel = "\u0000<null-group>"
  private def nullSafeGroup(g: Column): Column =
    coalesce(g.cast("string"), lit(NullGroupSentinel))
  private def unsentinel(g: Column): Column =
    when(g === lit(NullGroupSentinel), lit(null: String)).otherwise(g)

  /** The shared α-smoothing acceptance hash (sp01's salted rule — one
    * salt across temperatures, so keep sets nest monotonically in α). */
  private def alphaAccept(id: Column): Column =
    graft.functions.Hashing.md5Long(
      concat(lit("alpha:"), id.cast("string")), 15) % 1000000L

  /** The shared exact ppm table: one bounded |groups|-row driver fetch,
    * rates by integer binary search (largest r with
    * r^q·nmax^p ≤ 10^{6q}·n^p — no floating point), returned as a
    * literal local relation ready to broadcast. */
  private def ratesAtOf(docs: DataFrame, alphaNum: Int,
      alphaDen: Int, groupCol: String): DataFrame = {
    require(alphaDen >= 1 && alphaNum >= 0 && alphaNum <= alphaDen,
      s"alpha = $alphaNum/$alphaDen must be a rational in [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    // Aggregate on the RAW group (null is its own group under Spark
    // aggregation) and coalesce to the sentinel DRIVER-side, after a
    // guard: post-coalesce a real group equal to the sentinel would be
    // indistinguishable from null, so the in-band magic value must be
    // proven absent first — one string compare per group, making the
    // "practically impossible" collision impossible (r12 verdict nit).
    val raw = docs.groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    require(!raw.exists(_._1.contains(NullGroupSentinel)),
      s"temperature mix: a group value equals the internal null sentinel")
    val counts = raw.map { case (g, n) => (g.getOrElse(NullGroupSentinel), n) }
    require(counts.nonEmpty, "temperature mix: empty corpus")
    val mx = counts.map(_._2).max
    val mxp = BigInt(mx).pow(alphaNum)
    def ratePpm(n: Long): Long = {
      val rhs = BigInt(10).pow(6 * alphaDen) * BigInt(n).pow(alphaNum)
      var lo = 0L; var hi = 1000000L
      while (lo < hi) {
        val mid = (lo + hi + 1) / 2
        if (BigInt(mid).pow(alphaDen) * mxp <= rhs) lo = mid else hi = mid - 1
      }
      lo
    }
    counts.toSeq.map { case (g, n) => (g, n, ratePpm(n)) }
      .toDF(groupCol, "n_docs", "rate_ppm")
  }

  /** sp16 — LENGTH-BUCKETED BATCHING census (the dynamic-batching /
    * padding-waste audit): every document lands in the smallest
    * power-of-two token-capacity bucket that holds it (floor 16, ceiling
    * 2²¹ — anything longer overflows into the top bucket), and each bucket
    * reports doc count, longest member, token mass, and the padding a
    * fixed-capacity batch at that bucket would waste. This is the survey a
    * pipeline runs before choosing batch shapes: padding cost is
    * `1 − sum_tokens / (n_docs·cap)` per bucket, and a heavy-waste bucket
    * says "split this range further" while near-zero waste says buckets
    * can merge. One map-side-combined groupBy on a computed integer key —
    * a single shuffle of ≤ 18 rows regardless of corpus size; everything
    * else is integer arithmetic inside whole-stage codegen, with the one
    * ratio an ExactPresent.roundDiv. */
  def sp16LengthBuckets(spark: SparkSession, dir: String): DataFrame =
    lengthBucketsOf(t(spark, dir, "documents"))

  /** Generic library surface: the padding census over ANY (text) frame. */
  def lengthBucketsOf(docs: DataFrame): DataFrame = {
    val caps: Seq[Long] = (4 to 21).map(1L << _)
    val n = size(TextAnalysis.toks).cast("long")
    // smallest cap ≥ n: innermost otherwise is the overflow ceiling
    val cap = caps.init.reverse.foldLeft(lit(caps.last): Column) {
      (acc, c) => when(n <= c, lit(c)).otherwise(acc)
    }
    docs.select(cap.as("bucket_cap"), n.as("n"))
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"), max(col("n")).as("max_len"),
        sum(col("n")).as("sum_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("bucket_cap") - col("sum_tokens"))
      .withColumn("pad_ratio", ExactPresent.roundDiv(col("pad_tokens"),
        col("n_docs") * col("bucket_cap"), 3))
      .orderBy("bucket_cap")
  }
}
