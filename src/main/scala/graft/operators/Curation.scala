package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The fused training-data curation pipeline — what the individual
  * dedup/quality operators exist FOR at 100 TB: one declarative plan that
  * keeps a document iff it is (a) the canonical representative of its exact
  * fingerprint group, (b) above the quality threshold, and (c) not the
  * later twin of a near-duplicate pair (word-bigram Jaccard ≥ 0.9).
  *
  * Composing the operators as DataFrames lets Catalyst fuse the scans: the
  * quality and fingerprint branches share the documents scan, and the
  * near-dup branch routes through the MinHash-LSH banded candidates (the
  * dd03 scale path — sub-quadratic, no BroadcastNestedLoopJoin anywhere in
  * the plan), with exact-Jaccard verification of candidates only. Anti-join
  * for removal keeps the plan broadcast-friendly — the near-dup id set is
  * tiny relative to the corpus. */
object Curation {

  def c01Curation(spark: SparkSession, dir: String): DataFrame =
    curate(spark, dir, minQuality = 0.3, nearDupJaccard = 0.9)

  /** Library surface: the fused pairwise curation with caller-chosen
    * thresholds (the declared query pins 0.3/0.9 for the oracle). */
  def curate(spark: SparkSession, dir: String, minQuality: Double,
      nearDupJaccard: Double): DataFrame = {
    val quality = TextAnalysis.t02Quality(spark, dir)
      .select("doc_id", "quality")
    val keepers = Dedup.dd01Exact(spark, dir)
      .where(col("keep")).select("doc_id")
    val nearDupLosers = Dedup.lshNearDupLosers(spark, dir,
      roundedMin = nearDupJaccard)
    quality
      .join(keepers, "doc_id")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .where(col("quality") >= minQuality)
      .orderBy("doc_id")
  }

  /** c02 — CLUSTER-canonical curation: keep a document iff it is the
    * canonical representative (smallest doc_id) of its transitive near-dup
    * cluster per dd06, and above the quality threshold. This is the
    * principled form of near-dup removal: c01's pairwise loser-removal can
    * drop BOTH members of a pair that bridge two clusters, while cluster
    * assignment keeps exactly one survivor per connected component —
    * singletons included, at no extra cost (they are their own cluster).
    * The join is canonical-rep ∧ quality — Catalyst pushes the quality
    * filter below the join and shares the documents scan between the
    * quality and signature branches. */
  def c02ClusterCuration(spark: SparkSession, dir: String): DataFrame =
    curateClustered(spark, dir, minQuality = 0.3)

  /** Library surface: cluster-canonical curation at a caller-chosen
    * quality threshold (the declared query pins 0.3 for the oracle). */
  def curateClustered(spark: SparkSession, dir: String,
      minQuality: Double): DataFrame =
    TextAnalysis.t02Quality(spark, dir)
      .select("doc_id", "quality")
      .join(Dedup.dd06NearDupClusters(spark, dir)
        .where(col("cluster") === col("doc_id")).select("doc_id"), Seq("doc_id"))
      .where(col("quality") >= minQuality)
      .orderBy("doc_id")

  /** c03 — SEMANTIC dedup curation (the SemDeDup shape): where c01/c02
    * remove lexical near-duplicates (shared n-grams), c03 removes
    * semantically redundant documents — pairs whose EMBEDDINGS are close
    * even when their text differs (paraphrases, translations, templated
    * rewrites). Pipeline: k-means-assign every vector to its nearest
    * centroid cell (ss07), compute exact cosine only WITHIN cells (the IVF
    * trade that makes the quadratic local: Σ n_c² with cells bounded by
    * recursing the quantizer), drop the later twin of every pair at
    * cosine ≥ 0.4, and quality-gate the survivors. The cell assignment,
    * intra-cell pair set, and integer dot products are all deterministic,
    * so the semantic-loser set is bit-reproducible against the oracle. */
  def c03SemanticCuration(spark: SparkSession, dir: String): DataFrame =
    curateSemantic(spark, dir, minQuality = 0.3, minCos = 0.4)

  /** Library surface: semantic curation at caller-chosen thresholds (the
    * declared query pins 0.3/0.4 for the oracle). */
  def curateSemantic(spark: SparkSession, dir: String, minQuality: Double,
      minCos: Double): DataFrame =
    TextAnalysis.t02Quality(spark, dir)
      .select("doc_id", "quality")
      .join(Similarity.semanticNearDupLosers(spark, dir, minCos),
        Seq("doc_id"), "left_anti")
      .where(col("quality") >= minQuality)
      .orderBy("doc_id")

  /** c04 — benchmark DECONTAMINATION: flag every corpus document whose
    * verbatim n-gram overlap with a held-out benchmark set reaches
    * `minShared` distinct grams — the step a training pipeline runs so
    * eval data cannot leak into the training mix. The declared query
    * treats doc_id % 97 == 0 as the benchmark (6 docs at sf0.01) with
    * 3-token grams and minShared = 2; production decontamination uses
    * longer windows (8–13 tokens — this fixture's synthetic text has no
    * verbatim 8-gram collisions at all, so the declared query pins the
    * width where overlap is actually observable).
    *
    * Scale shape: the benchmark gram set is |bench|·|grams/doc| rows —
    * tiny relative to any corpus, so the equi-join on the 64-bit gram
    * hash broadcasts at runtime (no mandatory hint, same 8 GB-ceiling
    * stance as everywhere else); the corpus side is one map-only gram
    * pass plus a per-doc count aggregate (map-side combined). Document
    * text never crosses the wire — only (doc_id, gram-hash) pairs. */
  def c04Decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminate(spark, dir, col("doc_id") % 97 === 0,
      ngramTokens = 3, minShared = 2)

  /** Library surface: decontamination with a caller-chosen benchmark
    * predicate — evaluated against the FULL documents row (doc_id, text,
    * lang, source, n_chars), so `col("source") === "eval-vendor"` works,
    * not just doc_id arithmetic. Emits every NON-benchmark document with
    * its shared-gram count. The benchmark id set is resolved once against
    * the documents scan and semi/anti-joined onto the gram stream (the id
    * set is small by definition of a benchmark — it broadcasts). */
  def decontaminate(spark: SparkSession, dir: String, isBenchmark: Column,
      ngramTokens: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared: $minShared")
    val docs = graft.sources.Tables.t(spark, dir, "documents")
    // both the gram anti-join and the final corpus anti-join consume the
    // benchmark id set; unpinned, each consumer re-scans documents (Spark
    // does not share subplans across joins) — pinned, the predicate scan
    // runs once and both runtime broadcasts build from the pinned rows
    val benchIds = docs.where(isBenchmark).select("doc_id")
      .transform(graft.Materialize.pin)
    val grams = Dedup.hashedNgrams(spark, dir, ngramTokens)
    // tokenize ONLY the benchmark subset for the gram set — the previous
    // semi-join formulation ran the full-corpus tokenize+hash pass twice
    // (once here, once for `shared` below), doubling the dominant cost
    val benchGrams = Dedup.hashedNgramsOf(docs.where(isBenchmark),
        ngramTokens)
      .select("hs").distinct()
    // grams are distinct per doc and benchGrams is distinct, so the join
    // emits each (doc, shared gram) once — count(1) IS the distinct count
    val shared = grams.join(benchIds, Seq("doc_id"), "left_anti")
      .join(benchGrams, "hs")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.select("doc_id")
      .join(benchIds, Seq("doc_id"), "left_anti")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= minShared)
      .orderBy("doc_id")
  }

  /** c09 — PASSAGE-level benchmark decontamination: the ACTION step c04
    * stops short of. c04 flags whole documents for n-gram overlap; c09
    * CUTS the overlapping passages and keeps the rest of the document —
    * the right call when a long, otherwise-clean document quotes one
    * benchmark item (dropping the whole doc wastes data; keeping it
    * verbatim leaks eval). Chunking is dd15's shared [[Dedup.passageChunks]]
    * definition (20-token non-overlapping passages for the declared
    * query), so "scrubbed passage" here and "duplicate passage" there can
    * never disagree about boundaries. A corpus passage is removed when
    * its text equals ANY passage of any benchmark document.
    *
    * Scale shape: dd15's economics — the membership test is a LEFT ANTI
    * join of text-free (doc_id, idx, ph) 24 B rows against the benchmark
    * passage-hash set (tiny by definition of a benchmark: it broadcasts
    * at runtime, no mandatory hint); passage text crosses the wire once,
    * in the doc_id-keyed re-attach join, group size = the document.
    * Document text never rides a ph-keyed shuffle. */
  def c09BenchmarkScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.t(spark, dir, "documents")
    passageDecontaminateOf(docs.where(col("doc_id") % 97 =!= 0),
      docs.where(col("doc_id") % 97 === 0), passageTokens = 20)
      .orderBy("doc_id")
  }

  /** Library surface: passage-level scrub of `corpus` against
    * `benchmark` at a caller-chosen passage length (the declared query
    * pins 20 and the doc_id % 97 benchmark split, matching c04/c06).
    * Output per corpus document: (doc_id, n_passages, n_kept,
    * clean_text); fully-scrubbed documents report n_kept = 0 and
    * clean_text = NULL. */
  def passageDecontaminateOf(corpus: DataFrame, benchmark: DataFrame,
      passageTokens: Int): DataFrame = {
    require(passageTokens >= 1, s"passageTokens: $passageTokens")
    val chunks = Dedup.passageChunks(passageTokens)
    val chunked = corpus
      .select(col("doc_id"), TextAnalysis.toks.as("ws"))
      .select(col("doc_id"), chunks.as("ps"))
    // text-free corpus side: hash passages in place, carry (doc_id, idx, ph)
    val keyed = chunked.select(col("doc_id"),
      posexplode(transform(col("ps"), p => xxhash64(p)))
        .as(Seq("idx", "ph")))
      // pinned (r17): dd15's stance — text-free (doc_id, idx, ph) rows
      // feed the anti-join and ride into the kept aggregate
      .transform(graft.Materialize.pin)
    val benchPh = benchmark
      .select(TextAnalysis.toks.as("ws"))
      .select(explode(chunks).as("passage"))
      .select(xxhash64(col("passage")).as("ph")).distinct()
    val kept = keyed.join(benchPh, Seq("ph"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        sort_array(collect_list(col("idx"))).as("__kept_idx"))
    chunked.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ps")).cast("long").as("n_passages"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        when(size(col("__kept_idx")) > 0, array_join(
          transform(col("__kept_idx"),
            i => element_at(col("ps"), i + 1)), " "))
          .as("clean_text"))
  }

  /** c07 — per-source CONTAMINATION REPORT: c04's per-document flags
    * rolled up by source — documents checked, documents contaminated,
    * worst shared-gram count, and an integer per-mille rate. This is the
    * triage view a pipeline owner actually reads: "which vendor/crawl is
    * leaking the benchmark" decides whether to drop documents (c04) or an
    * entire source. Declared query pins c04's exact parameters, so the
    * two queries are one gram pass apart by construction. */
  def c07ContaminationReport(spark: SparkSession, dir: String): DataFrame =
    contaminationReport(spark, dir, col("doc_id") % 97 === 0,
      ngramTokens = 3, minShared = 2)

  /** Library surface: the c04 rollup at caller-chosen benchmark predicate
    * and gram parameters. All ratio arithmetic is int64 (per-mille,
    * integer division) — engine-portable. Scale shape: everything heavy
    * is [[decontaminate]]'s plan; the rollup adds one map-side-combined
    * aggregate over (source) — output rows = |source vocabulary|. */
  def contaminationReport(spark: SparkSession, dir: String,
      isBenchmark: Column, ngramTokens: Int, minShared: Int): DataFrame = {
    val flags = decontaminate(spark, dir, isBenchmark, ngramTokens,
      minShared)
    val src = graft.sources.Tables.t(spark, dir, "documents")
      .select("doc_id", "source")
    flags.join(src, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L))
          .as("n_contaminated"),
        max("n_shared").as("max_shared"))
      .withColumn("contaminated_permille",
        expr("(n_contaminated * 1000) div n_docs"))
      .orderBy("source")
  }

  /** c06 — EMBEDDING-level decontamination: where c04 removes training
    * documents that share literal n-grams with a benchmark, c06 removes
    * documents whose EMBEDDING is close to any benchmark vector —
    * catching the paraphrased/translated/reformatted contamination that
    * defeats lexical matching (the same lexical→semantic escalation as
    * c01/c02 → c03). The declared query flags vec_id % 97 == 0 as the
    * benchmark set (c04's predicate shape) and marks cosine ≥ 0.4 as
    * contaminated. Exact, not ANN: a benchmark is small by definition, so
    * the right 100 TB plan is the broadcast scan in
    * [[Similarity.benchmarkMaxCos]] — one corpus pass, map-side-combined
    * max, no candidate-recall trade on a correctness-critical filter. */
  def c06EmbeddingDecontaminate(spark: SparkSession, dir: String): DataFrame =
    embeddingDecontaminate(spark, dir, col("vec_id") % 97 === 0,
      minCos = 0.4)

  /** Library surface: embedding decontamination at a caller-chosen
    * benchmark predicate (over the full embeddings row) and cosine
    * threshold. Emits every non-benchmark vector with its max benchmark
    * cosine; with an empty benchmark set, max_cos is null and nothing is
    * contaminated. */
  def embeddingDecontaminate(spark: SparkSession, dir: String,
      isBenchmark: Column, minCos: Double): DataFrame =
    Similarity.benchmarkMaxCos(spark, dir, isBenchmark)
      .select(col("vec_id"), col("max_cos"),
        coalesce(col("max_cos") >= minCos, lit(false)).as("contaminated"))
      .orderBy("vec_id")

  /** c05 — cluster-balanced (diversity) sampling: the best-quality k
    * documents of EVERY embedding cluster — the coverage-balanced mix
    * step (a quality-only cut over-samples whatever content type scores
    * well; taking k per k-means cell keeps every content region
    * represented). Reuses ss07's one-Lloyd-round assignment (broadcast
    * centroids, map-side-collapsed argmax) joined to the shared quality
    * score; per-cell top-k rides WindowGroupLimit, the t06/sp02 recipe.
    * At scale the join carries (doc_id, cell) × (doc_id, quality) — two
    * narrow frames on the same key; text and vectors stay in place. */
  def c05DiverseSample(spark: SparkSession, dir: String): DataFrame =
    diverseSample(spark, dir, k = 5)

  /** Library surface: diversity sample at a caller-chosen per-cell k (the
    * declared query pins 5 for the oracle). */
  def diverseSample(spark: SparkSession, dir: String, k: Int): DataFrame = {
    require(k >= 1, s"k: $k")
    val cells = Similarity.ss07KmeansAssign(spark, dir)
      .select(col("vec_id").as("doc_id"), col("assigned"))
    val quality = TextAnalysis.t02Quality(spark, dir)
      .select("doc_id", "quality")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("assigned").orderBy(col("quality").desc, col("doc_id"))
    cells.join(quality, "doc_id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("assigned", "rk", "doc_id", "quality")
      .orderBy("assigned", "rk")
  }

  /** c08 — LEAKAGE-SAFE train/val split: the split decision is hashed on
    * the document's near-dup CLUSTER (dd06), not the document — so a
    * near-duplicate pair can never straddle the boundary. Per-document
    * hashing (sp01) leaks: with 90/10 odds a duplicated document's twin
    * lands in the other split ~18% of the time, and eval rows the model
    * effectively trained on inflate every metric. Cluster-keyed hashing
    * makes "same content → same split" a structural property.
    *
    * Scale shape: dd06's cluster labels are the expensive part and are
    * already the curation pipeline's intermediate; the split itself is one
    * md5 expression on the label — map-only after the labels exist, and
    * the assignment is a pure property of (cluster id), stable across
    * reruns, engines, and corpus growth that doesn't touch the cluster. */
  def c08ClusterSafeSplit(spark: SparkSession, dir: String): DataFrame =
    clusterSafeSplitOf(Dedup.dd06NearDupClusters(spark, dir),
      trainPermille = 900)

  /** Library surface: cluster-keyed split over ANY (id, cluster) frame at
    * a caller-chosen train rate (the declared query pins 900‰). */
  def clusterSafeSplitOf(clusters: DataFrame, trainPermille: Int,
      idCol: String = "doc_id", clusterCol: String = "cluster"): DataFrame = {
    require(trainPermille >= 0 && trainPermille <= 1000,
      s"trainPermille: $trainPermille")
    val b = pmod(graft.functions.Hashing.md5Long(
      concat(lit("csplit:"), col(clusterCol).cast("string")), 15),
      lit(1000L)).cast("int")
    clusters
      .withColumn("split",
        when(b < trainPermille, "train").otherwise("val"))
      .select(col(idCol), col(clusterCol), col("split"))
      .orderBy(idCol)
  }

  /** c11 — DATASET CARD: the per-source datasheet every released training
    * mix ships with — documents, token volume, mean quality, exact-dup
    * rate, language spread, and each source's per-mille share of the
    * corpus, in one frame. This is the report a data release publishes
    * and a mixing decision (sp03/sp08 weights) reads first; computing it
    * IN the engine, from the same quality/fingerprint definitions the
    * pipeline filters on (t02's `quality`, dd01's fingerprint), means
    * the card can never disagree with the pipeline that produced the mix.
    *
    * Scale shape: one map-only scoring pass feeding two aggregations —
    * the (fp → count) dup census (dd01's 24 B/doc shuffle) and the
    * per-source rollup (|sources| rows) — plus a 1-row corpus count
    * broadcast back for the share column. Token sums and dup counts
    * map-side combine; nothing driver-side grows with the corpus. */
  def c11DatasetCard(spark: SparkSession, dir: String): DataFrame =
    datasetCardOf(graft.sources.Tables.t(spark, dir, "documents"))

  /** Library surface: the c11 card over ANY (doc_id, source, lang, text)
    * frame — the per-source summary a pipeline publishes beside its
    * FINAL corpus (the composed end-to-end example emits this as its
    * last stage). Same integer-summed arithmetic as the declared query,
    * so a card over the raw documents table ≡ c11 row-for-row.
    *
    * `knownTotal`: a composed pipeline that just gated `docs` already
    * holds its row count — pass it and the card skips its own 1-row
    * corpus-count aggregate (one fewer full scan of the input; the pin
    * audit flags the recount as a twice-executed subplan otherwise).
    * Callers without a count in hand omit it and pay the scan. */
  def datasetCardOf(docs: DataFrame, knownTotal: Option[Long] = None)
      : DataFrame = {
    import graft.operators.TextAnalysis.{fingerprint, quality}
    // pinned (r17): the dup census, the corpus count (when not supplied)
    // and the rollup join all read this scoring pass — unpinned it ran
    // once per consumer (quality + fingerprint over the full text)
    val scored = docs.select(col("doc_id"), col("source"), col("lang"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("__nt"),
      quality(col("text")).as("__q"), fingerprint(col("text")).as("__fp"))
      .transform(graft.Materialize.pin)
    val dupCounts = scored.groupBy("__fp").agg(count(lit(1)).as("__nd"))
    val total = knownTotal match {
      case Some(n) => docs.sparkSession.range(1)
        .select(lit(n).as("__total"))
      case None => scored.agg(count(lit(1)).as("__total"))
    }
    scored.join(dupCounts, "__fp")
      .crossJoin(broadcast(total))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        // integer-summed mean (t12's recipe): double summation ORDER can
        // flip a rounded 3rd decimal between engines; ×1000 int sums can't
        round(sum(expr("CAST(ROUND(__q * 1000) AS BIGINT)"))
          .cast("double") / 1000.0 / count(lit(1)), 3).as("avg_quality"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        max(col("__total")).as("__t"))
      .withColumn("share_permille",
        expr("(n_docs * 1000) div __t"))
      .drop("__t")
      .orderBy("source")
  }

  /** c10 — SPLIT-LEAKAGE AUDIT: for a proposed train/val/test assignment,
    * count the near-duplicate pairs that land within and ACROSS each
    * split pair — the off-diagonal rows are eval contamination (the model
    * trains on a twin of what it is evaluated on). This is the audit a
    * pipeline runs BEFORE training on any split it didn't derive from
    * cluster keys: c08 passes it by construction (zero off-diagonal,
    * asserted in CurationSpec-style tests); the declared query audits the
    * naive per-document split (sp01) against the exact SimHash pair set
    * (dd05) and shows the leak c08 exists to prevent.
    *
    * Scale shape: the pair set is banding-bounded (≈ true near-dups, not
    * D²) and the split frame joins it BY ID — two hash joins keyed on
    * doc_id, then a rollup onto at most |splits|² rows. The corpus-sized
    * split frame shuffles once per side; at 10⁹ docs that is the same
    * (id, small-payload) movement as dd01, and AQE broadcasts the pair
    * side instead when it is the small one (the common case). */
  def c10SplitLeakage(spark: SparkSession, dir: String): DataFrame =
    splitLeakageOf(
      Dedup.dd05SimhashPairs(spark, dir).select("ida", "idb"),
      Sampling.sp01SplitSample(spark, dir).select("doc_id", "split"))
      .orderBy("split_a", "split_b")

  /** Library surface: leakage audit of ANY pair frame (ida, idb) against
    * ANY assignment frame (id, split). Emits (split_a ≤ split_b, n_pairs)
    * — off-diagonal rows are boundary-crossing near-dup edges. */
  def splitLeakageOf(pairs: DataFrame, splits: DataFrame,
      idCol: String = "doc_id", splitCol: String = "split"): DataFrame = {
    val sa = splits.select(col(idCol).as("ida"), col(splitCol).as("__sa"))
    val sb = splits.select(col(idCol).as("idb"), col(splitCol).as("__sb"))
    pairs
      .join(sa, "ida").join(sb, "idb")
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** c12 — CORPUS DRIFT MONITOR: per source, the Population Stability
    * Index between two corpus snapshots, over two distribution
    * dimensions — the t02 quality score and the token-length — binned
    * into 10 fixed buckets. PSI = Σ_bins (p_A − p_B)·ln(p_A/p_B) with
    * add-one smoothing (so empty bins are defined), the standard
    * monitoring statistic: <0.1 stable, 0.1–0.2 drifting, >0.2 shifted.
    * This is the check an ONGOING ingest runs between last month's crawl
    * and this month's: a source whose quality histogram moved is a
    * source whose upstream changed (template redesign, spam influx,
    * parser regression) — caught from two profile tables, before any
    * model retrains on it.
    *
    * Scale shape: one map + count aggregation per snapshot over
    * (source, dim, bin) — cardinality |sources|·20, map-side combined
    * from corpus-sized input; the bin spine is generated by nested
    * EXPLODE from the distinct-source frame (never a join against the
    * corpus), smoothing and the PSI sum run on spine-sized rows. At
    * 100 TB: two corpus scans (or zero, when the per-snapshot histogram
    * tables are already persisted — they are exactly the q43-style
    * maintainable state), everything downstream is report-sized.
    *
    * The declared query splits the fixture by doc_id BLOCK parity
    * ((doc_id div 20) % 2 — plain parity would correlate perfectly with
    * the fixture's source assignment and leave every source with one
    * empty side) into the "A/B snapshots" so the oracle can recompute
    * both sides from one table; [[driftMonitorOf]] is the two-frame
    * library surface. */
  def c12DriftMonitor(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.t(spark, dir, "documents")
    driftMonitorOf(docs.where(expr("(doc_id div 20) % 2") === 0),
      docs.where(expr("(doc_id div 20) % 2") === 1))
  }

  /** The drift monitor's bin count — 10 buckets per dimension. */
  val DriftBins = 10

  /** Per-document histogram bins for the drift dimensions — ONE shared
    * definition consumed by the batch monitor (c12), the streaming
    * monitor ([[graft.streaming.Streaming.streamingDriftMonitor]] — their
    * parity depends on binning identically, asserted in StreamingSpec),
    * and any persisted-profile job. */
  def driftBinsOf(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis.quality
    val nt = size(split(lower(trim(col("text"))), "\\s+"))
    docs.select(col("source"),
      least(floor(quality(col("text")) * DriftBins), lit(DriftBins - 1))
        .cast("int").as("qbin"),
      least(floor(nt / 16), lit(DriftBins - 1)).cast("int").as("lbin"))
  }

  /** (source, dim, bin, cnt) histogram table of a snapshot — the
    * persistable profile (q43-style maintainable state; a monthly PSI
    * check against stored profiles touches zero raw rows). */
  def driftHistogramOf(docs: DataFrame): DataFrame =
    driftBinsOf(docs)
      .select(col("source"), explode(array(
        struct(lit("quality").as("dim"), col("qbin").as("bin")),
        struct(lit("length").as("dim"), col("lbin").as("bin")))).as("db"))
      .groupBy(col("source"), col("db.dim").as("dim"),
        col("db.bin").as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Library surface: PSI drift between ANY two (source, text) frames. */
  def driftMonitorOf(snapA: DataFrame, snapB: DataFrame): DataFrame = {
    val NB = DriftBins
    val ca = driftHistogramOf(snapA)
    val cb = driftHistogramOf(snapB)
    // dense (source, dim, bin) spine by EXPLODE from the distinct-source
    // frame — bounded by construction, no join against the corpus
    val spine = ca.select("source").union(cb.select("source")).distinct()
      .select(col("source"),
        explode(array(lit("quality"), lit("length"))).as("dim"))
      .select(col("source"), col("dim"),
        explode(sequence(lit(0), lit(NB - 1))).as("bin"))
    // per (source, dim) totals; counts are per-dim identical but keeping
    // the key uniform makes the joins all equi-joins on the spine key
    val joined = spine
      .join(ca.withColumnRenamed("cnt", "ca"), Seq("source", "dim", "bin"),
        "left")
      .join(cb.withColumnRenamed("cnt", "cb"), Seq("source", "dim", "bin"),
        "left")
      .na.fill(0L, Seq("ca", "cb"))
    val withTotals = joined
      .withColumn("na", sum("ca").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source", "dim")))
      .withColumn("nb", sum("cb").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source", "dim")))
    val pa = (col("ca") + 1).cast("double") / (col("na") + NB)
    val pb = (col("cb") + 1).cast("double") / (col("nb") + NB)
    // ×1e8-integer PSI terms (t14's recipe): per-term doubles are
    // deterministic (same IEEE ops both engines), but a 10-term DOUBLE
    // sum depends on aggregation order — integer sums don't
    withTotals
      .select(col("source"), col("dim"), col("na"), col("nb"),
        round((pa - pb) * log(pa / pb) * 1e8).cast("long").as("term"))
      .groupBy("source")
      .agg(
        max(when(col("dim") === "quality", col("na"))).cast("long")
          .as("n_a"),
        max(when(col("dim") === "quality", col("nb"))).cast("long")
          .as("n_b"),
        ExactPresent.roundDiv(sum(when(col("dim") === "quality",
          col("term"))), lit(100000000L), 4).as("psi_quality"),
        ExactPresent.roundDiv(sum(when(col("dim") === "length",
          col("term"))), lit(100000000L), 4).as("psi_length"))
      .withColumn("verdict",
        when(greatest(col("psi_quality"), col("psi_length")) > 0.2, "shift")
          .when(greatest(col("psi_quality"), col("psi_length")) > 0.1,
            "drift")
          .otherwise("stable"))
      .orderBy("source")
  }

  /** c13 — EMBEDDING-SPACE drift monitor: c12 watches scalar feature
    * histograms; this watches the embedding DISTRIBUTION itself — the
    * signal that catches "the new crawl looks the same in length/quality
    * but talks about different things" (or: the embedding model was
    * silently swapped). Per LSH cell (the deterministic 8-hyperplane
    * bucket shared with ss03 — 256 cells, engine-exact), two snapshots
    * are compared on (a) population share and (b) the DIRECTION of the
    * cell's mean vector: cos(Σ_A q, Σ_B q) — cosine is scale-invariant,
    * so the sum IS the mean for direction purposes, and integer sums are
    * order-independent (only the final cosine is a rounded double, the
    * ss01 recipe). Verdicts: cells that appear/disappear ("new"/"gone"),
    * rotate (cos < 0.99) or shift share (> 2‰) → "drift".
    *
    * Scale shape: ONE map pass per snapshot (bucket + posexplode) into a
    * (cell, dim)-keyed aggregation of cardinality ≤ 256·64 — map-side
    * combined, so wire bytes are fixed regardless of corpus size; the
    * spine/join/verdict all operate on ≤ 256-row frames. Per-side ‰
    * shares use integer division (n·1000 div N) — exact and portable.
    * Integer-exactness bound: |q|≤~1000 ⇒ component sums stay exact to
    * ~9·10¹⁵ rows/cell, but sa·sb in the cosine needs n/cell ≲ 3·10⁶ —
    * beyond that, rescale the sums (e.g. div 1024) before the cosine;
    * direction is scale-invariant so the verdict is unchanged. */
  def c13EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = graft.sources.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"),
        Similarity.quantizedOf(col("embedding")).as("q"))
    embeddingDriftOf(emb.where(expr("(vec_id div 20) % 2") === 0),
      emb.where(expr("(vec_id div 20) % 2") === 1))
  }

  /** The PERSISTABLE per-snapshot profile the embedding monitor
    * compares: (cell, i, s, n) — ≤ 256·64 rows regardless of corpus
    * size. A nightly job stores one of these beside each snapshot;
    * [[embeddingDriftFromProfiles]] then answers any pairwise drift
    * question without re-touching raw vectors (c12's
    * `driftHistogramOf` pattern, embedding edition — asserted ≡ the
    * raw-frame monitor in PipelinesSpec). */
  def embeddingProfileOf(snap: DataFrame): DataFrame = snap
    .withColumn("cell", Similarity.hyperplaneBucket(0))
    .select(col("cell"), posexplode(col("q")).as(Seq("i", "v")))
    .groupBy("cell", "i")
    .agg(sum("v").as("s"), count(lit(1)).as("n"))

  /** Library surface: embedding drift between ANY two (vec_id, q) frames
    * (q = int64-quantized vector, the Similarity contract). */
  def embeddingDriftOf(snapA: DataFrame, snapB: DataFrame): DataFrame =
    embeddingDriftFromProfiles(
      embeddingProfileOf(snapA), embeddingProfileOf(snapB))

  /** Drift from two STORED [[embeddingProfileOf]] frames — the
    * recompute-free monthly monitor. */
  def embeddingDriftFromProfiles(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.withColumnsRenamed(Map("s" -> "sa", "n" -> "na"))
      .join(b.withColumnsRenamed(Map("s" -> "sb", "n" -> "nb")),
        Seq("cell", "i"), "full_outer")
      .na.fill(0L, Seq("sa", "sb", "na", "nb"))
    val g = j.groupBy("cell").agg(
      max("na").as("n_a"), max("nb").as("n_b"),
      sum(col("sa") * col("sb")).as("dot"),
      sum(col("sa") * col("sa")).as("a2"),
      sum(col("sb") * col("sb")).as("b2"))
    // snapshot totals: a ≤ 256-row aggregate, broadcast by construction
    val tot = g.agg(sum("n_a").cast("long").as("ta"),
      sum("n_b").cast("long").as("tb"))
    val cos = when(col("a2") > 0 && col("b2") > 0,
      round(col("dot").cast("double") /
        sqrt(col("a2").cast("double") * col("b2").cast("double")), 4))
    g.crossJoin(broadcast(tot))
      .withColumn("cos_shift", cos)
      .withColumn("dshare_permille",
        abs(expr("n_a * 1000 div ta") - expr("n_b * 1000 div tb"))
          .cast("long"))
      .withColumn("verdict",
        when(col("n_a") === 0, "new").when(col("n_b") === 0, "gone")
          .when(col("cos_shift").isNull || col("cos_shift") < 0.99 ||
            col("dshare_permille") > 2, "drift")
          .otherwise("stable"))
      .select(col("cell"), col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"), col("cos_shift"),
        col("dshare_permille"), col("verdict"))
      .orderBy("cell")
  }
}
