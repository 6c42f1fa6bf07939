package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** Sanity + algebraic properties of the training-data pipeline operators.
  * (Exact value-level correctness is covered by the DuckDB oracle gate —
  * tools/compare.py matches all of these bit-for-bit at sf0.01.) */
class PipelinesSpec extends SparkSpec {

  test("dd03 MinHash-LSH candidates reproduce the exact n-gram Jaccard pairs") {
    // At this corpus the 8×2 banding has full recall: LSH output == exact
    // output. This is the determinism contract that makes the probabilistic
    // path oracle-checkable.
    val exact = Dedup.dd02NgramJaccard(spark, sf).collect().map(_.toSeq).toSet
    val lsh = Dedup.dd03MinhashLsh(spark, sf).collect().map(_.toSeq).toSet
    assert(lsh == exact && exact.nonEmpty)
  }

  test("dd01 exact dedup keeps exactly one representative per fingerprint") {
    val d = Dedup.dd01Exact(spark, sf)
    val perFp = d.groupBy("fp").agg(
      sum(when(col("keep"), 1).otherwise(0)).as("kept"))
    assert(perFp.where(col("kept") =!= 1).isEmpty)
  }

  test("dd04 simhash is a 60-bit value") {
    val sig = Dedup.dd04Simhash(spark, sf)
    assert(sig.where(col("simhash") < 0 ||
      col("simhash") > (1L << 60) - 1).isEmpty)
  }

  test("dd05 5x12-bit banding is exact for Hamming <= 4 (pigeonhole)") {
    // <=4 differing bits touch at most 4 of 5 bands => >=1 band collides,
    // so blocking loses NO true pair: dd05 == brute-force Hamming filter
    val sig = Dedup.dd04Simhash(spark, sf).select("doc_id", "simhash")
    val a = sig.select(col("doc_id").as("ida"), col("simhash").as("ha"))
    val brute = a.crossJoin(
        sig.select(col("doc_id").as("idb"), col("simhash").as("hb")))
      .where(col("ida") < col("idb"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .where(col("hamming") <= 4)
      .select("ida", "idb", "hamming")
    val banded = Dedup.dd05SimhashPairs(spark, sf)
      .select("ida", "idb", "hamming")
    assert(banded.except(brute).isEmpty && brute.except(banded).isEmpty)
  }

  test("dd06 clusters are consistent, canonical, and cover singletons") {
    val labels = Dedup.dd06NearDupClusters(spark, sf)
    val pairs = Dedup.dd05SimhashPairs(spark, sf).select("ida", "idb")
    // 1. every near-dup pair lands in ONE cluster (edge consistency)
    val la = labels.select(col("doc_id").as("ida"), col("cluster").as("ca"))
    val lb = labels.select(col("doc_id").as("idb"), col("cluster").as("cb"))
    assert(pairs.join(la, "ida").join(lb, "idb")
      .where(col("ca") =!= col("cb")).isEmpty)
    // 2. the cluster id is the component's smallest member, and a member
    assert(labels.groupBy("cluster")
      .agg(min("doc_id").as("mn"))
      .where(col("cluster") =!= col("mn")).isEmpty)
    // 3. documents with no near-dup edge label themselves
    val touched = pairs.select(col("ida").as("doc_id"))
      .unionAll(pairs.select(col("idb").as("doc_id"))).distinct()
    assert(labels.join(touched, Seq("doc_id"), "left_anti")
      .where(col("cluster") =!= col("doc_id")).isEmpty)
    // and clustering is a partition of the corpus
    assert(labels.count() ==
      graft.sources.Tables.t(spark, sf, "documents").count())
  }

  test("dd06 on an edge-free corpus returns all singletons without spinning") {
    // regression: the sum-scalar convergence test can't fire on an empty
    // label frame (sum of nothing is null) — the loop must short-circuit,
    // not burn 64 rounds and throw
    import spark.implicits._
    val dir = tmpDir("nodups")
    Seq((1L, "alpha beta gamma delta unique one"),
      (2L, "epsilon zeta eta theta other words"),
      (3L, "iota kappa lambda mu completely different"))
      .toDF("doc_id", "text")
      .write.parquet(dir + "/documents.parquet")
    val out = Dedup.dd06NearDupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("connectedComponents survives adversarial diameter via contraction") {
    // 200-node path graph: diameter 199, far past any small propagation
    // budget. With propRounds=2 the frontier loop CANNOT converge — the
    // contraction fallback must take over (several phases) and still land
    // every node on the component minimum, with no round-cap exception.
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("ida", "idb")
    val edges = chain.unionAll(
      chain.select(col("idb").as("ida"), col("ida").as("idb")))
    val labels = operators.Dedup.connectedComponents(edges, propRounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels == (0L until 200L).map(i => (i, 0L)).toSet)
  }

  test("connectedComponents contraction keeps components separate") {
    // two long chains + one already-tiny component, tiny propagation
    // budget: contraction must not merge across components, and components
    // that converge in the fast path keep their labels through the
    // contraction mapping
    import spark.implicits._
    val pairs =
      (100L until 179L).map(i => (i, i + 1)) ++ // chain A, min 100
        (500L until 560L).map(i => (i, i + 1)) ++ // chain B, min 500
        Seq((900L, 901L)) // single edge, converges in round 1
    val p = pairs.toDF("ida", "idb")
    val edges = p.unionAll(
      p.select(col("idb").as("ida"), col("ida").as("idb")))
    val got = operators.Dedup.connectedComponents(edges, propRounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want =
      (100L to 179L).map(i => (i, 100L)).toSet ++
        (500L to 560L).map(i => (i, 500L)).toSet ++
        Set((900L, 900L), (901L, 900L))
    assert(got == want)
  }

  test("property: connectedComponents == union-find on random graphs") {
    // random edge sets, tiny propagation budgets (so the CONTRACTION path
    // runs, not just the frontier loop), checked against a brute-force
    // driver-side union-find — the fallback must be exactly as correct as
    // the fast path on arbitrary topology, not just chains
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val graphGen = for {
      n <- Gen.choose(2, 60) // node id space
      m <- Gen.choose(1, 90) // edges
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
      budget <- Gen.oneOf(1, 2, 3)
    } yield (edges.distinct, budget)
    (1L to 5L).foreach { seed =>
      val (pairs, budget) =
        graphGen.pureApply(Gen.Parameters.default, Seed(seed))
      withClue(s"seed=$seed budget=$budget edges=$pairs") {
        // driver-side union-find oracle
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(v => (v, find(v))).toMap
        val p = pairs.toDF("ida", "idb")
        val edges = p.unionAll(
          p.select(col("idb").as("ida"), col("ida").as("idb")))
        val got = operators.Dedup.connectedComponents(edges, budget)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == want)
      }
    }
  }

  test("c02 keeps exactly the quality-passing cluster representatives") {
    val kept = graft.operators.Curation.c02ClusterCuration(spark, sf)
    val labels = Dedup.dd06NearDupClusters(spark, sf)
    // every kept doc is its own cluster's canonical representative
    assert(kept.join(labels, "doc_id")
      .where(col("cluster") =!= col("doc_id")).isEmpty)
    // and no quality-passing representative was dropped
    val reps = labels.where(col("cluster") === col("doc_id")).select("doc_id")
    val q = TextAnalysis.t02Quality(spark, sf).select("doc_id", "quality")
      .where(col("quality") >= 0.3)
    assert(kept.count() == reps.join(q, "doc_id").count())
  }

  test("c01 curation plan has no BroadcastNestedLoopJoin (LSH near-dup path)") {
    val plan = graft.operators.Curation.c01Curation(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("dd03/c01 scale paths carry no mandatory-broadcast hint") {
    // A broadcast() hint on the corpus-sized shingle-set frame is a hard
    // failure at the 8 GB broadcast ceiling long before 100 TB. The scale
    // paths must leave join-strategy choice to AQE: zero ResolvedHint nodes
    // anywhere in their analyzed plans. (dd02/ss02, the declared quadratic
    // baselines, keep their hints and are deliberately NOT asserted here.)
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (df <- Seq(Dedup.dd03MinhashLsh(spark, sf),
        graft.operators.Curation.c01Curation(spark, sf))) {
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      assert(hints.isEmpty, s"unexpected join hints: $hints")
    }
  }

  test("ss01 top-k is ordered by cosine desc and excludes the query itself") {
    val topk = Similarity.ss01CosineTopK(spark, sf).collect()
    assert(topk.length == 10)
    assert(!topk.map(_.getLong(0)).contains(0L))
    val coss = topk.map(_.getDouble(1))
    assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
  }

  test("ss03 LSH-ANN results are a subset of the brute-force ranking universe") {
    val ann = Similarity.ss03LshAnn(spark, sf).collect().map(_.getLong(0)).toSet
    assert(ann.nonEmpty && !ann.contains(0L))
  }

  test("ss03 multi-probe recall >= 70% of the exact top-k") {
    // the named recall target: two independent 8-bit tables, each probed
    // at Hamming <= 2 (37 of 256 buckets), must together recover most of
    // ss01's exact top-10 on the fixture corpus
    val exact = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val ann = Similarity.ss03LshAnn(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"multi-probe recall vs exact top-10: $recall")
    assert(recall >= 0.7, s"recall $recall below 0.7 target")
  }

  test("ss14 bucketed MIPS: recall floor vs exact ss13, and a planted winner is found") {
    // the norm-augmentation reduction must recover most of the exact MIPS
    // top-10 through the two-table multi-probe (same 70% floor as ss03)
    val exact = Similarity.ss13MipsTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val bucketed = Similarity.ss14MipsBucketed(spark, sf).collect()
    val ids = bucketed.map(_.getLong(0)).toSet
    val recall = (exact & ids).size.toDouble / exact.size
    info(s"bucketed-MIPS recall vs exact top-10: $recall")
    assert(recall >= 0.7, s"recall $recall below 0.7 target")
    assert(!ids.contains(0L))
    // scores are EXACT inner products (re-rank is integer dot): every
    // returned (id, dot) must equal the brute-force dot for that id
    val exactDots = Similarity.mipsTopKOf(
      graft.sources.Tables.t(spark, sf, "embeddings"), 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    bucketed.foreach { r =>
      assert(exactDots(r.getLong(0)) == r.getLong(1),
        s"bucketed dot for ${r.getLong(0)} is not the exact inner product")
    }
    // planted MIPS winner: a vector ALIGNED with the query but 3x its
    // magnitude dominates the inner product despite identical direction —
    // the case cosine retrieval (which ignores magnitude) cannot rank.
    // The augmented coordinate of the big vector is small, so it lands in
    // the query's own hemisphere and the buckets must find it.
    import spark.implicits._
    val dim = 64
    val qvec = Array.tabulate(dim)(i => math.sin(i * 0.37) * 0.5)
    val planted = (0L, qvec) +: (1L, qvec.map(_ * 3.0)) +:
      (2 to 200).map(j =>
        (j.toLong, Array.tabulate(dim)(i => math.sin(i * 0.11 * j + j) * 0.4)))
    val frame = planted.toDF("vec_id", "embedding")
    val top = Similarity.mipsTopKBucketed(frame, 0L, 3).collect()
    assert(top.head.getLong(0) == 1L,
      s"planted 3x-magnitude aligned vector must be the MIPS winner: ${top.mkString(",")}")
  }

  test("ss06 IVF ANN probes exactly two cells and recalls from them") {
    val ann = Similarity.ss06IvfAnn(spark, sf)
    val emb = graft.sources.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"))
    // results live in at most 2 labels (the probed cells), never the query
    val hitLabels = ann.join(emb, "vec_id").select("label").distinct().count()
    assert(hitLabels <= 2 && ann.count() == 10)
    assert(ann.where(col("vec_id") === 0).isEmpty)
    val exact = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val got = ann.collect().map(_.getLong(0)).toSet
    info(s"IVF nprobe=2 recall vs exact top-10: ${(exact & got).size / 10.0}")
  }

  test("trained IVF (Lloyd-refined cells) probes nprobe cells and recalls") {
    val trained = Similarity.ivfAnnTrained(spark, sf, iters = 2, nprobe = 2)
    assert(trained.count() == 10)
    assert(trained.where(col("vec_id") === 0).isEmpty)
    // results live in at most nprobe TRAINED cells
    val cells = Similarity.kmeansFit(spark, sf, iters = 2)
      .select(col("vec_id"), col("assigned"))
    assert(trained.join(cells, "vec_id")
      .select("assigned").distinct().count() <= 2)
    val exact = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val got = trained.collect().map(_.getLong(0)).toSet
    val recall = (exact & got).size / 10.0
    info(s"trained-IVF nprobe=2 recall vs exact top-10: $recall")
    assert(recall >= 0.3, s"trained-IVF recall $recall collapsed")
  }

  test("ss04 LSH near-dup pairs are a subset of the exact ss02 pairs") {
    // candidate generation can lose recall (one bucket table) but must
    // never invent a pair: every surviving pair passed the exact filter
    val exact = Similarity.ss02NearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.ss04LshNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact) && lsh.nonEmpty)
  }

  test("ss04 recall floor on planted near-dup pairs") {
    // Planted-pair fixture, mirroring the ss03 recall-floor test: 60 base
    // vectors each get a twin at cos ≈ 0.995 (the true near-DUPLICATE
    // regime this miner exists for) and 60 more a twin at cos ≈ 0.9.
    // Theory (sign-agreement prob 1 − θ/π per plane, 8-plane tables):
    // cos 0.995 → per-table ≈ 0.77, two tables ≈ 0.95; cos 0.9 →
    // per-table ≈ 0.29, two tables ≈ 0.50. The hard floor is asserted in
    // the tight regime; the loose regime's measured recall is reported
    // (and must beat one table's) — recovering MORE of it is what adding
    // tables is for (T tables: 1 − (1 − p₈)^T, ~7 tables for 90% at
    // cos 0.9). Deterministic seed ⇒ no flake.
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def twin(v: Array[Float], rel: Double): Array[Float] = {
      val base = math.sqrt(v.map(x => x.toDouble * x).sum)
      val n = Array.fill(64)(rnd.nextGaussian())
      val nn = math.sqrt(n.map(x => x * x).sum)
      v.zip(n).map { case (x, e) =>
        (x + (e / nn * base * rel).toFloat) }
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum *
        b.map(x => x.toDouble * x).sum)
    }
    // rel 0.1 → cos ≈ 1/sqrt(1.01) ≈ 0.995; rel 0.484 → cos ≈ 0.90
    val tight = (0 until 60).map { i =>
      val v = vec(); (4L * i, v, 4L * i + 1, twin(v, 0.1))
    }
    val loose = (0 until 60).map { i =>
      val v = vec(); (4L * i + 2, v, 4L * i + 3, twin(v, 0.484))
    }
    val dir = tmpDir("planted-lsh")
    (tight ++ loose)
      .flatMap { case (ia, va, ib, vb) => Seq((ia, va, 0), (ib, vb, 0)) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(dir + "/embeddings.parquet")
    val got = Similarity.ss04LshNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(pairs: Seq[(Long, Array[Float], Long, Array[Float])],
        minCos: Double): Double = {
      val planted = pairs.filter(p => cos(p._2, p._4) >= minCos)
        .map(p => (p._1, p._3))
      assert(planted.size >= 50, s"fixture degenerated: ${planted.size}")
      planted.count(got.contains).toDouble / planted.size
    }
    val rTight = recallOf(tight, 0.97)
    val rLoose = recallOf(loose, 0.85)
    info(s"ss04 planted recall: cos≈0.995 → $rTight, cos≈0.9 → $rLoose")
    assert(rTight >= 0.8, s"near-duplicate recall $rTight below 0.8 floor")
    // the loose regime is where the tables-vs-recall trade bites: assert
    // only that the second table is pulling its weight (> one table's
    // theoretical ceiling alone would flake; > 0.25 does not)
    assert(rLoose >= 0.25, s"cos 0.9 recall $rLoose collapsed")
  }

  test("dd03 banding recall floor on planted Jaccard pairs") {
    // Planted-pair fixture mirroring the ss04 planted-cosine test, so the
    // 16-hash/8-band trade is ASSERTED, not narrated. Vocabulary is unique
    // per pair, so each pair's bigram-shingle Jaccard is exact BY
    // CONSTRUCTION (no cross-pair overlap, no measurement step):
    //  - tight: 100 tokens, positions 30/70 replaced → 95 shared of 103
    //    distinct bigrams, J = 0.922 — the near-duplicate regime. Theory
    //    (2-row bands, 8 bands): hit = 1 − (1 − J²)⁸ ≈ 0.999998.
    //  - loose: last 48 of 100 tokens replaced → 51 shared of 147,
    //    J = 0.347 — below the regime the banding is tuned for. Theory:
    //    1 − (1 − 0.12)⁸ ≈ 0.64; recovering more is what more bands/rows
    //    would buy.
    // Candidate misses are banding-only (verification is exact on the
    // attached shingle sets), so recall measures exactly the documented
    // trade. Deterministic token construction ⇒ no flake.
    import spark.implicits._
    def tokens(pair: Int, tag: String, n: Int): IndexedSeq[String] =
      (0 until n).map(j => s"p${pair}${tag}$j")
    def doc(pair: Int, mut: IndexedSeq[String] => IndexedSeq[String])
        : String = mut(tokens(pair, "w", 100)).mkString(" ")
    val tight = (0 until 60).map { i =>
      (400L + 4 * i, doc(i, identity),
        401L + 4 * i, doc(i, ts => ts.updated(30, s"p${i}x30")
          .updated(70, s"p${i}x70")))
    }
    val loose = (0 until 60).map { i =>
      (402L + 4 * i, doc(1000 + i, identity),
        403L + 4 * i, doc(1000 + i,
          ts => ts.take(52) ++ tokens(1000 + i, "z", 48)))
    }
    val docs = (tight ++ loose)
      .flatMap { case (ia, ta, ib, tb) => Seq((ia, ta), (ib, tb)) }
      .toDF("doc_id", "text")
    val got = Dedup.minhashNearDupsOf(docs, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(pairs: Seq[(Long, String, Long, String)]): Double =
      pairs.count(p => got.contains((p._1, p._3))).toDouble / pairs.size
    val rTight = recallOf(tight)
    val rLoose = recallOf(loose)
    info(s"dd03 planted recall: J=0.922 → $rTight, J=0.347 → $rLoose")
    // hard floor in the near-duplicate regime the banding is built for
    // (theory 0.999998 across 60 pairs; 0.95 allows hash-family slack)
    assert(rTight >= 0.95, s"J≥0.9 recall $rTight below 0.95 floor")
    // sub-regime: assert it hasn't collapsed (theory ≈ 0.64 ± binomial)
    assert(rLoose >= 0.4, s"J=0.347 recall $rLoose collapsed")
    // and the verified pairs report the exact constructed Jaccard
    val j = Dedup.minhashNearDupsOf(docs, 0.3).where(col("ida") === 400L)
      .collect()
    assert(j.forall(r => math.abs(r.getDouble(2) - 0.922) < 0.001))
  }

  test("dd19 recall audit integer-buckets planted pairs and measures the banding") {
    // Same planted-vocabulary construction as the dd03 floor test (unique
    // bigram space per pair ⇒ exact Jaccard by construction, deterministic
    // hash family ⇒ no flake): J=0.922 pairs land in decile (10·95) div
    // 103 = 9, J=0.347 pairs in (10·51) div 147 = 3.
    import spark.implicits._
    def tokens(pair: Int, tag: String, n: Int): IndexedSeq[String] =
      (0 until n).map(j => s"q${pair}${tag}$j")
    def doc(pair: Int, mut: IndexedSeq[String] => IndexedSeq[String])
        : String = mut(tokens(pair, "w", 100)).mkString(" ")
    val tight = (0 until 40).map { i =>
      (800L + 4 * i, doc(i, identity),
        801L + 4 * i, doc(i, ts => ts.updated(30, s"q${i}x30")
          .updated(70, s"q${i}x70")))
    }
    val loose = (0 until 40).map { i =>
      (802L + 4 * i, doc(2000 + i, identity),
        803L + 4 * i, doc(2000 + i,
          ts => ts.take(52) ++ tokens(2000 + i, "z", 48)))
    }
    val docs = (tight ++ loose)
      .flatMap { case (ia, ta, ib, tb) => Seq((ia, ta), (ib, tb)) }
      .toDF("doc_id", "text")
    val audit = Dedup.lshRecallAuditOf(docs, 0.3).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(audit.keySet == Set(3, 9), s"buckets: ${audit.keySet}")
    val (e9, c9, r9) = audit(9)
    assert(e9 == 40 && c9 >= 38,
      s"J=0.922 bucket: $c9/$e9 (theory 0.999998)")
    val (e3, c3, r3) = audit(3)
    assert(e3 == 40 && c3 >= 16 && c3 <= 40,
      s"J=0.347 bucket: $c3/$e3 (theory ≈ 0.64)")
    info(s"dd19 measured recall: bucket 9 → $r9, bucket 3 → $r3")
    // recall is exactly the int64 half-up round of n_caught/n_exact
    def rd(c: Long, e: Long): Double = ((2 * c * 1000 + e) / (2 * e)) / 1000.0
    assert(r9 == rd(c9, e9) && r3 == rd(c3, e3))
  }

  test("sp16 length buckets: power-of-two caps and exact padding arithmetic") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" ")), // 10 -> cap 16
      (2L, (1 to 16).map(i => s"b$i").mkString(" ")), // 16 -> cap 16 (boundary is inclusive)
      (3L, (1 to 17).map(i => s"c$i").mkString(" ")), // 17 -> cap 32
      (4L, (1 to 100).map(i => s"d$i").mkString(" ")) // 100 -> cap 128
    ).toDF("doc_id", "text")
    val got = Sampling.lengthBucketsOf(docs).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (16L, 2L, 16L, 26L, 6L, 0.188),    // 6/32  = 0.1875  -> half-up 0.188
      (32L, 1L, 17L, 17L, 15L, 0.469),   // 15/32 = 0.46875 -> 0.469
      (128L, 1L, 100L, 100L, 28L, 0.219) // 28/128 = 0.21875 -> 0.219
    ), s"got: $got")
  }

  test("ivfKnnJoin recalls from the exact knn join through probed cells") {
    val isQ = col("vec_id") % 50 === 0
    val exact = Similarity.knnJoin(spark, sf, isQ, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // fixture labels are ARBITRARY cells (not learned clusters), so recall
    // tracks probed-fraction ≈ nprobe/|cells| — measured 0.27 at nprobe=2
    // of 10 cells, exactly the geometry predicts; a trained quantizer is
    // what lifts it (same story as ss06 vs ivfAnnTrained). Probe 4 cells
    // for a floor comfortably above the probed fraction.
    val ivf = Similarity.ivfKnnJoin(spark, sf, isQ, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // per-query output is exactly k (every probed cell has >= k members
    // on this fixture), queries never appear as their own neighbors
    assert(ivf.size == exact.size)
    assert(!ivf.exists { case (q, v) => q == v })
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"ivfKnnJoin nprobe=4 recall vs exact k-NN join: $recall")
    assert(recall >= 0.35, s"ivf knn recall $recall collapsed")
  }

  test("library surfaces honor full-row predicates and degenerate inputs") {
    // decontaminate by SOURCE (the scaladoc-promised shape) — and an
    // empty benchmark set contaminates nothing rather than erroring
    val bySource = graft.operators.Curation.decontaminate(spark, sf,
      col("source") === "src0", ngramTokens = 3, minShared = 1)
    assert(bySource.count() == 475) // 500 docs − src0's 25
    val noBench = graft.operators.Curation.decontaminate(spark, sf,
      col("source") === "no-such-source", ngramTokens = 3, minShared = 1)
    assert(noBench.where(col("contaminated")).isEmpty)
    assert(noBench.count() == 500)
    // knnJoin with a LABEL predicate (full-row contract) and with an
    // empty query set
    val byLabel = Similarity.knnJoin(spark, sf, col("label") === 0, k = 2)
    assert(byLabel.select("qid").distinct().count() ==
      graft.sources.Tables.t(spark, sf, "embeddings")
        .where(col("label") === 0).count())
    assert(Similarity.knnJoin(spark, sf, col("vec_id") < 0, k = 2).isEmpty)
  }

  test("ss07 kmeans assignment is the true per-vector argmax") {
    import graft.functions.ArrayDot.dotLong
    val asg = Similarity.ss07KmeansAssign(spark, sf)
    assert(asg.count() == 500)
    // non-vacuous Lloyd step: some vectors actually change cells
    assert(asg.where(col("label") =!= col("assigned")).count() > 0)
    // brute-force check: no (vector, centroid) cosine may exceed the
    // assigned cosine (ties broken to the smaller label)
    val el = graft.sources.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("n2", dotLong(col("q"), col("q")))
    val cent = el.join(
        graft.sources.Tables.t(spark, sf, "embeddings").select("vec_id", "label"),
        "vec_id")
      .select(col("label"), posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy("label", "i").agg(sum("qi").as("cq"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("i"), col("cq")))),
        s => s.getField("cq")).as("cvec"))
      .withColumn("cn2", dotLong(col("cvec"), col("cvec")))
    val all = el.crossJoin(cent)
      .withColumn("c", dotLong(col("q"), col("cvec")).cast("double") /
        sqrt(col("cn2").cast("double") * col("n2").cast("double")))
    // recompute the argmax on FULL precision (comparing against the
    // 4-decimal presentation cosine would flag spurious near-ties) with
    // the same (cos, -label) tie-break, and demand exact agreement
    val expected = all.groupBy("vec_id")
      .agg(max_by(col("label"), struct(col("c"), -col("label")))
        .as("expected"))
    val disagree = asg.join(expected, "vec_id")
      .where(col("assigned") =!= col("expected"))
    assert(disagree.isEmpty, "assignment is not the true argmax")
  }

  test("kmeans Lloyd iterations: round 1 is ss07, objective is monotone") {
    val one = Similarity.kmeansFit(spark, sf, iters = 1)
    val ss07 = Similarity.ss07KmeansAssign(spark, sf)
    assert(one.except(ss07).isEmpty && ss07.except(one).isEmpty)
    // fixture-asserted monotonicity: the mean assigned-cosine does not
    // decrease round over round here (1e-3 slack absorbs the 4-decimal
    // rounding). NOTE this is a property of the fixture, not a theorem —
    // the exact spherical-Lloyd guarantee needs centroids of NORMALIZED
    // vectors, while sum-centroids weight members by norm (the price of
    // staying in exact integer arithmetic)
    val objs = (1 to 3).map { i =>
      Similarity.kmeansFit(spark, sf, iters = i)
        .agg(avg(col("cos"))).collect()(0).getDouble(0)
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-3, s"objective regressed: $objs")
    }
  }

  test("ss09 PQ encode: complete, argmax-true, fixture non-degenerate") {
    import graft.functions.ArrayDot.dotLong
    val codes = Similarity.ss09PqEncode(spark, sf)
    // one code per (vector, subspace)
    assert(codes.count() == 500 * 4)
    assert(codes.groupBy("vec_id", "sub").count()
      .where(col("count") =!= 1).isEmpty)
    // the zero-norm caveat shared with the k-means CTEs is vacuous on this
    // fixture: every 16-dim subvector and every (label, sub) sum-codebook
    // has positive norm, so the guardedCos branch never fires and oracle
    // parity holds
    val subs = graft.sources.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .select(col("vec_id"), col("label"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("q"))
      .withColumn("qs", slice(col("q"), col("sub") * 16 + 1, lit(16)))
      .withColumn("n2s", dotLong(col("qs"), col("qs")))
    assert(subs.where(col("n2s") === 0).isEmpty, "zero-norm subvector")
    val cb = subs
      .select(col("label"), col("sub"), posexplode(col("qs")).as(Seq("i", "qi")))
      .groupBy("label", "sub", "i").agg(sum("qi").as("cq"))
      .groupBy("label", "sub").agg(sum(col("cq") * col("cq")).as("cn2"))
    assert(cb.where(col("cn2") === 0).isEmpty, "zero-norm sub-codebook")
    // brute-force argmax check on full precision, mirroring the ss07 test:
    // for every (vec, sub) no codeword may beat the assigned one under the
    // (cos DESC, label ASC) tie-break
    val cent = subs
      .select(col("label"), col("sub"), posexplode(col("qs")).as(Seq("i", "qi")))
      .groupBy("label", "sub", "i").agg(sum("qi").as("cq"))
      .groupBy("label", "sub")
      .agg(transform(sort_array(collect_list(struct(col("i"), col("cq")))),
        s => s.getField("cq")).as("cvec"))
      .withColumn("cn2", dotLong(col("cvec"), col("cvec")))
      .select(col("sub"), col("label").as("clabel"), col("cvec"), col("cn2"))
    val expected = subs.join(cent, Seq("sub"))
      .withColumn("c", dotLong(col("qs"), col("cvec")).cast("double") /
        sqrt(col("cn2").cast("double") * col("n2s").cast("double")))
      .groupBy("vec_id", "sub")
      .agg(max_by(col("clabel"), struct(col("c"), -col("clabel")))
        .as("expected"))
    assert(codes.join(expected, Seq("vec_id", "sub"))
      .where(col("code") =!= col("expected")).isEmpty,
      "PQ code is not the true per-subspace argmax")
  }

  test("pq: m must divide the dimension — no silent tail truncation") {
    // sd = dim/m in integer math would drop the last dim%m components
    // from every subspace; the in-plan guard turns that into an error
    val e = intercept[Exception] {
      Similarity.pqEncodeOf(
        graft.sources.Tables.t(spark, sf, "embeddings"), m = 5).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("does not divide"), msgs.take(500))
  }

  test("ss10 ADC top-k recall vs the exact ss01 ranking") {
    // ADC scores every corpus vector from its 4 codeword ids alone (the
    // query stays exact) — the memory story of the PQ family. Recall vs the
    // exact brute-force top-10 is the quality gate; the floor is fixture-
    // calibrated, the info line tracks drift.
    val exact = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val adc = Similarity.ss10PqAdcTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(adc.size == 10 && !adc.contains(0L))
    val recall = (exact & adc).size.toDouble / exact.size
    info(s"PQ-ADC m=4 recall vs exact top-10: $recall")
    // raw ADC at m=4 with 10 codewords/subspace IS coarse (measured 0.2
    // on this fixture) — that is the honest memory/quality trade, and why
    // ss11 re-ranks. The floor only guards against total collapse.
    assert(recall >= 0.15, s"ADC recall $recall collapsed")
  }

  test("ss11 shortlist + exact re-rank repairs raw-ADC recall") {
    val exact = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val rr = Similarity.ss11PqRerank(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(rr.size == 10 && !rr.contains(0L))
    val recall = (exact & rr).size.toDouble / exact.size
    val raw = Similarity.ss10PqAdcTopK(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val rawRecall = (exact & raw).size.toDouble / exact.size
    info(s"PQ rerank R=100 recall: $recall (raw ADC: $rawRecall)")
    // the point of the second stage: at least as good as raw ADC and
    // clearing a real floor. The fixture's vectors are weakly clustered
    // (10 random-ish label cells), so 10-codeword PQ is coarse by nature
    // — calibrated 0.5 here, 0.6 at sf0.01; R is the recall knob.
    assert(recall >= rawRecall, "re-rank made recall WORSE")
    assert(recall >= 0.5, s"re-rank recall $recall below floor")
  }

  test("c03 semantic survivors: no same-cell pair at or above the cosine cut") {
    import graft.functions.ArrayDot.dotLong
    val kept = graft.operators.Curation.c03SemanticCuration(spark, sf)
      .select("doc_id")
    val asg = Similarity.ss07KmeansAssign(spark, sf).select("vec_id", "assigned")
    val el = graft.sources.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long")).as("q"))
      .withColumn("n2", dotLong(col("q"), col("q")))
    val kv = kept.join(asg, col("doc_id") === col("vec_id"))
      .join(el, "vec_id").select("vec_id", "assigned", "q", "n2")
    val a = kv.select(col("vec_id").as("ida"), col("assigned"),
      col("q").as("qa"), col("n2").as("na"))
    val b = kv.select(col("vec_id").as("idb"), col("assigned"),
      col("q").as("qb"), col("n2").as("nb"))
    val bad = a.join(b, "assigned").where(col("ida") < col("idb"))
      .withColumn("c", dotLong(col("qa"), col("qb")).cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .where(col("c") >= 0.4)
    assert(bad.isEmpty)
    // and the removal is non-vacuous at this fixture
    assert(kept.count() < 500)
  }

  test("t03 langid predicts a language for every doc") {
    val out = TextAnalysis.t03LangId(spark, sf)
    assert(out.where(col("pred").isNull).isEmpty)
    assert(out.count() == 500)
  }

  test("sp01 split/sample is a stable property of the document") {
    val s = graft.operators.Sampling.sp01SplitSample(spark, sf)
    // en keeps 100% by configuration — no en document is ever sampled out
    assert(s.where(col("lang") === "en" && !col("kept")).isEmpty)
    // the train fraction lands near the 90% design point
    val frac = s.where(col("split") === "train").count().toDouble / s.count()
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac")
    // decisions are hash-derived, not run-derived: a second evaluation
    // (fresh plan, different partitioning) agrees row-for-row
    val again = graft.operators.Sampling.sp01SplitSample(spark, sf)
      .repartition(7)
    assert(s.except(again).isEmpty && again.except(s).isEmpty)
  }

  test("sp06 shuffle-shard is a deterministic permutation into shards") {
    val out = graft.operators.Sampling.sp06ShuffleShard(spark, sf)
    val n = graft.sources.Tables.t(spark, sf, "documents").count()
    // a PERMUTATION: every document exactly once, positions contiguous
    // 1..|shard| within each shard (no gaps, no collisions)
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
    assert(out.groupBy("shard")
      .agg(count(lit(1)).as("cnt"), max("pos").as("mx"), min("pos").as("mn"))
      .where(col("mx") =!= col("cnt") || col("mn") =!= 1).isEmpty,
      "positions are not contiguous 1..n per shard")
    // placement is hash-derived, not run-derived: a reshuffled
    // re-evaluation agrees row-for-row
    val again = graft.operators.Sampling.sp06ShuffleShard(spark, sf)
      .repartition(7)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // the shuffle actually breaks id-order locality: consecutive ids
    // land apart (the whole point vs reading the corpus in id order)
    val sameShardAdjacent = out.as("a")
      .join(out.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .where(col("a.shard") === col("b.shard"))
      .count()
    assert(sameShardAdjacent < n / 2,
      s"$sameShardAdjacent of $n consecutive-id pairs share a shard")
  }

  test("m01 oracle bytes-vs-chars equivalence holds: fixtures ASCII, non-empty, every SF") {
    // the m01/m02 DuckDB oracles compute checksums per CHARACTER while the
    // engine computes per BYTE — equal only for non-empty pure-ASCII text.
    // Assert that precondition on every fixture SF so a future non-ASCII
    // fixture fails HERE, not as a mysterious oracle hash mismatch.
    // Scaled rehearsal dirs (tools/ScaleUp output) are covered too when
    // present: the r13 verdict's standing requirement is that EVERY newly
    // generated SF re-proves the property, not just the driver fixtures.
    val scaled = Seq("/root/repo/target/sf1", "/root/repo/target/sf10")
      .filter(d => new java.io.File(d, "documents.parquet").exists())
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1") ++ scaled) {
      val bad = graft.sources.Tables.t(spark, dir, "documents")
        .where(octet_length(col("text")) =!= length(col("text")) ||
          length(col("text")) === 0)
      assert(bad.isEmpty, s"non-ASCII or empty document text in $dir")
    }
  }

  test("t08 scrub: hit accounting exact, no-match pattern is the identity") {
    val s = TextAnalysis.t08Scrub(spark, sf)
    // every hit replaces a match ('customer'=8 or 'vector'=6 chars) with
    // '[X]' (3) — n_chars_scrubbed plus the removed chars must reconstruct
    // the original length, which proves n_hits counts ALL matches
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("orig"))
    val hits8 = size(regexp_extract_all(col("text"), lit("\\bcustomer\\b"), lit(0)))
    val perLen = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), hits8.as("h8"))
    val joined = s.join(docs, "doc_id").join(perLen, "doc_id")
      .withColumn("h6", col("n_hits") - col("h8"))
      .where(col("n_chars_scrubbed") =!=
        col("orig") - col("h8") * (8 - 3) - col("h6") * (6 - 3))
    assert(joined.isEmpty)
    assert(s.agg(sum("n_hits")).collect()(0).getLong(0) > 0, "vacuous scrub")
    // a pattern that matches nothing must return the text untouched
    val id = TextAnalysis.scrub(spark, sf, "\\bzzz_never_there\\b", "[X]")
    assert(id.where(col("n_hits") =!= 0).isEmpty)
    assert(id.join(graft.sources.Tables.t(spark, sf, "documents"), "doc_id")
      .where(col("scrubbed") =!= col("text")).isEmpty)
  }

  test("t09 corpus top-k ngrams: counts match a direct aggregation") {
    val top = TextAnalysis.topNgrams(spark, sf, 5).collect()
    assert(top.length == 5)
    // monotone non-increasing counts, gram-ordered within ties
    top.sliding(2).foreach { case Array(a, b) =>
      val (na, nb) = (a.getLong(1), b.getLong(1))
      assert(na > nb || (na == nb && a.getString(0) < b.getString(0)))
    }
    // the #1 gram's count agrees with counting it directly in the text
    val (gram, n) = (top(0).getString(0), top(0).getLong(1))
    val direct = graft.sources.Tables.t(spark, sf, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .count() // sanity: corpus has tokens at all
    assert(direct > 0 && n > 1, s"vacuous fixture for $gram")
    // plan shape: global top-k must be TakeOrderedAndProject, not a sort
    val plan = TextAnalysis.topNgrams(spark, sf, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("dd07 passage dedup: exact-duplicate documents share all passages") {
    val d = Dedup.dd07PassageDedup(spark, sf)
    // passage count is ceil(tokens/20) per document
    val toks = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).as("nt"))
    assert(d.join(toks, "doc_id")
      .where(col("n_passages") =!= ceil(col("nt") / lit(20.0))).isEmpty)
    // a document that is an exact duplicate of another (same fingerprint)
    // must have EVERY passage flagged as duplicated
    val dupDocs = Dedup.dd01Exact(spark, sf).where(!col("keep"))
      .select("doc_id")
    val broken = d.join(dupDocs, "doc_id")
      .where(col("n_dup_passages") =!= col("n_passages"))
    assert(broken.isEmpty)
    assert(d.agg(sum("n_dup_passages")).collect()(0).getLong(0) > 0,
      "vacuous passage dedup")
  }

  test("dd08 incremental admit: unseen-in-corpus and first-in-batch, both live") {
    val d = Dedup.dd08IncrementalDedup(spark, sf)
    val admitted = d.where(col("admitted"))
    val rejected = d.where(!col("admitted"))
    // both rejection modes must actually occur on the fixture
    assert(rejected.count() > 0 && admitted.count() > 0, "vacuous split")
    // admitted fingerprints are unique within the batch
    assert(admitted.groupBy("fp").count().where(col("count") > 1).isEmpty)
    // every rejected doc has a cause: its fp exists in the historical half
    // or an earlier incoming doc holds it
    val fps = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        md5(array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 10),
          " ")).as("fp"))
    val exFps = fps.where(col("doc_id") % 2 === 0).select("fp").distinct()
      .withColumn("inHist", lit(true))
    val uncaused = rejected.join(exFps, Seq("fp"), "left")
      .join(d.groupBy("fp").agg(min("doc_id").as("mn")), "fp")
      .where(col("inHist").isNull && col("doc_id") === col("mn"))
    assert(uncaused.isEmpty)
  }

  test("incrementalAdmit: null keys surface as admitted, never vanish") {
    import spark.implicits._
    val ex = Seq((1L, Option("a"))).toDF("doc_id", "fp")
    val inc = Seq((10L, Option("a")), (11L, Option.empty[String]),
      (12L, Option.empty[String]), (13L, Option("b")))
      .toDF("doc_id", "fp")
    val out = Dedup.incrementalAdmit(ex, inc)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // no row lost to a null equi-join; null-keyed docs admitted verbatim
    assert(out == Map(10L -> false, 11L -> true, 12L -> true, 13L -> true))
  }

  test("m01 multimodal decode: checksum in [0,256), frames at stride 100") {
    val out = Multimodal.m01Decode(spark, sf)
    assert(out.where(col("checksum") < 0 || col("checksum") > 255).isEmpty)
    assert(out.where(col("n_frames") =!=
      floor((col("n_bytes") - 1) / 100) + 1).isEmpty)
  }

  test("t10 common-token ratio: learned vocab of the whole corpus is the identity") {
    // With v ≥ the corpus vocabulary every token is "common" — the learned
    // table saturates and the ratio must be exactly 1.0 for every document
    val all = TextAnalysis.commonTokenRatio(spark, sf, v = 1000000)
    assert(all.where(col("common_ratio") =!= 1.0).isEmpty)
    // and the declared v=20 query is a proper sub-ratio: bounded by (0, 1]
    val t10 = TextAnalysis.t10CommonRatio(spark, sf)
    assert(t10.where(col("common_ratio") <= 0.0 ||
      col("common_ratio") > 1.0).isEmpty)
    // monotone in v: a larger vocabulary can only raise each doc's count
    val t10big = TextAnalysis.commonTokenRatio(spark, sf, v = 25)
      .select(col("doc_id"), col("n_common").as("big"))
    assert(t10.join(t10big, "doc_id")
      .where(col("n_common") > col("big")).isEmpty)
  }

  test("sp03 temperature mix: decisions are document properties, rates honored") {
    import graft.operators.Sampling
    val out = Sampling.sp03TemperatureMix(spark, sf)
    // one count per source, constant across its documents and equal to the
    // source's actual document count
    val perSource = out.groupBy("source", "n_source")
      .agg(count(lit(1)).as("n"))
    assert(perSource.groupBy("source").agg(count(lit(1)).as("d"))
      .where(col("d") =!= 1).isEmpty)
    assert(perSource.where(col("n") =!= col("n_source")).isEmpty)
    // c large enough to cover every source ⇒ keep-all (rate clamps at 1)
    val keepAll = Sampling.temperatureMix(spark, sf, c = 1e6)
    assert(keepAll.where(!col("kept")).isEmpty)
    // kept fraction tracks min(1, c/sqrt(n)) within binomial noise per source
    val rates = out.groupBy("source", "n_source")
      .agg(avg(when(col("kept"), 1.0).otherwise(0.0)).as("frac"))
      .withColumn("rate", least(lit(1.0), lit(3.0) / sqrt(col("n_source"))))
      .where(abs(col("frac") - col("rate")) >
        lit(4.0) * sqrt(col("rate") * (lit(1.0) - col("rate")) /
          col("n_source")) + lit(0.02))
    assert(rates.isEmpty)
    // determinism: same document, same decision, independent of run
    val again = Sampling.sp03TemperatureMix(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("q28 cube: grouping_id stratifies the four grouping sets coherently") {
    val out = graft.operators.Relational.q28Cube(spark, sf).collect()
    val orders = graft.sources.Tables.t(spark, sf, "orders").count()
    // gid=3: the grand total — exactly one row, counting every order
    val grand = out.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == orders)
    // gid=1: priority rolled away (null), status present — Spark's MSB-first
    // bit order must match the oracle's GROUPING(a, b)
    assert(out.filter(_.getAs[Long]("gid") == 1L)
      .forall(r => r.getAs[String]("o_orderstatus") != null &&
        r.getAs[String]("o_orderpriority") == null))
    assert(out.filter(_.getAs[Long]("gid") == 2L)
      .forall(r => r.getAs[String]("o_orderstatus") == null &&
        r.getAs[String]("o_orderpriority") != null))
    // every grouping set totals to the same corpus count
    for (g <- Seq(0L, 1L, 2L))
      assert(out.filter(_.getAs[Long]("gid") == g)
        .map(_.getAs[Long]("n")).sum == orders)
  }

  test("dd09 duplicate spans: stride-1 windows catch straddling copies dd07 misses") {
    import spark.implicits._
    // two docs share a 20-token run that is OFFSET by 10 tokens in the
    // second doc — it straddles dd07's aligned 20-token chunk boundary
    // (no chunk of A equals any chunk of B) but stride-1 windows find it
    val run = (1 to 20).map(i => s"dup$i").mkString(" ")
    val a = s"${(1 to 10).map(i => s"a$i").mkString(" ")} $run " +
      (1 to 10).map(i => s"z$i").mkString(" ")
    val b = s"$run ${(1 to 20).map(i => s"b$i").mkString(" ")}"
    val dir = java.nio.file.Files.createTempDirectory("dd09").toString
    Seq((0L, a, "en", "s", a.length.toLong), (1L, b, "en", "s", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = Dedup.duplicateSpans(spark, dir, windowTokens = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(spans(0L) >= 1 && spans(1L) >= 1, s"straddling run missed: $spans")
    val chunks = Dedup.passageDedup(spark, dir, passageTokens = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunks(0L) == 0 && chunks(1L) == 0,
      s"fixture broken — the run must straddle chunk alignment: $chunks")
    // and a document shorter than the window reports zero windows, present
    val tiny = java.nio.file.Files.createTempDirectory("dd09b").toString
    Seq((7L, "just five little tokens here", "en", "s", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tiny/documents.parquet")
    val short = Dedup.duplicateSpans(spark, tiny, windowTokens = 20).collect()
    assert(short.length == 1 && short.head.getLong(1) == 0 &&
      short.head.getLong(2) == 0)
  }

  test("generic Of-surfaces run on arbitrary in-memory frames") {
    import spark.implicits._
    // no parquet, no testdata layout — any (doc_id, text) frame is a
    // valid input to the dedup family's generic surfaces
    val docs = Seq(
      (1L, "a b c d e a b c d e"),
      (2L, "a b c d e a b c d e"),
      (3L, "totally different text here")).toDF("doc_id", "text")
    val nd = Dedup.minhashNearDupsOf(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.toSeq == Seq((1L, 2L)))
    val pd = Dedup.passageDedupOf(docs, passageTokens = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // both copies of the repeated 5-token passage occur 4x corpus-wide
    assert(pd(1L) == 2 && pd(2L) == 2 && pd(3L) == 0)
    val ds = Dedup.duplicateSpansOf(docs, windowTokens = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ds(1L) > 0 && ds(2L) > 0 && ds(3L) == 0)
  }

  test("t11 bins are monotone in quality; t12 profile partitions the corpus") {
    val bins = TextAnalysis.t11QualityBins(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(bins.forall { case (_, b) => b >= 0 && b <= 3 })
    // a higher-quality doc can never land in a lower bin
    val sorted = bins.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case ((_, b1), (_, b2)) => b1 <= b2 })
    assert(bins.map(_._2).distinct.length >= 3, "degenerate cutoffs")
    val prof = TextAnalysis.t12CorpusProfile(spark, sf)
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    assert(prof.agg(sum("n_docs")).head().getLong(0) == docs.count())
    assert(prof.where(col("mean_quality") < 0 ||
      col("mean_quality") > 1).isEmpty)
  }

  test("persisted IVF index: probes prune cell partitions and match the in-memory path") {
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.buildIvfIndex(spark, sf, path, iters = 1)
    // the probe vector is corpus vector 0's floats — quantization on the
    // driver must reproduce the indexed q exactly, so the probe result
    // must equal ivfAnnTrained's (same cells, same nprobe, vec 0 excluded)
    val q0 = graft.sources.Tables.t(spark, sf, "embeddings")
      .where(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).toArray
    // with nprobe ≥ every cell the probe degenerates to exact brute force
    // over the index content — equality with ss01 proves the persisted
    // (q, n2) rows and the probe's driver-side quantization are faithful
    val nCells = spark.read.parquet(s"$path/_centroids").count().toInt
    val full = Similarity.probeIvfIndex(spark, path, q0,
      nprobe = nCells, k = 10, excludeIds = Seq(0L))
    assert(full.collect().toSeq ==
      Similarity.ss01CosineTopK(spark, sf).collect().toSeq)
    val probe = Similarity.probeIvfIndex(spark, path, q0,
      nprobe = 2, k = 10, excludeIds = Seq(0L))
    // pruned probes scan a PREFIX of the centroid ranking, so recall is
    // monotone in nprobe and the k=10 fixture recalls something at 2 cells
    val fullSet = full.collect().map(_.getLong(0)).toSet
    def recallAt(np: Int): Double =
      Similarity.probeIvfIndex(spark, path, q0, nprobe = np, k = 10,
        excludeIds = Seq(0L)).collect().map(_.getLong(0)).count(fullSet) / 10.0
    val r2 = probe.collect().map(_.getLong(0)).count(fullSet) / 10.0
    assert(r2 > 0.0, "nprobe=2 recalls nothing")
    val r4 = recallAt(4)
    assert(r4 >= r2, s"recall not monotone in nprobe: $r2 -> $r4")
    // physical proof the layout IS the index: the probed cells arrive as
    // PartitionFilters (directory pruning — the scan never lists the
    // other cells) and the data filter column list stays partition-free
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*cell.* IN \\(".r
      .findFirstIn(plan).isDefined, s"no partition pruning:\n$plan")
  }

  test("iterative operators free superseded round state (unpin discipline)") {
    // dd06 pins one frame per round plus the pair/edge frames; everything
    // but the surviving label leaves must be unpersisted by the time the
    // result materializes — otherwise executor storage grows linearly with
    // round count at scale. Suites share one SparkContext and run
    // concurrently, so the audit uses Materialize.pinLog filtered to THIS
    // thread (pin runs on the operator's calling thread): exactly the
    // operator's own pins, zero allowance for neighbors — and never
    // Bench.dropPins here, which would unpersist a concurrent suite's
    // live pins out from under it
    val me = Thread.currentThread().getId
    def myPinsSince(mark: Int): Seq[Int] = {
      import scala.jdk.CollectionConverters._
      Materialize.pinLog.asScala.toSeq.drop(mark)
        .collect { case (t, id) if t == me => id }
    }
    def live(ids: Seq[Int], settleTo: Int): Seq[Int] = {
      // operator-internal unpins are deliberately non-blocking (the
      // operator must not stall on block eviction), so under concurrent
      // suite load a superseded pin can linger — the r9-flagged flake
      // was exactly this: a no-shrink quiet window expired while an
      // enqueued unpersist was still queued behind a neighbor suite's
      // jobs, reporting 2 live pins for a steady state of 1 (observed
      // again in round 13: two full-suite runs under driver load tripped
      // the 5 s window; isolation and a quiet machine always pass). The
      // invariant is "eventually bounded", not "instantaneously bounded",
      // and the quiet-window heuristic only bought faster FAILURE
      // reporting at the price of load-dependent false positives — so
      // poll plainly to the hard deadline and exit early once ≤ settleTo
      // pins remain. A genuine leak never shrinks to the floor and is
      // still reported in full; only the failure path pays the wait.
      // Deadline 300 s, not 60: the 60 s edition tripped a THIRD time
      // under a concurrent perf JVM (r9, r13, r14-judging) — a gate that
      // fails under neighbor load trains people to rerun, which is how
      // real failures get ignored. Worst observed contention (a full
      // parallel suite + perf JVMs) clears in well under five minutes;
      // clean runs still exit the moment pins settle.
      val deadline = System.nanoTime() + 300000000000L
      def snap() = ids.filter(spark.sparkContext.getPersistentRDDs.keySet)
      var out = snap()
      while (out.size > settleTo && System.nanoTime() < deadline) {
        Thread.sleep(100)
        out = snap()
      }
      out
    }
    // the log is OFF in production (it would grow forever in a long-lived
    // job); enable only for this audit's window
    Materialize.pinLogEnabled.set(true)
    try {
      val mark1 = Materialize.pinLog.size()
      Dedup.dd06NearDupClusters(spark, sf).count()
      val dd06Live = live(myPinsSince(mark1), settleTo = 3)
      // the RESULT legitimately references its final-round frames (label
      // leaves + edge/sig pins) — bounded by the plan SHAPE (3), never by
      // round count
      assert(dd06Live.size <= 3,
        s"${dd06Live.size} of dd06's own pins survive — unpin regressed")
      // the real linear-growth invariant, now directly assertable: more
      // Lloyd rounds must NOT leave more pins behind
      def kmLive(iters: Int): Int = {
        val mark = Materialize.pinLog.size()
        Similarity.kmeansFit(spark, sf, iters).count()
        // settleTo = 1: kmeansFit's steady state is its one result pin
        // (observed in every clean run); a growth-with-iters leak never
        // shrinks to it and is still reported in full
        live(myPinsSince(mark), settleTo = 1).size
      }
      val (lo, hi) = (kmLive(2), kmLive(5))
      assert(hi <= lo && lo <= 2,
        s"kmeansFit live pins grew with iteration count: iters=2 → $lo, " +
          s"iters=5 → $hi")
    } finally {
      Materialize.pinLogEnabled.set(false)
      Materialize.pinLog.clear()
    }
  }

  test("q29 time buckets partition the corpus: counts total, users bounded") {
    val out = graft.operators.Relational.q29TimeBuckets(spark, sf)
    val events = graft.sources.Tables.t(spark, sf, "events")
    assert(out.agg(sum("n")).head().getLong(0) == events.count())
    // per-bucket distinct users can never exceed the bucket's event count
    assert(out.where(col("users") > col("n")).isEmpty)
  }

  test("q32 trailing-hour frame: row per event, bounds, brute-force agreement") {
    val out = graft.operators.Relational.q32MovingWindow(spark, sf)
    val rows = out.collect()
    val events = graft.sources.Tables.t(spark, sf, "events")
    assert(rows.length == events.count())
    // every frame contains at least its own row; count × min-cent bound
    assert(rows.forall(_.getLong(3) >= 1))
    // brute-force the frame per event on the driver: rows with same user,
    // ts' in [ts - 1h, ts]
    val evs = rows.map(r => (r.getLong(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    for (r <- rows.take(200)) {
      val (u, ts, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val want = byUser(u).count(e => e._2 >= ts - 3600000000L && e._2 <= ts)
      assert(n == want, s"user $u ts $ts: frame $n vs brute $want")
    }
  }

  test("dd10 bloom-admit is row-identical to the exact incremental admit") {
    // the whole point of the shared oracle: the Bloom filter has no false
    // negatives and the exact join kills its false positives, so the two
    // paths must agree row-for-row, not just on counts
    val exact = Dedup.dd08IncrementalDedup(spark, sf).collect().toSeq
    val bloom = Dedup.dd10BloomAdmit(spark, sf).collect().toSeq
    assert(bloom == exact && exact.nonEmpty)
    // and the probe is really in the plan as the codegen'd predicate (not
    // a silently-dropped filter): the ledger scan carries it
    val plan = Dedup.dd10BloomAdmit(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"), plan.take(1500))
  }

  test("bloomAdmit: partition-independent build; null fps admitted verbatim") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "fp")
    val incoming = Seq((10L, Some("a")), (11L, Some("c")),
      (12L, Option.empty[String]), (13L, Some("c"))).toDF("doc_id", "fp")
    def run(ex: org.apache.spark.sql.DataFrame,
        in: org.apache.spark.sql.DataFrame) =
      Dedup.bloomAdmit(ex, in).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    val out = run(existing, incoming)
    // 10 clashes with the ledger; 11 is first-of-batch for c; 12 has no
    // key (admitted verbatim); 13 loses first-in-batch to 11
    assert(out == Seq((10L, false), (11L, true), (12L, true), (13L, false)))
    // a Bloom bit set is an OR of per-item bit sets — rebuilding from any
    // partitioning admits the identical set
    assert(run(existing.repartition(5), incoming.repartition(3)) == out)
  }

  test("sp07 chunk windows: coverage, bounds, and the stride arithmetic") {
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val out = graft.operators.Sampling.chunkWindowsOf(docs,
      window = 40, stride = 30)
    val toks = docs.select(col("doc_id"),
      size(split(lower(trim(col("text"))), "\\s+")).as("n"))
    val agg = out.groupBy("doc_id").agg(
      count(lit(1)).as("chunks"),
      // chunk c starts at (c-1)·stride+1 and holds n_tokens tokens, so
      // its last covered token is (c-1)·stride+n_tokens
      max((col("chunk") - 1) * 30 + col("n_tokens")).as("last_covered"),
      max("n_tokens").as("mx"), min("n_tokens").as("mn"))
      .join(toks, "doc_id")
    // every document chunked; chunk count is the stride formula; the final
    // window reaches the last token (full coverage, stride ≤ window);
    // no window exceeds `window` tokens or is empty
    assert(agg.count() == docs.count())
    assert(agg.where(col("chunks") =!= expr("(n - 1) div 30 + 1")).isEmpty)
    assert(agg.where(col("last_covered") =!= col("n")).isEmpty)
    assert(agg.where(col("mx") > 40 || col("mn") < 1).isEmpty)
  }

  test("c07 report is exactly c04's flags rolled up by source") {
    import spark.implicits._
    val flags = graft.operators.Curation.c04Decontaminate(spark, sf)
    val report = graft.operators.Curation.c07ContaminationReport(spark, sf)
      .collect()
    assert(report.nonEmpty)
    val nDocs = report.map(_.getLong(1)).sum
    val nCont = report.map(_.getLong(2)).sum
    assert(nDocs == flags.count())
    assert(nCont ==
      flags.where(col("contaminated")).count())
    val maxShared = report.map(_.getLong(3)).max
    assert(maxShared ==
      flags.agg(max("n_shared")).collect()(0).getLong(0))
    // per-mille is the exact integer division of the row's own counts
    for (r <- report)
      assert(r.getLong(4) == r.getLong(2) * 1000 / r.getLong(1))
  }

  test("c06 embedding decontamination max_cos agrees with ss01's exact cosines") {
    // benchmark = {vec 0} makes max_cos(w) ≡ cos(w, v0): the ss01 top-10
    // values must reappear identically through the c06 path
    val top = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dec = graft.operators.Curation.embeddingDecontaminate(
        spark, sf, col("vec_id") === 0, minCos = 0.4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top.nonEmpty)
    top.foreach { case (id, c) =>
      assert(dec(id) == c, s"vec $id: c06=${dec(id)} ss01=$c") }
  }

  test("c06 with an empty benchmark set contaminates nothing and keeps every row") {
    val out = graft.operators.Curation.embeddingDecontaminate(
      spark, sf, lit(false), minCos = 0.4)
    assert(out.count() ==
      graft.sources.Tables.t(spark, sf, "embeddings").count())
    assert(out.where(col("contaminated")).isEmpty)
    assert(out.where(col("max_cos").isNotNull).isEmpty)
  }

  test("dd11 winnowing guarantee: shared run of w+k-1 tokens shares a fingerprint") {
    import spark.implicits._
    // k=3, w=4 ⇒ guarantee floor w+k−1 = 6 tokens: a shared 6-token run
    // gives 4 consecutive shared gram hashes, both documents slide a
    // window over exactly those 4, and that window's min is emitted by
    // both. Doc 3 shares no vocabulary — zero shared fingerprints.
    val planted = "the quick brown fox jumps high"
    val docs = Seq(
      (1L, s"alpha beta gamma $planted delta epsilon"),
      (2L, s"one two three four $planted five six seven"),
      (3L, "completely different words with nothing in common at all"))
      .toDF("doc_id", "text")
    def sketch(id: Long) = Dedup.winnowOf(docs, k = 3, w = 4)
      .where(col("doc_id") === id).collect().map(_.getLong(1)).toSet
    val (a, b, c) = (sketch(1), sketch(2), sketch(3))
    assert((a & b).nonEmpty, "shared 6-token run lost by winnowing")
    assert((a & c).isEmpty && (b & c).isEmpty)
    // density: the sketch thins the gram stream (strict subset of gram
    // hashes; ~2/(w+1) expected) and every ≥k-token doc is sketchable
    assert(a.size <= 11 - 2 && a.nonEmpty) // doc 1 has 11 tokens, 9 grams
    // short docs: fewer grams than w still emit their (single) min; and
    // sub-k docs vanish rather than erroring
    val tiny = Seq((7L, "just four little words"), (8L, "too short"))
      .toDF("doc_id", "text")
    val t = Dedup.winnowOf(tiny, k = 3, w = 4)
      .collect().map(r => r.getLong(0)).toSeq
    assert(t == Seq(7L), s"short-doc handling: $t")
  }

  test("dd12 winnow pairs equal driver-side sketch intersections") {
    // the salted self-join + count must reproduce exactly |Sa ∩ Sb| ≥ 2
    // over the dd11 sketches — pair-set AND count equality, the
    // Skew.selfPairs no-dup/no-loss contract applied to real sketches
    val sk = Dedup.winnowOf(
        graft.sources.Tables.t(spark, sf, "documents"), k = 3, w = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val want = (for {
      (a, sa) <- sk.toSeq; (b, sb) <- sk.toSeq if a < b
      n = (sa & sb).size if n >= 2
    } yield (a, b, n.toLong)).toSet
    val got = Dedup.dd12WinnowPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("t17 BM25: k results, positive descending scores, top-k plan") {
    val out = TextAnalysis.t17Bm25(spark, sf)
    val rows = out.collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // saturation sanity: a doc scoring top must actually contain a query
    // term more often than the corpus floor — tf of 'hash'+'join'+'vector'
    // in the top doc is positive by construction of a positive score
    val plan = TextAnalysis.t17Bm25(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k did not plan as TakeOrderedAndProject:\n$plan")
  }

  test("bm25TopK: more occurrences of a query term outrank fewer, same length") {
    import spark.implicits._
    val dir = tmpDir("bm25")
    Seq(
      (1L, "vector vector vector pad pad pad"),
      (2L, "vector vector pad pad pad pad"),
      (3L, "vector pad pad pad pad pad"),
      (4L, "pad pad pad pad pad pad"))
      .toDF("doc_id", "text").write.parquet(dir + "/documents.parquet")
    val got = TextAnalysis.bm25TopK(spark, dir, Seq("vector"), k = 4)
      .collect().map(_.getLong(0)).toSeq
    // tf monotone at equal length; the zero-tf doc scores 0 and ranks last
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("t18 rules: stats consistent, pass == conjunction, filter discriminates") {
    val rows = TextAnalysis.t18QualityRules(spark, sf).collect()
    assert(rows.nonEmpty)
    // pass is exactly the conjunction of its five gates, row by row
    for (r <- rows) {
      val gates = Seq("r_words", "r_mean_len", "r_distinct", "r_stop",
        "r_top").map(c => r.getBoolean(r.fieldIndex(c)))
      assert(r.getBoolean(r.fieldIndex("pass")) == gates.forall(identity))
    }
    // the composite gate must actually split the corpus (a rule list that
    // keeps or drops everything is mis-thresholded)
    val kept = rows.count(_.getBoolean(rows.head.fieldIndex("pass")))
    assert(kept > 0 && kept < rows.length, s"kept $kept of ${rows.length}")
  }

  test("qualityRulesOf: each gate rejects exactly its designed violation") {
    import spark.implicits._
    val dir = tmpDir("t18")
    Seq(
      // 0: passes every default gate: 30+ distinct-ish words, stopwords,
      //    no dominant token
      (0L, (1 to 30).map(i => if (i % 15 == 0) "the" else if (i % 15 == 1) "a"
        else s"word$i").mkString(" ")),
      (1L, "too short"), // r_words
      (2L, (1 to 30).map(i => if (i % 2 == 0) "the" else "a")
        .mkString(" ")), // r_mean_len low (all 1–3 char), r_distinct
      (3L, (1 to 30).map(i => s"word$i").mkString(" ")), // r_stop only
      (4L, ("the a " + "spam " * 28).trim)) // r_top: 'spam' is 28/30
      .toDF("doc_id", "text").write.parquet(dir + "/documents.parquet")
    val out = TextAnalysis.qualityRulesOf(
      spark.read.parquet(dir + "/documents.parquet")).collect()
      .map(r => r.getLong(0) -> r).toMap
    def g(id: Long, c: String) = out(id).getBoolean(out(id).fieldIndex(c))
    assert(g(0L, "pass"), s"doc 0 should pass: ${out(0L)}")
    assert(!g(1L, "r_words") && !g(1L, "pass"))
    assert(!g(2L, "r_mean_len") && !g(2L, "r_distinct") && !g(2L, "pass"))
    assert(!g(3L, "r_stop") && !g(3L, "pass"))
    assert(!g(4L, "r_top") && !g(4L, "pass"))
  }

  test("sp09 epoch mix: integer epochs exact, fractional bounded, deterministic") {
    import spark.implicits._
    val out = Sampling.sp09EpochMix(spark, sf)
    val perDoc = out.groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n"), max("copy").as("mx"))
      .collect()
    assert(perDoc.nonEmpty)
    for (r <- perDoc) {
      val (src, n, mx) = (r.getString(0), r.getLong(2), r.getLong(3))
      val w = Map("src0" -> 2500, "src1" -> 1000, "src2" -> 300,
        "src3" -> 1500)(src)
      // copies ∈ {⌊w/1000⌋, ⌊w/1000⌋+1} and copy numbering is 1..n
      assert(n == w / 1000 || n == w / 1000 + 1, s"$src: $n copies")
      assert(mx == n)
    }
    // integer epoch factor ⇒ exactly that many copies for EVERY doc
    assert(perDoc.filter(_.getString(0) == "src1").forall(_.getLong(2) == 1L))
    // whole-epoch floor: src0 at 2.5 epochs gives every doc >= 2 copies
    assert(perDoc.filter(_.getString(0) == "src0").forall(_.getLong(2) >= 2L))
    // repetition decisions are document properties: a reshuffled input
    // produces the identical replicated corpus
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val a = Sampling.epochMixOf(docs, Seq("src2" -> 300))
      .collect().map(_.toSeq).toSet
    val b = Sampling.epochMixOf(docs.repartition(7), Seq("src2" -> 300))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("sp08 weighted mix hits exact per-mille proportions, capped at supply") {
    // fixture: 20 sources × 25 docs; budget = 500/10 = 50 → targets
    // 20/15/10/5 for src0..src3, all under the 25-doc supply → EXACT
    val out = graft.operators.Sampling.sp08WeightedMix(spark, sf)
    val counts = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "src0" -> 20L, "src1" -> 15L, "src2" -> 10L, "src3" -> 5L))
    // the selection is a corpus property: identical under repartition
    val again = graft.operators.Sampling.sp08WeightedMix(spark, sf)
      .repartition(7)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    // supply cap: a budget demanding more than a source holds under-fills
    // at what exists (25), never upsamples
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val big = graft.operators.Sampling.mixToWeightsOf(docs,
      Seq("src0" -> 500, "src1" -> 500), budget = lit(10000L))
    val bigCounts = big.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigCounts == Map("src0" -> 25L, "src1" -> 25L))
  }

  test("dd13 CDC chunks re-synchronize after an insertion; dd07 alignment doesn't") {
    import spark.implicits._
    // doc B = doc A with ONE token inserted at the front. Every aligned
    // fixed window of A is shifted in B — dd07 sees zero duplication —
    // but content-defined boundaries re-synchronize at the next gate
    // token, so dd13 flags most of both docs as duplicated chunks.
    val base = (1 to 400).map(i => s"w${i}x").mkString(" ")
    val docs = Seq((0L, base), (1L, s"inserted $base"))
      .toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedupOf(docs, divisor = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, (n, dup)) <- cdc)
      assert(dup.toDouble / n >= 0.8,
        s"doc $id: only $dup of $n chunks re-synchronized")
    val fixed = Dedup.passageDedupOf(docs, passageTokens = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fixed(0L) == 0 && fixed(1L) == 0,
      s"fixture broken — the insertion must desync dd07 windows: $fixed")
  }

  test("ss12 int8 SQ is the fidelity end of the dial: recall beats PQ m=4") {
    val exact = Similarity.ss01CosineTopK(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val sq = Similarity.ss12SqAdcTopK(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val pq = Similarity.ss10PqAdcTopK(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val (rSq, rPq) = ((sq & exact).size, (pq & exact).size)
    assert(rSq >= 8, s"SQ recall@10 floor broken: $rSq")
    assert(rSq >= rPq, s"8-bit/dim SQ ($rSq) must not lose to 4-byte PQ ($rPq)")
  }

  test("ss13 MIPS ranks by magnitude; cosine deliberately does not") {
    import spark.implicits._
    // a: long but slightly misaligned — wins on inner product;
    // b: short but perfectly aligned — wins on cosine
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(10f, 1f)), (2L, Array(0.5f, 0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.mipsTopKOf(vecs, queryId = 0L, k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top.head.getLong(1) == 10000000L) // 10000·1000 + 1000·0, exact
  }

  test("sp10 curriculum seq is the exact global (quality DESC, id) rank") {
    val out = Sampling.sp10Curriculum(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // contiguous 1..N
    assert(out.map(_._3).sorted.toSeq == (1L to out.length).toSeq)
    // and identical to the one-task window formulation, computed naively
    val naive = out.sortBy { case (id, q, _) => (-q, id) }
      .zipWithIndex.map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    for ((id, _, seq) <- out)
      assert(naive(id) == seq, s"doc $id: seq $seq != naive ${naive(id)}")
  }

  test("c08 split is leakage-safe: no near-dup edge straddles the boundary") {
    val split = graft.operators.Curation.c08ClusterSafeSplit(spark, sf)
    val byDoc = split.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = Dedup.dd05SimhashPairs(spark, sf).select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup edges to test with")
    for ((a, b) <- pairs)
      assert(byDoc(a) == byDoc(b), s"pair ($a, $b) straddles the split")
    assert(byDoc.values.toSet.contains("train"))
  }

  test("t21 entropy: 0 for constant docs, ln k for uniform, order-invariant") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x x x x x x"),             // constant → 0
      (1L, "a b c d"),                 // uniform over 4 → ln 4
      (2L, "d b a c"),                 // same multiset, other order
      (3L, "a a a b")                  // skewed: between 0 and ln 2... ln 4
    ).toDF("doc_id", "text")
    val h = TextAnalysis.tokenEntropyOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(h(0L) == 0.0)
    assert(math.abs(h(1L) - math.log(4)) < 1e-3)
    assert(h(1L) == h(2L), "entropy must be order-invariant")
    assert(h(3L) > 0.0 && h(3L) < math.log(4))
  }

  test("q33 bucketed interval join equals the naive range predicate") {
    import graft.operators.Relational
    val out = Relational.q33IntervalJoin(spark, sf)
      .collect().map(_.toSeq).toSet
    val e = graft.sources.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        expr("CAST(ts DIV 1000 AS BIGINT)").as("tsu"), col("event_type"))
    val naive = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("tsu").as("pt"))
      .join(e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("u2"), col("tsu").as("s")),
        col("user_id") === col("u2") && col("pt") >= col("s") &&
          col("pt") < col("s") + 3600000000L)
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        (col("pt") - col("s")).as("delta_us"))
      .collect().map(_.toSeq).toSet
    assert(out == naive && out.nonEmpty)
  }

  test("q34 funnel stages are ordered and consistent with their timestamps") {
    val out = graft.operators.Relational.q34Funnel(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (v, c, p, stage) = (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))
      // stage == chain depth, and each stage's timestamp is ≥ the previous
      assert(stage == Seq(v, c, p).takeWhile(_.isDefined).length)
      if (c.isDefined) assert(v.isDefined && c.get >= v.get)
      if (p.isDefined) assert(c.isDefined && p.get >= c.get)
    }
  }

  test("sp11 token budget: kept set is the exact greedy prefix per source") {
    // Brute-force oracle: sort each source by (quality DESC, doc_id), admit
    // while the budget isn't spent. The distributed two-level formulation
    // must reproduce it exactly, including the straddling last document.
    val budget = 2000L
    val scored = graft.sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long")
          .as("n_tokens"),
        TextAnalysis.quality(col("text")).as("quality"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (_, docs) =>
      val ordered = docs.sortBy { case (id, _, _, q) => (-q, id) }
      val cums = ordered.scanLeft(0L)(_ + _._3)
      ordered.zip(cums).collect { case (d, before) if before < budget => d._1 }
    }.toSet
    val got = Sampling.sp11TokenBudget(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSet == expected && expected.nonEmpty)
    // cum_tokens is the true inclusive running sum in admission order
    for (r <- got) assert(r.getLong(4) - r.getLong(3) < budget)
  }

  test("dd14 soft dedup: n_dups is the fp group size, weights sum to ~1") {
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val d = Dedup.dd14SoftDedup(spark, sf)
    assert(d.count() == docs.count()) // every document keeps a row
    // group weight mass ≈ 1 (4-decimal rounding only), group sizes honest
    val byFp = Dedup.dd01Exact(spark, sf).select("doc_id", "fp")
      .join(d, "doc_id")
    val bad = byFp.groupBy("fp").agg(
      count(lit(1)).as("n"), max("n_dups").as("nd"), min("n_dups").as("nd2"),
      sum("weight").as("mass"))
      .where(col("n") =!= col("nd") || col("n") =!= col("nd2") ||
        abs(col("mass") - 1.0) > 0.01)
    assert(bad.isEmpty)
  }

  test("q36 transitions: pair count = events - users, probabilities normalize") {
    val e = graft.sources.Tables.t(spark, sf, "events")
    val out = graft.operators.Relational.q36Transitions(spark, sf)
    val totalPairs = out.agg(sum("n")).collect()(0).getLong(0)
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    assert(totalPairs == nEvents - nUsers) // each user emits (count-1) pairs
    // per-prev_type probability mass ≈ 1 (4-decimal rounding only)
    val mass = out.groupBy("prev_type").agg(sum("p").as("mass"))
      .where(abs(col("mass") - 1.0) > 0.01)
    assert(mass.isEmpty)
  }

  test("q37 session paths: path lengths conserve events, sessions match q21") {
    val out = graft.operators.Relational.q37SessionPaths(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    // top-20 ordering is (n DESC, path ASC) — deterministic
    val ns = out.map(_.getLong(1))
    assert(ns.sameElements(ns.sorted.reverse))
    // the FULL path multiset (recomputed unlimited) must conserve events
    // and agree with q21's session count and per-session sizes exactly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val e = graft.sources.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("CAST(ts DIV 1000 AS BIGINT)").as("tsu"))
    val prev = lag(col("tsu"), 1).over(w)
    val paths = e.withColumn("brk",
        when(prev.isNull || col("tsu") - prev > 1800000000L, 1).otherwise(0))
      .withColumn("session_no", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(sort_array(collect_list(struct(col("tsu"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(col("user_id"), size(col("evs")).as("n_events"))
      .groupBy("user_id", "n_events").count()
    val q21 = graft.operators.Relational.q21Sessionize(spark, sf)
      .select("user_id", "n_events")
      .groupBy("user_id", "n_events").count()
    assert(paths.except(q21).isEmpty && q21.except(paths).isEmpty)
  }

  test("sp12 stride interleave: every prefix holds declared proportions ±2") {
    val out = Sampling.sp12InterleaveMix(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2)))
    assert(out.nonEmpty)
    // materialized order is (v, source, rk) — a total order
    assert(out.sameElements(out.sortBy(t => (t._2, t._1, t._3))))
    val weights = Map("src0" -> 400, "src1" -> 300, "src2" -> 200,
      "src3" -> 100)
    val supply = out.groupBy(_._1).view.mapValues(_.length).toMap
    // the proportionality guarantee holds while EVERY source still has
    // supply — once one exhausts, its share flows to the survivors
    // (stride scheduling can't emit documents that don't exist). Test up
    // to that horizon only.
    val live = weights.map { case (s, wm) =>
      (supply.getOrElse(s, 0) - 2) * 1000 / wm
    }.min
    assert(live >= 10, s"fixture too small for a meaningful prefix: $live")
    for (cut <- Seq(10, live / 2, live).distinct.filter(_ >= 2)) {
      val prefix = out.take(cut).groupBy(_._1).view.mapValues(_.length)
      for ((s, wm) <- weights) {
        val expected = cut * wm / 1000.0
        val got = prefix.getOrElse(s, 0)
        assert(math.abs(got - expected) <= 2.0,
          s"prefix $cut: source $s has $got docs, expected ~$expected")
      }
    }
  }

  test("dd16 admission rejects batch docs near a ledger doc, admits novel ones") {
    import spark.implicits._
    // planted: batch doc 1 differs from ledger doc 2 by ONE trailing token
    // (shingle Jaccard 58/60 ≈ 0.97 — band collision essentially certain,
    // and deterministic given the md5 hash family); batch doc 3 shares no
    // tokens with anything
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = ((1 to 59).map(i => s"w$i") :+ "x1").mkString(" ")
    val novel = (1 to 60).map(i => s"z$i").mkString(" ")
    val ledger = Seq((2L, base)).toDF("doc_id", "text")
    val batch = Seq((1L, near), (3L, novel)).toDF("doc_id", "text")
    val out = Dedup.nearDupAdmitOf(batch, ledger, 0.3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((1L, false), (3L, true)))
    assert(out(0).getLong(1) >= 1) // the near doc generated candidates
    assert(out(1).getLong(1) == 0) // the novel doc joined nothing
    // fixture-level sanity: every batch doc appears exactly once, and a
    // rejected doc always has at least one candidate (hits ⊆ candidates)
    val full = Dedup.dd16NearDupAdmit(spark, sf).collect()
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    assert(full.length == docs.where(col("doc_id") % 2 === 1).count())
    assert(full.filter(!_.getBoolean(2)).forall(_.getLong(1) >= 1))
  }

  test("dd16 persistent ledger: identical result, ledger never reshuffles") {
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val ledger = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    // self-clean BEFORE writing: a killed prior run leaves the warehouse
    // directory with no catalog entry, and the next saveAsTable dies with
    // LOCATION_ALREADY_EXISTS (cross-run shared-state flake; the finally
    // below can't help if the JVM died mid-test)
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(); ()
    }
    Seq("ndl_test_bands", "ndl_test_sets").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmRf(new java.io.File(s"spark-warehouse/$t"))
    }
    Dedup.writeNearDupLedger(ledger, "ndl_test", buckets = 8)
    try {
      val viaLedger =
        Dedup.nearDupAdmitAgainstLedger(spark, batch, "ndl_test", 0.3)
      val recompute = Dedup.nearDupAdmitOf(batch, ledger, 0.3)
      assert(viaLedger.exceptAll(recompute).isEmpty &&
        recompute.exceptAll(viaLedger).isEmpty)
      // the scale claim, held as a plan invariant: the candidate join
      // reads the ledger band table PRE-BUCKETED — the only band-keyed
      // exchange is the batch side shuffling into the ledger's bucketing.
      // Broadcast + AQE pinned off so the layout, not the small fixture,
      // carries the property.
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
      val oldBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = Dedup
          .nearDupAdmitAgainstLedger(spark, batch, "ndl_test", 0.3)
          .queryExecution.executedPlan
        val bandExchanges = plan.collect {
          case e: ShuffleExchangeExec if (e.outputPartitioning match {
            case h: HashPartitioning =>
              h.expressions.exists(_.references.exists(_.name == "band"))
            case _ => false
          }) => e
        }
        // the ledger IS read (not folded away), every band-keyed exchange
        // feeds from the BATCH side, and none sits above a ledger scan —
        // the bucketed layout carries the join, the ledger never moves
        // (cand's subtree is deliberately unpinned, so the batch-side
        // exchange may appear once per consumer; count is not the claim)
        assert(plan.toString.contains("ndl_test_bands"))
        assert(bandExchanges.nonEmpty)
        assert(!bandExchanges.exists(
          _.child.toString.contains("ndl_test_bands")),
          s"ledger band table reshuffled:\n$plan")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ndl_test_bands")
      spark.sql("DROP TABLE IF EXISTS ndl_test_sets")
    }
  }

  test("c09 scrub cuts exactly the benchmark passages, keeps the rest") {
    import spark.implicits._
    // corpus doc 1 = one benchmark passage + one unique passage; doc 3 =
    // all-unique. The benchmark passage must vanish, everything else stay.
    val bench = (1 to 20).map(i => s"b$i").mkString(" ")
    val own = (1 to 20).map(i => s"u$i").mkString(" ")
    val other = (1 to 20).map(i => s"v$i").mkString(" ")
    val corpus = Seq((1L, bench + " " + own), (3L, other))
      .toDF("doc_id", "text")
    val benchmark = Seq((97L, bench)).toDF("doc_id", "text")
    val out = graft.operators.Curation
      .passageDecontaminateOf(corpus, benchmark, 20)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L), (3L, 1L, 1L)))
    assert(out(0).getString(3) == own)   // benchmark passage cut
    assert(out(1).getString(3) == other) // untouched doc rebuilt verbatim
    // a fully-contaminated doc survives as a row with NULL clean text
    val all = Seq((5L, bench)).toDF("doc_id", "text")
    val scrubbed = graft.operators.Curation
      .passageDecontaminateOf(all, benchmark, 20).collect()(0)
    assert(scrubbed.getLong(2) == 0L && scrubbed.isNullAt(3))
  }

  test("t22 readability: pinned example and structural bounds") {
    import spark.implicits._
    // "go. go. go." → 3 words, 3 sentence runs, 3 single-vowel-group
    // syllables → FK = 0.39·1 + 11.8·1 − 15.59 = −3.4 exactly
    val df = Seq((1L, "go. go. go.")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.readabilityOf(df).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3L, 3L)))
    assert(r.getDouble(4) == -3.4)
    // fixture-wide: every doc scores, counts are positive, sentences
    // default to 1 when no terminator exists
    val full = graft.operators.TextAnalysis.t22Readability(spark, sf)
    assert(full.count() ==
      graft.sources.Tables.t(spark, sf, "documents").count())
    assert(full.where(col("n_sentences") < 1 || col("n_syllables") < 1 ||
      col("n_words") < 1).isEmpty)
  }

  test("dd15 scrub keeps each distinct passage exactly once, canonically") {
    import spark.implicits._
    val out = Dedup.dd15PassageScrub(spark, sf)
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    assert(out.count() == docs.count())
    // conservation: total kept == distinct passages corpus-wide
    val kept = out.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctPassages = docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("ws"))
      .select(explode(expr(
        "transform(sequence(0, (size(ws) + 19) div 20 - 1)," +
          " c -> array_join(slice(ws, c * 20 + 1, 20), ' '))")).as("p"))
      .distinct().count()
    assert(kept == distinctPassages)
    // docs with zero duplicated passages (dd07) keep everything
    val clean = Dedup.dd07PassageDedup(spark, sf)
      .where(col("n_dup_passages") === 0).select("doc_id")
    val partial = out.join(clean, "doc_id")
      .where(col("n_kept") =!= col("n_passages"))
    assert(partial.isEmpty)
    // planted arbitration: the shared passage survives only in the lower
    // doc_id; the loser's rebuilt text keeps its unique tail
    val boiler = (1 to 20).map(i => s"tok$i").mkString(" ")
    val planted = Seq(
      (1L, boiler + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, boiler + " " + (1 to 20).map(i => s"b$i").mkString(" "))
    ).toDF("doc_id", "text")
    val scrubbed = Dedup.passageScrubOf(planted, 20).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(scrubbed(1L).startsWith(boiler) && scrubbed(1L).contains("a1"))
    assert(!scrubbed(2L).contains("tok1") && scrubbed(2L).contains("b1"))
  }

  test("q39 SCD2: intervals tile per key, one current row, runs collapse") {
    val out = graft.operators.Relational.q39Scd2(spark, sf).collect()
    val events = graft.sources.Tables.t(spark, sf, "events")
    // conservation: every event lands in exactly one interval
    assert(out.map(_.getLong(4)).sum == events.count())
    val byUser = out.groupBy(_.getLong(0))
    assert(byUser.size == events.select("user_id").distinct().count())
    for ((_, rows) <- byUser) {
      val sorted = rows.sortBy(_.getLong(2))
      // exactly one open (current) interval per key — the last one
      assert(rows.count(_.getBoolean(5)) == 1 && sorted.last.getBoolean(5))
      // intervals TILE: each run's valid_to is the next run's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3) && a.getLong(3) == b.getLong(2))
          // true SCD2: consecutive runs never carry the same state
          assert(a.getString(1) != b.getString(1))
        case _ => ()
      }
    }
  }

  test("q38 gap fill: complete spine, event conservation, real zeros") {
    val out = graft.operators.Relational.q38GapFill(spark, sf).collect()
    assert(out.nonEmpty)
    val hours = out.map(_.getLong(0)).distinct.sorted
    // the spine is every hour in [min, max] — no holes, by construction
    assert(hours.last - hours.head + 1 == hours.length)
    val types = out.map(_.getString(1)).distinct
    assert(out.length == hours.length * types.length)
    // conservation: zero-filling adds rows, never counts
    val total = out.map(_.getLong(2)).sum
    val nEvents = graft.sources.Tables.t(spark, sf, "events").count()
    assert(total == nEvents)
    assert(out.forall(_.getLong(2) >= 0))
  }

  test("t16 NFC normalization: composed ≡ decomposed, idempotent, codegen'd") {
    import spark.implicits._
    // repartition forces real execution (a Project over a LocalRelation
    // would constant-fold at optimization time and never exercise codegen;
    // SparkSpec pins codegen.fallback=false so a janino failure surfaces)
    val df = Seq(
      ("caf\u00e9", "cafe\u0301"),  // composed é vs e + combining acute
      ("A  B\tC", "a b c"),                        // case + whitespace
      ("  x  ", "x")                               // trim
    ).toDF("a", "b").repartition(2)
    val n = df.select(TextAnalysis.normalized(col("a")).as("na"),
      TextAnalysis.normalized(col("b")).as("nb"))
    assert(n.where(col("na") =!= col("nb")).isEmpty)
    assert(n.where(
      TextAnalysis.normalized(col("na")) =!= col("na")).isEmpty)
  }

  test("c11 dataset card: conservation laws across sources") {
    val card = graft.operators.Curation.c11DatasetCard(spark, sf).collect()
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    // every document is accounted to exactly one source row
    assert(card.map(_.getLong(1)).sum == docs.count())
    // per-mille shares sum to 1000 minus at most one floor-loss per source
    val shares = card.map(_.getLong(7)).sum
    assert(shares <= 1000 && shares > 1000 - card.length)
    // bounds: english subset within docs, quality within the score range
    assert(card.forall(r => r.getLong(6) <= r.getLong(1)))
    assert(card.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // dup accounting: corpus-wide dup docs equal dd01's non-keep count
    // plus one representative per duplicated group (every member of a
    // duplicated fingerprint group counts as a dup doc on the card)
    val dd = Dedup.dd01Exact(spark, sf)
    val dupGroups = dd.groupBy("fp").count().where(col("count") > 1)
    val wantDupDocs = dupGroups.agg(coalesce(sum("count"), lit(0L)))
      .collect()(0).getLong(0)
    assert(card.map(_.getLong(4)).sum == wantDupDocs)
  }

  test("ss15 filtered ANN: predicate enforced, recall floor vs exact filtered top-k") {
    val out = Similarity.ss15FilteredAnn(spark, sf).collect()
    assert(out.length == 10)
    // every hit satisfies the metadata predicate — the filtered-search contract
    assert(out.forall(_.getLong(0) % 3 == 0))
    // deterministic
    val again = Similarity.ss15FilteredAnn(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // recall floor vs the exact filtered brute force (driver-side on the
    // small fixture; same integer quantization as the operators)
    val raw = graft.sources.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(f => math.round(f.toDouble * 1000)).toArray)
      .toMap
    val q = raw(0L)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d.toDouble / math.sqrt(na.toDouble * nb.toDouble)
    }
    val exact = raw.toSeq
      .filter { case (id, _) => id != 0L && id % 3 == 0 }
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val got = out.map(_.getLong(0)).toSet
    assert((exact & got).size >= 7,
      s"filtered-ANN recall below floor: ${(exact & got).size}/10")
  }

  test("dd17 containment: embedded document scores exactly 1.0") {
    import spark.implicits._
    val inner = (1 to 40).map(i => s"q$i").mkString(" ")
    val tail = (1 to 40).map(i => s"z$i").mkString(" ")
    val other = (1 to 40).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, inner),                  // the standalone quote
      (2L, inner + " " + tail),     // the article that embeds it
      (3L, other)                   // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairsOf(docs, k = 3, w = 4,
      minShared = 2, minContainment = 0.8).collect()
    // winnowing guarantee: every window interior to the shared run picks
    // the same minimum, so the embedded doc's sketch is a subset — 1.0
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getDouble(5) == 1.0, s"containment: ${r.getDouble(5)}")
    // and the symmetric view underrates it: shared/total-of-larger ≈ 1/2
    assert(r.getLong(2) < r.getLong(3))
    // fixture-wide: the declared query's threshold keeps the output a
    // candidate set, not a cross product
    val full = Dedup.dd17Containment(spark, sf)
    assert(full.where(col("containment") > 1.0).isEmpty)
    assert(full.where(col("ida") >= col("idb")).isEmpty)
  }

  test("c10 split leakage: cluster-keyed split audits clean, naive leaks") {
    val pairs = Dedup.dd05SimhashPairs(spark, sf).select("ida", "idb")
    // c08 hashes on the CLUSTER: structurally zero boundary-crossing pairs
    val safe = graft.operators.Curation.splitLeakageOf(pairs,
      graft.operators.Curation.c08ClusterSafeSplit(spark, sf)
        .select(col("doc_id"), col("split")))
    assert(safe.where(col("split_a") =!= col("split_b")).isEmpty)
    // the declared audit of the naive per-document split finds the leak
    val naive = graft.operators.Curation.c10SplitLeakage(spark, sf).collect()
    val crossers = naive.filter(r => r.getString(0) != r.getString(1))
      .map(_.getLong(2)).sum
    assert(crossers > 0, "naive split should leak near-dup pairs")
    // conservation: every pair is audited exactly once
    assert(naive.map(_.getLong(2)).sum == pairs.count())
  }

  test("sp13 priority sample: size, threshold law, small-input exactness") {
    import spark.implicits._
    val out = Sampling.sp13PrioritySample(spark, sf).collect()
    assert(out.length == 50)
    // determinism: the sample is a corpus property, not a run property
    val again = Sampling.sp13PrioritySample(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // DLT threshold law: est_w == max(w, tau) for ONE tau shared by all
    // sampled rows — so every est_w is either the row's own weight or
    // the common threshold, and the threshold rows all agree on it
    val taus = out.map(r => (r.getLong(2).toDouble, r.getDouble(3)))
      .filter { case (w, e) => e > w }.map(_._2).distinct
    assert(taus.length == 1)
    assert(out.forall { case r =>
      val (w, e) = (r.getLong(2).toDouble, r.getDouble(3))
      e == w || e == taus.head
    })
    // the estimator targets the corpus total: deterministic here, so this
    // pins the realized accuracy, not a probabilistic bound
    val estTotal = out.map(_.getDouble(3)).sum
    val trueTotal = graft.sources.Tables.t(spark, sf, "documents")
      .agg(sum(greatest(col("n_chars"), lit(1L)))).collect()(0).getLong(0)
    assert(estTotal > 0.5 * trueTotal && estTotal < 2.0 * trueTotal)
    // k >= N: the sample IS the input and est_w == w exactly (tau = 0)
    val tiny = Seq((1L, "s", 10L), (2L, "s", 20L), (3L, "s", 30L))
      .toDF("doc_id", "source", "w")
    val all = Sampling.prioritySampleOf(tiny, k = 10)
      .orderBy("doc_id").collect()
    assert(all.length == 3)
    assert(all.forall(r => r.getDouble(3) == r.getLong(2).toDouble))
  }

  test("t23 hashed features: bucket counts partition the token stream") {
    import spark.implicits._
    val out = TextAnalysis.t23HashedFeatures(spark, sf)
    val fSum = (0 until 16).map(i => col(s"f$i")).reduce(_ + _)
    // every token lands in exactly one bucket: the f-columns sum to
    // n_tokens row-by-row, and nothing is negative
    assert(out.where(fSum =!= col("n_tokens")).isEmpty)
    assert(out.where((0 until 16).map(i => col(s"f$i") < 0).reduce(_ || _))
      .isEmpty)
    assert(out.count() ==
      graft.sources.Tables.t(spark, sf, "documents").count())
    // the bucket of a token is a TOKEN property: the same word in two
    // documents hits the same feature column (the no-coordination
    // contract that lets two corpora featurize independently)
    val two = Seq((1L, "alpha"), (2L, "alpha beta")).toDF("doc_id", "text")
    val f = TextAnalysis.hashedFeaturesOf(two, width = 16)
      .orderBy("doc_id").collect()
    val b1 = (0 until 16).filter(i => f(0).getLong(2 + i) > 0)
    assert(b1.length == 1)
    assert(f(1).getLong(2 + b1.head) >= 1)
  }

  test("ss17 recall audit: planted duplicates audit at 100, shard-invariant") {
    import spark.implicits._
    import graft.functions.ArrayDot.dotLong
    val rnd = new scala.util.Random(7)
    def vec(): Seq[Long] = Seq.fill(64)(rnd.nextInt(2001) - 1000L)
    val queries = (0 until 3).map(i => (i.toLong, vec()))
    // 12 exact copies of each query (cos = 1.0 — same bucket in every
    // hyperplane table by construction), plus 50 unrelated vectors
    val copies = for {
      (qid, v) <- queries; j <- 0 until 12
    } yield (100L + qid * 100 + j, v)
    val noise = (0 until 50).map(i => (1000L + i, vec()))
    val qv = (queries ++ copies ++ noise).toDF("vec_id", "q")
      .withColumn("n2", dotLong(col("q"), col("q")))
    val out = Similarity.recallAuditOf(qv, panel = 3, k = 10, shards = 8)
      .orderBy("qid").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(2) == 10L, s"hits for qid ${r.getLong(0)}")
      assert(r.getLong(3) == 100L)
    }
    // the two-level top-k is an implementation detail: shard count must
    // not change the audit (global top-k ⊆ union of per-shard top-ks)
    val s1 = Similarity.recallAuditOf(qv, panel = 3, k = 10, shards = 1)
      .orderBy("qid").collect().toSeq
    val s7 = Similarity.recallAuditOf(qv, panel = 3, k = 10, shards = 7)
      .orderBy("qid").collect().toSeq
    assert(s1 == s7)
  }

  test("t28 collocations: a bound pair outranks a frequent independent pair") {
    import spark.implicits._
    // "san francisco" always adjacent; "the" everywhere (so "the cat" /
    // "the dog" are frequent but predictable from the parts)
    val docs = (0 until 40).map { i =>
      (i.toLong, s"the cat saw san francisco and the dog ran to the end $i")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.collocationsOf(docs, minCount = 5L, k = 50)
      .collect()
    val pmi = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(pmi(("san", "francisco")) > pmi(("the", "cat")),
      s"bound pair must outrank chance pair: $pmi")
    // PMI of a pair that ALWAYS co-occurs with unique parts is maximal
    assert(out.head.getString(0) == "san" || pmi(("san", "francisco")) ==
      out.map(_.getLong(3)).max)
  }

  test("dd18 self-scrub: first occurrence survives, repeats cut, clean docs intact") {
    import spark.implicits._
    // doc 1: chunk A, chunk B, chunk A again (passageTokens=3) — the
    // second A must be cut and order preserved; doc 2: no repetition
    val a = "nav home about"; val b = "real body text"
    val docs = Seq(
      (1L, s"$a $b $a"),
      (2L, s"$b $a")).toDF("doc_id", "text")
    val out = Dedup.selfScrubOf(docs, passageTokens = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 2L)
    assert(out(0).getString(3) == s"$a $b")
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 2L)
    assert(out(1).getString(3) == s"$b $a")
  }

  test("c13 embedding drift: identical snapshots stable; flipped corpus all moved") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Seq[Long] = Seq.fill(64)(rnd.nextInt(2001) - 1000L)
    val vs = (0 until 40).map(i => (i.toLong, vec()))
    val a = vs.toDF("vec_id", "q")
    val same = Curation.embeddingDriftOf(a, a).collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getString(5) == "stable", r.toString)
      assert(r.getDouble(3) == 1.0 && r.getLong(4) == 0L)
    }
    // negating every vector flips all 8 hyperplane signs: cell c → c^255.
    // Every A-cell empties and its complement fills — nothing may read
    // 'stable', and new/gone counts match by the c↔c^255 bijection
    val b = vs.map { case (id, v) => (id, v.map(-_)) }.toDF("vec_id", "q")
    val diff = Curation.embeddingDriftOf(a, b).collect()
    assert(!diff.exists(_.getString(5) == "stable"))
    assert(diff.count(_.getString(5) == "new") ==
      diff.count(_.getString(5) == "gone"))
  }

  test("c13 profiles survive a parquet round-trip: stored-profile drift == raw drift") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec(): Seq[Long] = Seq.fill(64)(rnd.nextInt(2001) - 1000L)
    val a = (0 until 30).map(i => (i.toLong, vec())).toDF("vec_id", "q")
    val b = (100 until 125).map(i => (i.toLong, vec())).toDF("vec_id", "q")
    val dir = java.nio.file.Files
      .createTempDirectory("c13_profiles").toString
    Curation.embeddingProfileOf(a).write.parquet(s"$dir/a")
    Curation.embeddingProfileOf(b).write.parquet(s"$dir/b")
    val fromStored = Curation.embeddingDriftFromProfiles(
      spark.read.parquet(s"$dir/a"), spark.read.parquet(s"$dir/b"))
      .collect().toSeq
    val fromRaw = Curation.embeddingDriftOf(a, b).collect().toSeq
    assert(fromStored == fromRaw,
      "the persisted profile must be the monitor's exact input")
  }

  test("t27 linear probe: integer GD trajectory matches a local replay") {
    import spark.implicits._
    // tiny corpus with a clean label split: stopword-heavy docs (y=1)
    // vs stopword-free docs (y=0)
    val docs = Seq(
      (1L, "the of and the is it the a"),
      (2L, "the a of to and in is it"),
      (3L, "quartz lattice phonon drift"),
      (4L, "baryon flux entropy shear"),
      (5L, "the quick brown fox"),
      (6L, "gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val width = 8
    val out = TextAnalysis.linearProbeOf(docs, width = width, iters = 3)
      .orderBy("dim").collect()
    assert(out.length == width)
    assert(out.map(_.getLong(0)).toSeq == (0L until width.toLong))
    // local replay of the exact integer arithmetic
    def bucket(w: String): Int =
      (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex("feat:" + w)
          .take(15), 16) % width).toInt
    val stop = Set("the", "a", "of", "to", "and", "in", "is", "it")
    val rows = docs.collect().map { r =>
      val ws = r.getString(1).toLowerCase.trim.split("\\s+").toSeq
      val y = if (10 * ws.count(stop) >= ws.size) 1L else 0L
      (y, ws.map(bucket).distinct)
    }
    val div = 8L * rows.length
    var w = Array.fill(width)(0L)
    val expect = (1 to 3).map { _ =>
      val g = Array.fill(width)(0L)
      rows.foreach { case (y, dims) =>
        val r = dims.map(w(_)).sum - 1000000L * y
        dims.foreach(d => g(d) += r)
      }
      w = Array.tabulate(width)(d => w(d) - g(d) / div)
      w.clone()
    }
    (0 until width).foreach { d =>
      assert((1 to 3).map(i => out(d).getLong(i)) == expect.map(_(d)),
        s"dim $d trajectory")
    }
    // the probe learned SIGN structure: stopword-bucket weights grew
    // positive (they predict y=1), and weights move across iterations
    assert(expect.last.exists(_ > 0))
    assert(expect.head.toSeq != expect.last.toSeq)
  }

  test("t29 sequence packing: two-level offsets equal the single-window truth") {
    val out = graft.operators.TextAnalysis.t29SequencePack(spark, sf)
      .collect()
    // brute-force reference: one global cumsum over the collected docs
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
      .sortBy(_._1)
    var off = 0L
    val expect = docs.map { case (id, n) =>
      val row = (id, n, off, off / 128, (off + n - 1) / 128)
      off += n
      row
    }
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, (id, n, o, fs, ls)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) == ((id, n, o, fs, ls, ls - fs + 1)),
        s"doc $id: $r vs ($id, $n, $o, $fs, $ls)")
    }
    // conservation: the stream's end equals the total token count
    assert(expect.last._3 + expect.last._2 == docs.map(_._2).sum)
  }

  test("sp15 temperature mix: rates monotone in size, biggest language keeps all") {
    val out = graft.operators.Sampling.sp15TemperatureMix(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // the fixture's languages are SKEWED (en dominates), so the rule has
    // something to do: at least one language must be genuinely damped
    val mx = out.maxBy(_._2)
    assert(mx._3 == 1000000L && mx._4 == mx._2, s"anchor language: $mx")
    assert(out.exists(_._3 < 1000000L), "no language damped — fixture flat?")
    // rates are monotone in group size and kept counts within bounds
    out.sortBy(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3, s"rate order: $a vs $b")
      case _ => ()
    }
    out.foreach { case (s, n, ppm, kept) =>
      assert(kept <= n && ppm >= 1L && ppm <= 1000000L, s"$s: $n/$ppm/$kept")
      // α = 1/2 exactness: ppm is floor(1e6·√n/√nmax) recomputed here
      val want = math.floor(1000000.0 * math.sqrt(n.toDouble) /
        math.sqrt(mx._2.toDouble)).toLong
      assert(ppm == want, s"$s ppm $ppm != $want")
    }
  }

  test("ss19 RRF: integer score recomputes from the leg ranks; legs agree") {
    val fused = Similarity.ss19RrfFusion(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(fused.nonEmpty && fused.length <= 20)
    // the emitted score IS the declared integer formula of the emitted
    // ranks — no hidden float leg can drift
    fused.foreach { case (id, lr, dr, s) =>
      val want = (if (lr > 0) 1000000L / (60L + lr) else 0L) +
        (if (dr > 0) 1000000L / (60L + dr) else 0L)
      assert(s == want && (lr > 0 || dr > 0), s"doc $id: $lr/$dr/$s")
    }
    // emission order: score desc, doc_id tie-break
    fused.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1), s"$a !>= $b")
      case _ => ()
    }
    // leg ranks recompute from the legs themselves (rank = position in the
    // leg's proven ordering)
    val lexIds = TextAnalysis.bm25TopK(spark, sf,
      Seq("hash", "join", "vector"), 50).collect().map(_.getLong(0))
    val denIds = Similarity.ss01CosineTopK(spark, sf).collect()
      .map(_.getLong(0)) // top-10 prefix of the dense leg
    fused.foreach { case (id, lr, dr, _) =>
      if (lr > 0) assert(lexIds(lr.toInt - 1) == id, s"lex rank $lr of $id")
      if (dr > 0 && dr <= 10)
        assert(denIds(dr.toInt - 1) == id, s"dense rank $dr of $id")
    }
  }

  test("ss20 MMR: from-candidates, relevance-first, monotone, diversified") {
    val sel = Similarity.ss20MmrDiversify(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(sel.length == 10 && sel.map(_._1).toSeq == (1 to 10))
    assert(sel.map(_._2).distinct.length == 10, "duplicate selection")
    // every pick comes from the exact top-30 candidate pool, and rank 1 is
    // the pure-relevance argmax (empty selected set = no penalty)
    val cand = Similarity.exactCosineTopK(spark, sf, 30).collect()
      .map(_.getLong(0))
    assert(sel.forall(s => cand.contains(s._2)))
    assert(sel.head._2 == cand.head, "rank 1 must be the relevance top-1")
    // the greedy invariant: pick scores never increase (the candidate set
    // shrinks and the max-sim penalty only grows); rounded-4 slack
    sel.sliding(2).foreach {
      case Array(a, b) => assert(b._4 <= a._4 + 1e-4, s"$a then $b")
      case _ => ()
    }
    // it actually diversifies on this fixture: the selection is NOT the
    // top-10 by relevance (if embeddings cluster at all, MMR must swap
    // someone out; guards the penalty term against silently becoming 0)
    assert(sel.map(_._2).toSet != cand.take(10).toSet,
      "MMR degenerated to pure relevance — penalty term inert?")
  }
}
