package graft

import org.apache.spark.sql.functions._
import graft.examples.CurationExample

/** Smoke test for the README "use as a library" example: the composed
  * pipeline must run end to end on the smallest fixture and actually
  * exercise each stage's contract (scrub columns present, quality gate
  * applied, write path produces partitioned output). */
class ExamplesSpec extends SparkSpec {

  test("PretrainPipelineExample: every lineage stage reconciles and chains over a raw JSONL drop") {
    import spark.implicits._
    import graft.examples.PretrainPipelineExample
    // the raw drop: the fixture documents as uncompressed JSONL, PLUS a
    // planted exact duplicate, a planted near-duplicate, and two corrupt
    // lines — each stage must have something to reject
    val root = tmpDir("pretrain-pipeline")
    val drop = s"$root/drop"
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "source", "text")
    val donor = docs.where(length(trim(col("text"))) > 50)
      .orderBy("doc_id").limit(1).head()
    val ws = donor.getString(3).trim.split("\\s+")
    val near = (ws.take(ws.length / 2) ++ Array("zzznear") ++
      ws.drop(ws.length / 2 + 1)).mkString(" ")
    val planted = Seq(
      (900001L, donor.getString(1), donor.getString(2), donor.getString(3)),
      (900002L, donor.getString(1), donor.getString(2), near),
      (900003L, "en", "planted", "   ")) // blank → clean-stage reject
      .toDF("doc_id", "lang", "source", "text")
    graft.sources.TextCorpus.writeJsonl(docs.unionByName(planted), drop,
      compression = "none")
    // two corrupt lines in their own shard
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$drop/zz-corrupt.json"),
      "{broken json\nnot json at all\n".getBytes)

    // the whole composed run must honor the pin rule (PinDisciplineSpec's
    // standing audit: no heavy subplan re-executed across its actions)
    val r = PinAudit.auditedOrThrow(spark) {
      PretrainPipelineExample.run(spark, drop, s"$root/out")
    }
    val byStage = r.lineage.map(s => s.stage -> s).toMap
    // the ledger covers every stage, in order
    assert(r.lineage.map(_.stage) == Seq("ingest", "clean", "exact-dedup",
      "neardup-dedup", "quality", "decontaminate", "temperature-mix",
      "pack"))
    // every stage reconciles: in = kept + rejected (run() requires it;
    // re-assert from the emitted ledger so the ARTIFACT is what's pinned)
    for (s <- r.lineage)
      assert(s.in == s.kept + s.rejected, s"$s does not reconcile")
    // and the stages CHAIN: each stage consumes exactly the survivors
    for ((a, b) <- r.lineage.zip(r.lineage.tail))
      assert(b.in == a.kept, s"${b.stage} in=${b.in} != ${a.stage} kept=${a.kept}")
    // each planted reject was caught by its intended stage
    assert(byStage("ingest").rejected == 2L, "corrupt lines quarantined")
    assert(byStage("clean").rejected >= 1L, "blank doc rejected")
    assert(byStage("exact-dedup").rejected >= 1L, "planted exact dup caught")
    assert(byStage("neardup-dedup").rejected >= 1L, "planted near-dup caught")
    assert(byStage("quality").rejected >= 1L)
    assert(byStage("decontaminate").rejected >= 1L,
      "benchmark docs must leave the corpus")
    assert(byStage("temperature-mix").rejected >= 1L,
      "fixture languages are skewed — the mix must damp some group")
    assert(byStage("pack").kept == byStage("pack").in)
    // published artifacts: corpus, placement, card, lineage
    val corpus = spark.read.parquet(s"$root/out/corpus")
    assert(corpus.count() == byStage("pack").kept)
    assert(corpus.select("doc_id").distinct().count() == corpus.count())
    val placement = spark.read.parquet(s"$root/out/placement")
    assert(placement.count() == corpus.count())
    assert(r.nSequences > 0)
    val card = spark.read.parquet(s"$root/out/card")
    assert(card.columns.contains("share_permille"))
    // the card's totals reconcile with the corpus it describes
    assert(card.agg(sum("n_docs")).head().getLong(0) == corpus.count())
    val lineage = spark.read.parquet(s"$root/out/lineage")
    assert(lineage.count() == r.lineage.size)
  }

  test("VideoDedupExample: re-render and re-post drop, original and unrelated survive") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def img(lum: (Int, Int) => Int): BufferedImage = {
      val im = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) {
        val v = lum(x, y); im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      im
    }
    def gif(frames: Seq[BufferedImage]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(
        new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    // dense deterministic textures (base + off): every low-frequency DCT
    // coefficient is far from zero, so the sign-vs-median hash is stable
    // under a small brightness shift (a flat two-gray pattern would leave
    // ~50 of the 60 signs as rounding noise); the mean is base-mean + off,
    // so within-shot drift is exactly the off drift and cuts are planted
    def barsX(off: Int) =
      img((x, y) => (x * 37 + y * 23 + x * y * 11) % 180 + off)
    def barsY(off: Int) =
      img((x, y) => (x * 53 + y * 31 + x * x * 7) % 180 + 40 + off)
    def checker(off: Int) =
      img((x, y) => (x * 19 + y * 41 + y * y * 13) % 180 + 10 + off)
    def diag(off: Int) =
      img((x, y) => (x * 29 + y * 17 + (x + y) * (x + y) * 3) % 180 + off)
    // v0 original: barsX shot (means 60/62/64) + barsY shot (120/122);
    // v1 re-render: every pixel +3 — every scene signature moves (m08
    //    blind) but no DCT sign does (keyframe hashes identical);
    // v2 re-post: v0's barsY shot byte-identical, then its own checker
    //    shot — caught by exact shared-scene containment;
    // v3 unrelated: one diag shot, matches nothing
    val videos = Seq(
      (0L, gif(Seq(barsX(0), barsX(2), barsX(4), barsY(0), barsY(2)))),
      (1L, gif(Seq(barsX(3), barsX(5), barsX(7), barsY(3), barsY(5)))),
      (2L, gif(Seq(barsY(0), barsY(2), checker(0), checker(2), checker(4)))),
      (3L, gif(Seq(diag(0), diag(2), diag(4))))).toDF("doc_id", "payload")
    import graft.examples.VideoDedupExample
    val near = VideoDedupExample.nearDupVideoPairs(videos, theta = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(near.contains((0L, 1L)) && near.contains((1L, 2L)),
      s"re-render must pair by keyframe hash: $near")
    assert(!near.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated video must pair with nothing: $near")
    val exact = graft.operators.ImageCodec
      .duplicateScenes(videos, theta = 16L)
      .where(col("containment_ppm") >= 500000L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(exact.toSet == Set((0L, 2L)),
      s"only the verbatim shot splice is an exact dup: ${exact.toSet}")
    // dedupVideos composes two detectors over ONE demux — the audit
    // proves the codec pass is genuinely paid once (the r13 ADVICE item)
    val kept = PinAudit.auditedOrThrow(spark) {
      VideoDedupExample.dedupVideos(videos, theta = 16L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(kept == Set(0L, 3L), s"survivors: $kept")
    // the transitive-chain case pairwise dropping gets WRONG: 1–9 share
    // a barsY re-render, 9–5 share a checker re-render, 1–5 share
    // nothing — all three are one duplicate group, and dropping each
    // pair's larger id would keep BOTH 1 and 5; the component rule
    // keeps exactly the smallest
    def diag40(off: Int) =
      img((x, y) => (x * 29 + y * 17 + (x + y) * (x + y) * 3) % 180 + 40 + off)
    val chain = Seq(
      (1L, gif(Seq(barsX(0), barsX(2), barsX(4), barsY(0), barsY(2)))),
      (9L, gif(Seq(barsY(3), barsY(5), checker(3), checker(5), checker(7)))),
      (5L, gif(Seq(checker(0), checker(2), checker(4), diag40(0), diag40(2)))))
      .toDF("doc_id", "payload")
    val chainKept = PinAudit.auditedOrThrow(spark) {
      VideoDedupExample.dedupVideos(chain, theta = 16L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(chainKept == Set(1L), s"chain survivors: $chainKept")
  }

  test("ffmpeg-CLI demuxer seam: real demuxer when present, stub otherwise — one plan either way") {
    import spark.implicits._
    import graft.operators.{FfmpegDemux, Multimodal}
    // a deterministic two-shot y4m clip composed in-JVM (no encoder
    // needed): frames 0-2 sit at luma ~40, frames 3-4 jump to ~200 —
    // a planted scene cut at frame 3
    def plane(v: Int) =
      Array.fill(FfmpegDemux.W * FfmpegDemux.H)(v.toByte)
    val clip = FfmpegDemux.y4mOf(
      Seq(plane(40), plane(42), plane(44), plane(200), plane(202)))
    val videos = Seq((7L, clip)).toDF("doc_id", "payload")
    type SigDemux = (Long, Array[Byte]) => Iterator[Multimodal.FrameSig]
    val stub: SigDemux = Multimodal.frameSigStub(100) _
    val real: SigDemux =
      if (FfmpegDemux.available) FfmpegDemux.frameSigs _ else stub
    // the swap is a pure function injection: the PHYSICAL plan shape must
    // be identical whichever demuxer rides the seam — a cluster without
    // ffmpeg runs the same graph on the stub
    def shape(d: SigDemux): Seq[String] =
      Multimodal.frameSigsWith(videos, d)
        .queryExecution.executedPlan
        .collect { case p => p.getClass.getSimpleName }
    assert(shape(real) == shape(stub),
      s"demuxer changed the plan: ${shape(real)} vs ${shape(stub)}")
    if (FfmpegDemux.available) {
      // the REAL CLI decode: 5 frames back, in order, raster-sized, and
      // the scene assignment finds exactly the planted cut
      val sigs = Multimodal.frameSigsWith(videos, FfmpegDemux.frameSigs _)
      val rows = sigs.orderBy("frame_no").collect()
      assert(rows.length == 5, s"expected 5 frames: ${rows.toSeq}")
      assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
      assert(rows.forall(_.getInt(2) == FfmpegDemux.W * FfmpegDemux.H))
      val scenes = Multimodal.sceneFramesOf(sigs, theta = 16L)
        .orderBy("frame_no").select("frame_no", "scene").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toSeq
      assert(scenes == Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 1, 4 -> 1),
        s"planted cut at frame 3 not found: $scenes")
      // and an undecodable payload is a sentinel row, never an exception
      val bad = Seq((9L, Array.fill(64)(0x55.toByte))).toDF(
        "doc_id", "payload")
      val s9 = Multimodal.frameSigsWith(bad, FfmpegDemux.frameSigs _).head()
      assert(s9.getInt(1) == -1 && s9.getLong(3) == -1L, s9.toString)
    } else {
      // no ffmpeg in this environment: the identical graph still runs
      // end to end on the stub — the recipe stays executable everywhere
      assert(Multimodal.frameSigsWith(videos, stub).count() > 0)
    }

    // The pure-JDK y4m demuxer runs UNCONDITIONALLY — the real
    // container-format path (header parse, per-frame plane walk,
    // corrupt-payload sentinel) executes even in sandboxes without
    // ffmpeg. Same seam, same plan, same FrameSig contract.
    import graft.operators.Y4mDemux
    assert(shape(Y4mDemux.frameSigs _) == shape(stub),
      "y4m demuxer changed the plan")
    val ysigs = Multimodal.frameSigsWith(videos, Y4mDemux.frameSigs _)
      .orderBy("frame_no").collect()
    assert(ysigs.length == 5, s"expected 5 frames: ${ysigs.toSeq}")
    assert(ysigs.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(ysigs.forall(_.getInt(2) == FfmpegDemux.W * FfmpegDemux.H))
    // exact luma sums: the clip was composed from constant planes
    val wantSums = Seq(40L, 42L, 44L, 200L, 202L)
      .map(_ * FfmpegDemux.W * FfmpegDemux.H)
    assert(ysigs.map(_.getLong(3)).toSeq == wantSums,
      s"luma sums: ${ysigs.map(_.getLong(3)).toSeq}")
    // the scene operators consume y4m sigs identically: planted cut found
    val ysc = Multimodal.sceneFramesOf(
        Multimodal.frameSigsWith(videos, Y4mDemux.frameSigs _), theta = 16L)
      .orderBy("frame_no").select("frame_no", "scene").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toSeq
    assert(ysc == Seq(0 -> 0, 1 -> 0, 2 -> 0, 3 -> 1, 4 -> 1), ysc.toString)
    // corrupt payload → sentinel row, never an exception
    val ybad = Seq((9L, Array.fill(64)(0x55.toByte))).toDF(
      "doc_id", "payload")
    val y9 = Multimodal.frameSigsWith(ybad, Y4mDemux.frameSigs _).head()
    assert(y9.getInt(1) == -1 && y9.getLong(3) == -1L, y9.toString)
    // truncated mid-frame: header is valid y4m but the last plane is cut
    val truncated = clip.dropRight(10)
    val ytr = Seq((11L, truncated)).toDF("doc_id", "payload")
    val y11 = Multimodal.frameSigsWith(ytr, Y4mDemux.frameSigs _).head()
    assert(y11.getInt(1) == -1 && y11.getLong(3) == -1L, y11.toString)
    // crafted header whose C444 frame stride wraps int (ADVICE r15):
    // W*H fits int but luma+chroma = 3*W*H does not — the Long-side
    // truncation guard must yield the sentinel, not an incidental AIOOBE
    val wrapped = ("YUV4MPEG2 W32768 H32768 C444\nFRAME\n" + "x" * 32)
      .getBytes("US-ASCII")
    val ywr = Seq((12L, wrapped)).toDF("doc_id", "payload")
    val y12 = Multimodal.frameSigsWith(ywr, Y4mDemux.frameSigs _).head()
    assert(y12.getInt(1) == -1 && y12.getLong(3) == -1L, y12.toString)
    if (FfmpegDemux.available) {
      // both REAL demuxers agree frame-for-frame on the same clip
      val fsigs = Multimodal.frameSigsWith(videos, FfmpegDemux.frameSigs _)
        .orderBy("frame_no").collect()
      assert(fsigs.map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
        == ysigs.map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq,
        "ffmpeg and y4m demuxers disagree on the same clip")
    }
  }

  test("CurationExample.curated runs and honors its gates") {
    val out = CurationExample.curated(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "source", "text", "quality", "n_pii_hits"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the quality gate actually filtered (fixture has sub-0.3 documents)
    assert(out.where(col("quality") < 0.3).isEmpty)
    // survivors are unique documents
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // the held-out benchmark set itself never ships in the training mix
    assert(out.where(col("doc_id") % 97 === 0).isEmpty)
  }

  test("RagIndexExample: build versioned IVF+PQ passage index, retrieve exactly") {
    import graft.examples.RagIndexExample
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "text")
    val root = tmpDir("ragidx")
    val n = PinAudit.auditedOrThrow(spark) {
      RagIndexExample.buildRagIndex(spark, docs, root)
    }
    assert(n > 0)
    // versioned layout + PQ artifacts landed
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1/_pq_codebooks")))
    // retrieving with a chunk's OWN text at the EXHAUSTIVE setting
    // (all cells probed, corpus-sized rerank — exact by the IVFPQ
    // identity proof) must return that chunk at cosine 1.0: the query
    // embeds through the identical column, so vectors are bit-equal
    val probe = RagIndexExample.passages(docs)
      .where(col("n_tokens") >= 5).orderBy("chunk_id").limit(1)
      .select("chunk_id", "chunk_text").head()
    val exact = RagIndexExample.retrieve(spark, root, probe.getString(1),
      k = 3, nprobe = 10, rerank = n.toInt).collect()
    assert(exact.length == 3)
    assert(exact.head.getLong(0) == probe.getLong(0),
      s"top hit ${exact.head} is not the probed chunk ${probe.getLong(0)}")
    assert(exact.head.getDouble(1) == 1.0)
    // the pruned operating point returns k passages (recall, not
    // exactness, is its contract — asserted on the operator's own spec)
    assert(RagIndexExample.retrieve(spark, root, probe.getString(1),
      k = 3).count() == 3)
    // HYBRID retrieval at the exhaustive dense setting: the probed chunk
    // is dense rank 1 (bit-equal embedding — the exact assertion above),
    // so it must appear in the fused list carrying dense_rank == 1; its
    // LEXICAL rank is a corpus property, not a theorem (word-salad text:
    // BM25's length normalization can rank a shorter chunk above the one
    // containing the query) — assert only the fusion algebra on it
    val fused = RagIndexExample.hybridRetrieve(spark, docs, root,
      probe.getString(1), k = 20, nprobe = 10, rerank = n.toInt).collect()
    assert(fused.length == 20)
    assert(fused.map(_.getLong(0)).distinct.length == 20)
    // the emitted score IS the integer formula of the emitted ranks
    fused.foreach { r =>
      val want = (if (r.getLong(1) > 0) 1000000L / (60L + r.getLong(1))
        else 0L) +
        (if (r.getLong(2) > 0) 1000000L / (60L + r.getLong(2)) else 0L)
      assert(r.getLong(3) == want, s"fused row $r breaks the RRF formula")
    }
    val probedRow = fused.find(_.getLong(0) == probe.getLong(0))
    assert(probedRow.isDefined, "probed chunk absent from the fused list")
    assert(probedRow.get.getLong(2) == 1L,
      s"probed chunk ${probedRow.get} is not dense rank 1")
    // DIVERSIFIED retrieval: k distinct passages from the pool, the
    // query's own chunk first (it is the relevance argmax at cosine 1)
    val div = RagIndexExample.diversifiedRetrieve(spark, docs,
      probe.getString(1), k = 5).collect()
    assert(div.length == 5)
    assert(div.map(_.getLong(1)).distinct.length == 5)
    assert(div.head.getLong(1) == probe.getLong(0),
      s"MMR rank 1 ${div.head} is not the probed chunk")
    // the reserved query id is never selected
    assert(!div.map(_.getLong(1)).contains(-1L))
  }

  test("CurationExample write path emits lang-partitioned parquet") {
    val dir = tmpDir("curated-out")
    graft.sources.Sink.writeCurated(
      CurationExample.curated(spark, sf), dir,
      partitionCols = Seq("lang"), sortCols = Seq("quality"))
    val back = spark.read.parquet(dir)
    assert(back.count() ==
      CurationExample.curated(spark, sf).count())
    // directory partitioning by lang exists on disk
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty)
  }

  test("SketchStateExample: nightly states through parquet merge to the one-shot report") {
    import graft.examples.SketchStateExample
    val events = graft.sources.Tables.t(spark, sf, "events")
    // two "nights" split by event_id parity — both touch every cell, so
    // the merge genuinely combines partial states of the same cell
    val n1 = SketchStateExample.nightly(
      events.where(col("event_id") % 2 === 0))
    val n2 = SketchStateExample.nightly(
      events.where(col("event_id") % 2 === 1))
    val dir = tmpDir("sketch_state")
    n1.write.parquet(s"$dir/n1"); n2.write.parquet(s"$dir/n2")
    val incremental = SketchStateExample.report(
      SketchStateExample.mergeStates(
        spark.read.parquet(s"$dir/n1")
          .unionByName(spark.read.parquet(s"$dir/n2")))).collect().toSeq
    val oneShot = SketchStateExample.report(
      SketchStateExample.mergeStates(SketchStateExample.nightly(events)))
      .collect().toSeq
    assert(incremental == oneShot,
      "incremental state maintenance must equal the full recompute")
    // CMS state: per-night frames summed cell-wise == the one-pass sketch
    val cmsInc = SketchStateExample
      .nightlyCms(events.where(col("event_id") % 2 === 0))
      .unionByName(SketchStateExample.nightlyCms(
        events.where(col("event_id") % 2 === 1)))
      .groupBy("r", "cell").agg(sum("cnt").cast("long").as("cnt"))
      .orderBy("r", "cell").collect().toSeq
    val cmsFull = SketchStateExample.nightlyCms(events)
      .orderBy("r", "cell").collect().toSeq
    assert(cmsInc == cmsFull)
  }

  test("CorpusReportExample: identical snapshots read clean; disjoint text is novel") {
    import graft.examples.CorpusReportExample
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val emb = graft.sources.Tables.t(spark, sf, "embeddings")
    // same snapshot on both sides: drift must be zero, novelty must be
    // zero (every fingerprint of B was seen in A)
    // one nightlyReport call's three outputs are ONE composed graph —
    // consuming all three must not re-run any shared heavy subplan
    val (sameRows, n0) = PinAudit.auditedOrThrow(spark) {
      val same = CorpusReportExample.nightlyReport(docs, docs, emb, emb)
      ((same.scalarDrift.collect(), same.embeddingDrift.collect()),
        same.novelty.collect()(0))
    }
    sameRows._1.foreach(r =>
      assert(r.getAs[String]("verdict") == "stable", r.toString))
    sameRows._2.foreach(r =>
      assert(r.getAs[String]("verdict") == "stable", r.toString))
    assert(n0.getAs[Long]("new_permille") == 0L)
    assert(n0.getAs[Long]("jaccard_permille") == 1000L)
    // disjoint halves: the novelty section must see mostly-new content
    val a = docs.where(expr("(doc_id div 20) % 2") === 0)
    val b = docs.where(expr("(doc_id div 20) % 2") === 1)
    val ea = emb.where(expr("(vec_id div 20) % 2") === 0)
    val eb = emb.where(expr("(vec_id div 20) % 2") === 1)
    val split = CorpusReportExample.nightlyReport(a, b, ea, eb)
    val n1 = split.novelty.collect()(0)
    // block-parity halves share almost no exact text; the estimator is
    // ±13% at k=64, so "mostly new" is the honest deterministic bound
    assert(n1.getAs[Long]("new_permille") >= 700L,
      s"expected mostly-novel, got ${n1.getAs[Long]("new_permille")}")
  }
}
