package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import java.util.concurrent.atomic.AtomicInteger

/** Counters for the decodeInContext lifecycle proof. Static fields work
  * because tests run local-mode: executors share the driver JVM. */
object CodecProbe {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0) }
}

/** The pluggable-codec seam (VERDICT r5 §next-round #3): a user-injected
  * decoder must flow through the SAME typed-mapPartitions plan as the
  * default stub — no forked operator, no plan degradation. */
class MultimodalSpec extends SparkSpec {

  private def planOps(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect { case n => n.nodeName }

  test("decodeWith: injected codec rides the stub's exact plan shape") {
    val docs = Multimodal.binaryDocs(spark, sf)
    val stubPlan = planOps(Multimodal.decodeWith(docs, Multimodal.decodeStub))
    val custom = Multimodal.decodeWith(docs,
      (id, p) => Multimodal.MediaMeta(id, p.length * 2, 7, 7, 1))
    assert(planOps(custom) == stubPlan,
      "injected codec must not change the physical plan shape")
    // the typed round-trip is present and there is no shuffle before decode
    assert(planOps(custom).exists(_.contains("MapPartitions")))
    assert(!planOps(custom).exists(_.contains("Exchange")))
    // and the injected function's OUTPUT actually flows through
    val row = custom.orderBy("doc_id").limit(1).collect()(0)
    val nBytes = docs.orderBy("doc_id").limit(1).collect()(0)
      .getAs[Array[Byte]]("payload").length
    assert(row.getAs[Int]("n_bytes") == nBytes * 2)
    assert(row.getAs[Int]("checksum") == 7)
  }

  test("decodeInContext: one context per partition, closed after the last row") {
    val docs = Multimodal.binaryDocs(spark, sf)
    val nParts = docs.rdd.getNumPartitions
    CodecProbe.reset()
    val out = Multimodal.decodeInContext[AtomicInteger](
      docs,
      open = () => { CodecProbe.opens.incrementAndGet(); new AtomicInteger(0) },
      decode = (ctx, id, p) => {
        ctx.incrementAndGet() // a real codec context is used per row
        Multimodal.decodeStub(id, p)
      },
      close = _ => CodecProbe.closes.incrementAndGet())
    val n = out.count()
    assert(n == docs.count())
    // JNI shape: context acquired once per partition batch, not per row —
    // and every acquired context is released
    assert(CodecProbe.opens.get() == nParts,
      s"expected $nParts opens, got ${CodecProbe.opens.get()}")
    assert(CodecProbe.closes.get() == CodecProbe.opens.get())
    // and equals the stub path row-for-row
    val viaSeam = Multimodal.decodeInContext[Unit](docs, () => (),
      (_, id, p) => Multimodal.decodeStub(id, p), _ => ())
    assert(viaSeam.exceptAll(Multimodal.m01Decode(spark, sf)).isEmpty)
  }

  test("resizeWith / framesWith: injected functions flow through") {
    val docs = Multimodal.binaryDocs(spark, sf)
    // a custom resizer: "resize" everything to 1 byte
    val tiny = Multimodal.resizeWith(docs,
      (id, p) => Multimodal.Resized(id, p.length, 1,
        if (p.nonEmpty) p(0) & 0xff else 0))
    assert(tiny.where(col("resized_bytes") =!= 1).isEmpty)
    // a custom demuxer: exactly two frames per document regardless of size
    val two = Multimodal.framesWith(docs,
      (id, p) => Iterator(
        Multimodal.Frame(id, 0, p.length / 2, 0),
        Multimodal.Frame(id, 1, p.length - p.length / 2, 0)))
    assert(two.count() == docs.count() * 2)
    assert(two.groupBy("doc_id").count().where(col("count") =!= 2).isEmpty)
    // stub-through-seam ≡ declared queries (same plan, same rows)
    assert(Multimodal.resizeWith(docs, Multimodal.resizeStub(3))
      .exceptAll(Multimodal.m03Resize(spark, sf)).isEmpty)
    assert(Multimodal.framesWith(docs, Multimodal.framesStub(100))
      .exceptAll(Multimodal.m02Frames(spark, sf)).isEmpty)
  }

  test("m06 scene cuts: planted level shift cuts exactly there; uniform payload is one scene") {
    import spark.implicits._
    // A: 300 bytes of level 50 then 300 of level 200 — a hard shot
    // boundary at frame 3 (stride 100) and nowhere else; B: 450 uniform
    // bytes — one scene; C: 40 bytes (shorter than one stride) — a
    // single-frame scene, no lag row at all.
    val a = Array.fill(300)(50.toByte) ++ Array.fill(300)(200.toByte)
    val b = Array.fill(450)(80.toByte)
    val c = Array.fill(40)(120.toByte)
    val docs = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "payload")
    val scenes = Multimodal.sceneCutsOf(
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)), theta = 3L)
      .orderBy("doc_id", "scene")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(scenes.toSeq == Seq(
      (0L, 0, 0, 3L, 300L), (0L, 1, 3, 3L, 300L), // cut at the shift only
      (1L, 0, 0, 5L, 450L), // uniform: every delta is 0 ≤ θ
      (2L, 0, 0, 1L, 40L))) // sub-stride: one frame, one scene
    // tail-frame exactness: 250 bytes = frames of 100/100/50; a mean jump
    // in the SHORT tail frame must still compare exactly (cross-multiplied
    // sums, not truncated means)
    val t = Array.fill(200)(100.toByte) ++ Array.fill(50)(110.toByte)
    val tail = Multimodal.sceneCutsOf(
      Multimodal.frameSigsWith(Seq((7L, t)).toDF("doc_id", "payload"),
        Multimodal.frameSigStub(100)), theta = 3L)
    assert(tail.count() == 2, "tail-frame jump of 10 levels must cut")
    // θ is inclusive-exclusive: the same payload at θ=10 (jump == θ) stays
    // one scene — the rule is strictly-greater
    assert(Multimodal.sceneCutsOf(
      Multimodal.frameSigsWith(Seq((7L, t)).toDF("doc_id", "payload"),
        Multimodal.frameSigStub(100)), theta = 10L).count() == 1)
    // injected demuxer rides the same tail: stub-through-seam ≡ declared
    val viaSeam = Multimodal.sceneCutsOf(Multimodal.frameSigsWith(
      Multimodal.binaryDocs(spark, sf), Multimodal.frameSigStub(100)), 3L)
    assert(viaSeam.exceptAll(
      Multimodal.m06SceneCuts(spark, sf)).isEmpty)
  }

  test("m07 keyframes: medoid frame per scene, exact ties to the earlier frame") {
    import spark.implicits._
    // shot 1: levels 50/52/54 (drift 2 ≤ θ=3 — one scene, mean exactly
    // 52 → frame 1 is the medoid with deviation 0); shot 2: 200/202
    // (mean 201 — both frames deviate equally, tie elects frame 3)
    val p = Array.fill(100)(50.toByte) ++ Array.fill(100)(52.toByte) ++
      Array.fill(100)(54.toByte) ++ Array.fill(100)(200.toByte) ++
      Array.fill(100)(202.toByte)
    val docs = Seq((0L, p), (2L, Array.fill(40)(120.toByte)))
      .toDF("doc_id", "payload")
    val kf = Multimodal.sceneKeyframesOf(
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)),
      theta = 3L).orderBy("doc_id", "scene").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("scene"),
        r.getAs[Long]("n_frames"), r.getAs[Int]("keyframe"),
        r.getAs[Long]("scene_bytes"), r.getAs[Long]("key_dev")))
    assert(kf.toSeq == Seq(
      (0L, 0, 3L, 1, 300L, 0L),     // |5200·300 − 15600·100| = 0
      (0L, 1, 2L, 3, 200L, 20000L), // tie at 20000 → earlier frame
      (2L, 0, 1L, 0, 40L, 0L)),     // sub-stride: its only frame
      s"got: ${kf.toSeq}")
    // the two declared m06/m07 surfaces agree scene-for-scene: same
    // (doc_id, scene) keys, same n_frames, same scene_bytes
    val cuts = Multimodal.m06SceneCuts(spark, sf)
      .select("doc_id", "scene", "n_frames", "scene_bytes")
    val keys = Multimodal.m07SceneKeyframes(spark, sf)
      .select("doc_id", "scene", "n_frames", "scene_bytes")
    assert(cuts.exceptAll(keys).isEmpty && keys.exceptAll(cuts).isEmpty,
      "m07 scenes must be exactly m06's scenes")
  }

  test("m08 duplicate scenes: a shared shot pairs the two videos, exact containment") {
    import spark.implicits._
    // doc 0 = shot A (3×100 bytes of 50) + shot B (2×100 of 200);
    // doc 1 = shot B clone first, then its own shot (3×100 of 120);
    // doc 2 shares nothing. Only shot B's signature (nf=2, cb=200,
    // ssum=40000) collides → one pair, containment 1/min(2,2) = 500000 ppm
    val shotA = Array.fill(300)(50.toByte)
    val shotB = Array.fill(200)(200.toByte)
    val shotC = Array.fill(300)(120.toByte)
    val docs = Seq((0L, shotA ++ shotB), (1L, shotB ++ shotC),
      (2L, Array.fill(100)(7.toByte))).toDF("doc_id", "payload")
    val dup = Multimodal.duplicateScenesOf(
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)),
      theta = 3L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared_scenes"), r.getAs[Long]("a_scenes"),
        r.getAs[Long]("b_scenes"), r.getAs[Long]("containment_ppm")))
    assert(dup.toSeq == Seq((0L, 1L, 1L, 2L, 2L, 500000L)),
      s"got: ${dup.toSeq}")
    // a video repeating a shot counts its signature ONCE: doc 3 = shot B,
    // a divider frame, shot B again — three scene instances but TWO
    // distinct signatures, so b_scenes reads 2 and the repeated B still
    // contributes exactly one shared scene against doc 1
    val divider = Array.fill(100)(90.toByte)
    val more = Seq((1L, shotB ++ shotC), (3L, shotB ++ divider ++ shotB))
      .toDF("doc_id", "payload")
    val dup2 = Multimodal.duplicateScenesOf(
      Multimodal.frameSigsWith(more, Multimodal.frameSigStub(100)),
      theta = 3L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared_scenes"), r.getAs[Long]("a_scenes"),
        r.getAs[Long]("b_scenes"), r.getAs[Long]("containment_ppm")))
    assert(dup2.toSeq == Seq((1L, 3L, 1L, 2L, 2L, 500000L)),
      s"got: ${dup2.toSeq}")
  }

  test("m09 video clusters: a re-post chain collapses transitively, singletons label themselves") {
    import spark.implicits._
    // chain 0–1–4 through shared shots B then C (0 and 4 share NOTHING
    // directly — only the transitive closure groups them); 2 is alone
    val shotA = Array.fill(300)(50.toByte)
    val shotB = Array.fill(200)(200.toByte)
    val shotC = Array.fill(300)(120.toByte)
    val shotD = Array.fill(200)(30.toByte)
    val docs = Seq((0L, shotA ++ shotB), (1L, shotB ++ shotC),
      (4L, shotC ++ shotD), (2L, Array.fill(100)(7.toByte)))
      .toDF("doc_id", "payload")
    val got = Multimodal.videoClustersOf(docs,
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)),
      theta = 3L, minPpm = 500000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 2L), (4L, 0L)),
      s"got: ${got.toSeq}")
    // a stricter threshold (full containment) breaks the chain: nothing
    // shares ALL of the smaller video's scenes, so everyone is a singleton
    val strict = Multimodal.videoClustersOf(docs,
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)),
      theta = 3L, minPpm = 1000000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 2L), (4L, 4L)),
      s"got: ${strict.toSeq}")
  }

  test("m10 silence segments: maximal loud runs, silent gaps and tails drop, leading silence keeps ids 0-based") {
    import spark.implicits._
    // doc 0: loud / silent / loud / loud / silent sub-stride tail — two
    // segments, the second spanning the adjacent loud pair; doc 2: all
    // silent (zero rows); doc 4: LEADING silence — segment ids still
    // start at 0
    val p0 = Array.fill(100)(200.toByte) ++ Array.fill(100)(3.toByte) ++
      Array.fill(100)(200.toByte) ++ Array.fill(100)(210.toByte) ++
      Array.fill(40)(2.toByte)
    val p4 = Array.fill(100)(3.toByte) ++ Array.fill(100)(200.toByte)
    val docs = Seq((0L, p0), (2L, Array.fill(100)(1.toByte)), (4L, p4))
      .toDF("doc_id", "payload")
    val segs = Multimodal.silenceSegmentsOf(
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)),
      theta = 50L).orderBy("doc_id", "segment").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("segment"),
        r.getAs[Int]("first_frame"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("seg_bytes"), r.getAs[Long]("seg_sum")))
    assert(segs.toSeq == Seq(
      (0L, 0, 0, 1L, 100L, 20000L),
      (0L, 1, 2, 2L, 200L, 41000L),
      (4L, 0, 1, 1L, 100L, 20000L)),
      s"got: ${segs.toSeq}")
  }

  test("m11 duplicate segments: a shared jingle pairs the two recordings across stub and real PCM") {
    import spark.implicits._
    // stub: recordings 0 and 1 both contain the two-window jingle
    // (200/210 levels, signature nf=2 cb=200 ssum=41000) at DIFFERENT
    // positions, separated from their own material by silence; 2 is alone
    val jingle = Array.fill(100)(200.toByte) ++ Array.fill(100)(210.toByte)
    val gap = Array.fill(100)(3.toByte)
    val docs = Seq(
      (0L, jingle ++ gap ++ Array.fill(100)(150.toByte)),
      (1L, Array.fill(100)(180.toByte) ++ gap ++ jingle),
      (2L, Array.fill(100)(90.toByte))).toDF("doc_id", "payload")
    val dup = Multimodal.duplicateSegmentsOf(
      Multimodal.frameSigsWith(docs, Multimodal.frameSigStub(100)),
      theta = 50L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared_segments"), r.getAs[Long]("a_segments"),
        r.getAs[Long]("b_segments"), r.getAs[Long]("containment_ppm")))
    assert(dup.toSeq == Seq((0L, 1L, 1L, 2L, 2L, 500000L)),
      s"got: ${dup.toSeq}")
    // real PCM: the same jingle samples re-broadcast inside a different
    // recording pair through the actual WAV decoder
    import graft.operators.AudioCodec
    val loudJ = Seq[Short](1000, -1000, 900, -900, 800, -800, 700, -700)
    val quiet = Seq[Short](10, -10, 10, -10)
    val wavs = Seq(
      (1L, wav(loudJ ++ quiet ++ Seq[Short](600, -600, 600, -600))),
      (2L, wav(Seq[Short](500, -500, 500, -500) ++ quiet ++ loudJ)))
      .toDF("doc_id", "payload")
    val rdup = AudioCodec.duplicateSegments(wavs, windowSamples = 4,
      theta = 500L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared_segments"), r.getAs[Long]("containment_ppm")))
    assert(rdup.toSeq == Seq((1L, 2L, 1L, 500000L)), s"got: ${rdup.toSeq}")
  }

  test("real-codec silence segments: a planted quiet span splits the PCM stream exactly") {
    import spark.implicits._
    // 12 samples in 4-sample windows: alternating ±1000 (Σ|s| = 4000),
    // near-silence (Σ|s| = 40), loud again — θ = 500 (mean |amplitude|)
    // keeps windows 0 and 2, drops the middle
    import graft.operators.AudioCodec
    val loud = Seq[Short](1000, -1000, 1000, -1000)
    val quiet = Seq[Short](10, -10, 10, 10)
    val docs = Seq((1L, wav(loud ++ quiet ++ loud)),
      (9L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val segs = AudioCodec.silenceSegments(docs, windowSamples = 4,
      theta = 500L).orderBy("doc_id", "segment").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("segment"),
        r.getAs[Int]("first_frame"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("seg_bytes"), r.getAs[Long]("seg_sum")))
    // the corrupt payload's sentinel reads as silence: zero segments,
    // no exception
    assert(segs.toSeq == Seq((1L, 0, 0, 1L, 4L, 4000L),
      (1L, 1, 2, 1L, 4L, 4000L)), s"got: ${segs.toSeq}")
  }

  test("in-row scene signatures are value-identical to the relational rollup") {
    import spark.implicits._
    // every edge the cut rule has: multi-shot, sub-stride single frame,
    // and a MID-STREAM sentinel (c = 0), whose zero count must fire the
    // cut on both of its edges in the fold exactly as in the windows
    val p = Array.fill(300)(50.toByte) ++ Array.fill(200)(200.toByte)
    val docs = Seq((0L, p), (2L, Array.fill(40)(120.toByte)),
      (4L, Array.empty[Byte])).toDF("doc_id", "payload")
    def parity(demux: (Long, Array[Byte]) =>
        Iterator[Multimodal.FrameSig]): Unit = {
      val inRow = Multimodal.sceneSignaturesWith(docs, demux, theta = 3L)
      val relational = Multimodal.sceneSignaturesOf(
        Multimodal.frameSigsWith(docs, demux), theta = 3L)
      assert(inRow.exceptAll(relational).isEmpty &&
        relational.exceptAll(inRow).isEmpty,
        s"in-row ${inRow.collect().toSeq.sortBy(r => (r.getLong(0),
          r.getInt(1)))} != relational ${relational.collect().toSeq
          .sortBy(r => (r.getLong(0), r.getInt(1)))}")
    }
    parity(Multimodal.frameSigStub(100))
    // sentinel edition: frame 1 fails mid-stream (0 bytes) — it must
    // become an isolated one-frame scene on BOTH paths
    val sentinelDemux: (Long, Array[Byte]) =>
        Iterator[Multimodal.FrameSig] = (id, _) =>
      Iterator(Multimodal.FrameSig(id, 0, 100, 5000L),
        Multimodal.FrameSig(id, 1, 0, -1L),
        Multimodal.FrameSig(id, 2, 100, 5000L),
        Multimodal.FrameSig(id, 3, 100, 5200L))
    parity(sentinelDemux)
    val sc = Multimodal.sceneSignaturesWith(docs.where(col("doc_id") === 0),
      sentinelDemux, theta = 3L).orderBy("scene").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sc.toSeq == Seq((0, 1L, 100L, 5000L), (1, 1L, 0L, -1L),
      (2, 2L, 200L, 10200L)), s"got: ${sc.toSeq}")
  }

  test("framesInContext lifecycle under a misbehaving codec: crash and abandonment close the handle, corrupt rows quarantine") {
    // the r10 directive #6: the ffmpeg-seam contract ("handle released
    // even when a row throws") gets a crash-injecting fake instead of a
    // happy-path-only proof
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"payload-$i".getBytes))
      .toDF("doc_id", "payload").repartition(3)
    def settle(deadline: Long = System.nanoTime() + 10000000000L): Unit = {
      while (CodecProbe.closes.get() != CodecProbe.opens.get() &&
        System.nanoTime() < deadline) Thread.sleep(50)
    }

    // 1. MID-PARTITION DECODE CRASH: the handle opened by the crashing
    // task (and by every other task attempt) must still be released
    CodecProbe.reset()
    val crash = Multimodal.framesInContext[AtomicInteger](docs,
      open = () => { CodecProbe.opens.incrementAndGet(); new AtomicInteger },
      demux = (_, id, p) => {
        if (id == 17L)
          throw new RuntimeException("decode blew up mid-partition")
        Iterator(Multimodal.Frame(id, 0, p.length, 0))
      },
      close = _ => CodecProbe.closes.incrementAndGet())
    intercept[org.apache.spark.SparkException](crash.collect())
    settle()
    assert(CodecProbe.opens.get() >= 1, "crash test never opened a handle")
    assert(CodecProbe.closes.get() == CodecProbe.opens.get(),
      s"crash leaked codec handles: opens=${CodecProbe.opens.get()} " +
        s"closes=${CodecProbe.closes.get()}")

    // 2. CONSUMER ABANDONS: limit(1) stops pulling before the iterator
    // exhausts — the task-completion listener must release the handle
    CodecProbe.reset()
    val one = Multimodal.framesInContext[Unit](docs,
      open = () => { CodecProbe.opens.incrementAndGet(); () },
      demux = (_, id, p) => Iterator(Multimodal.Frame(id, 0, p.length, 0)),
      close = _ => { CodecProbe.closes.incrementAndGet(); () })
      .limit(1).collect()
    assert(one.length == 1)
    settle()
    assert(CodecProbe.opens.get() >= 1)
    assert(CodecProbe.closes.get() == CodecProbe.opens.get(),
      s"abandoned consumer leaked codec handles: " +
        s"opens=${CodecProbe.opens.get()} closes=${CodecProbe.closes.get()}")

    // 3. CORRUPT ROWS QUARANTINE, NOT FATAL: the codec owns per-row
    // failure (the m05 sentinel pattern) — bad payloads become sentinel
    // frames, the job succeeds, good rows are untouched
    CodecProbe.reset()
    val out = Multimodal.framesInContext[Unit](docs,
      open = () => { CodecProbe.opens.incrementAndGet(); () },
      demux = (_, id, p) =>
        if (id % 10 == 3) Iterator(Multimodal.Frame(id, -1, -1, -1))
        else Iterator(Multimodal.Frame(id, 0, p.length, 0)),
      close = _ => { CodecProbe.closes.incrementAndGet(); () })
      .collect()
    assert(out.length == 30)
    assert(out.count(_.getAs[Int]("frame_no") == -1) == 3,
      "corrupt payloads must surface as sentinel rows")
    assert(out.count(_.getAs[Int]("frame_no") == 0) == 27)
    settle()
    assert(CodecProbe.closes.get() == CodecProbe.opens.get())
  }

  test("m04 phash: perturbed payload stays within radius, pairing finds it") {
    import spark.implicits._
    // A: a smooth gradient payload; B: A with a tiny local perturbation
    // (a re-encode artifact) — phash must stay within Hamming ≤ 4 so the
    // banded pairing (dd05's machinery, unchanged) recovers the pair;
    // C: the reversed gradient — far from both, must NOT pair
    val a = Array.tabulate(2048)(i => (i % 251).toByte)
    val b = a.clone(); for (i <- 100 to 104) b(i) = (b(i) + 1).toByte
    val c = a.reverse
    val docs = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "payload")
    val sigs = Multimodal.phashWith(docs, Multimodal.phashStub(60))
    val pairs = graft.operators.Dedup
      .hammingPairsOf(sigs, maxHamming = 4, sigCol = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"expected exactly the planted pair: $pairs")
    // signatures are 60-bit values, like every signature in the family
    assert(sigs.where(col("phash") < 0 ||
      col("phash") > (1L << 60) - 1).isEmpty)
    // stub-through-seam ≡ the declared query
    assert(Multimodal.phashWith(Multimodal.binaryDocs(spark, sf),
        Multimodal.phashStub(60))
      .exceptAll(Multimodal.m04Phash(spark, sf)).isEmpty)
  }

  // ---- real ImageIO codec defaults (round-7 verdict #2) -----------------

  import java.awt.image.BufferedImage
  import graft.operators.ImageCodec

  /** Deterministic test image: per-pixel RGB from a pure (x, y) function. */
  private def renderImg(w: Int, h: Int)(
      rgb: (Int, Int) => (Int, Int, Int)): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def gradient(w: Int, h: Int) = renderImg(w, h) { (x, y) =>
    (40 + (x * 160) / w, 40 + (y * 160) / h, 90)
  }

  test("ImageIO decode: real PNG/JPEG dimensions and luma; corrupt reported") {
    import spark.implicits._
    val png = encode(gradient(64, 48), "png")
    val jpg = encode(gradient(64, 48), "jpg")
    val corrupt = "definitely not an image".getBytes("UTF-8")
    val docs = Seq((0L, png), (1L, jpg), (2L, corrupt))
      .toDF("doc_id", "payload")
    val out = ImageCodec.decodeImages(docs).orderBy("doc_id").collect()
    for (i <- 0 to 1) {
      assert(out(i).getAs[Int]("width") == 64)
      assert(out(i).getAs[Int]("height") == 48)
      assert(out(i).getAs[Long]("n_pixels") == 64L * 48)
      // both encodings see the same picture: mean luma within jpeg tolerance
      assert(math.abs(out(i).getAs[Int]("mean_luma") -
        out(0).getAs[Int]("mean_luma")) <= 2)
    }
    // corrupt payload is reported, not thrown — the 100 TB posture
    assert(out(2).getAs[Int]("width") == -1)
    // same typed-mapPartitions plan family as every codec seam
    val plan = planOps(ImageCodec.decodeImages(docs))
    assert(plan.exists(_.contains("MapPartitions")))
    assert(!plan.exists(_.contains("Exchange")))
  }

  test("ImageIO resize: bilinear fit preserves aspect and content") {
    import spark.implicits._
    val orig = gradient(64, 48)
    val docs = Seq((0L, encode(orig, "png"))).toDF("doc_id", "payload")
    val r = Multimodal.resizeWith(docs, ImageCodec.imageResizer(16))
      .collect()(0)
    assert(r.getAs[Int]("resized_bytes") > 0)
    assert(r.getAs[Int]("resized_bytes") < r.getAs[Int]("n_bytes"),
      "16x12 thumbnail PNG must be smaller than the 64x48 original")
    // bilinear resampling preserves overall brightness: thumbnail mean luma
    // lands within a few counts of the full-size mean
    val full = ImageCodec.decodeImage(0L, encode(orig, "png")).mean_luma
    assert(math.abs(r.getAs[Int]("resized_checksum") - full) <= 4,
      s"thumbnail luma ${r.getAs[Int]("resized_checksum")} vs full $full")
    // decode the actual thumbnail dims via the pure function
    val thumb = ImageCodec.bilinearFit(orig, 16)
    assert(thumb.getWidth == 16 && thumb.getHeight == 12, "aspect preserved")
  }

  test("ImageIO phash: jpeg re-encode + brightness shift pair; distinct image does not") {
    import spark.implicits._
    // 0: base PNG; 1: the SAME picture through jpeg loss + a uniform
    // brightness shift (+6, non-clipping) — the classic near-dup; 2: a
    // checkerboard — structurally unrelated, must not pair with either.
    // The fixture is TEXTURED (hash-noise blocks over a gradient): a
    // perfectly smooth image has near-zero AC coefficients whose signs
    // flip on jpeg noise (measured: gradient-only pairs at Hamming 22,
    // textured at 4, distinct at 26-30, pure brightness shift at 0).
    def textured(off: Int) = renderImg(64, 64) { (x, y) =>
      val n = ((x / 4) * 73 + (y / 4) * 151) % 97
      val v = 40 + n + off
      (math.min(v + x, 255), math.min(v + y, 255), math.min(v, 255))
    }
    val base = textured(0)
    val shifted = textured(6)
    val checker = renderImg(64, 64) { (x, y) =>
      if (((x / 8) + (y / 8)) % 2 == 0) (230, 230, 230) else (25, 25, 25)
    }
    val docs = Seq(
      (0L, encode(base, "png")),
      (1L, encode(shifted, "jpg")),
      (2L, encode(checker, "png"))).toDF("doc_id", "payload")
    val sigs = Multimodal.phashWith(docs, ImageCodec.imagePhash)
    val pairs = graft.operators.Dedup
      .hammingPairsOf(sigs, maxHamming = 4, sigCol = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)),
      s"expected exactly the planted near-dup image pair, got: $pairs")
    // undecodable payload → the documented 0L sentinel
    val bad = Seq((9L, "nope".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Multimodal.phashWith(bad, ImageCodec.imagePhash)
      .collect()(0).getAs[Long]("phash") == 0L)
  }

  /** Animated GIF from frames via the in-JDK GIF writer's sequence API. */
  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("ImageIO frames: planted animated-GIF frames extracted with real lumas") {
    import spark.implicits._
    // three solid-gray frames: gray (v,v,v) has ITU-601 luma exactly v
    // ((77+150+29)v >> 8 = 256v >> 8), so each extracted frame's checksum
    // pins which planted frame it decoded — order and content both
    val lumas = Seq(40, 120, 200)
    val gif = animatedGif(lumas.map(v =>
      renderImg(16, 12)((_, _) => (v, v, v))))
    val docs = Seq((5L, gif), (9L, "not a gif".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = ImageCodec.extractFrames(docs)
      .orderBy("doc_id", "frame_no").collect()
    val frames5 = out.filter(_.getLong(0) == 5L)
    assert(frames5.length == 3, s"expected 3 frames: ${frames5.toSeq}")
    assert(frames5.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(frames5.forall(_.getInt(2) == 16 * 12))
    assert(frames5.map(_.getInt(3)).toSeq == lumas,
      s"frame lumas: ${frames5.map(_.getInt(3)).toSeq}")
    // undecodable → the single documented sentinel frame
    val bad = out.filter(_.getLong(0) == 9L)
    assert(bad.length == 1 && bad(0).getInt(1) == -1 && bad(0).getInt(3) == -1)
    // a single-frame PNG is one frame through the same demuxer
    val png = Seq((7L, encode(gradient(20, 10), "png")))
      .toDF("doc_id", "payload")
    assert(ImageCodec.extractFrames(png).count() == 1)
  }

  /** Animated GIF with PER-FRAME placement offsets via the writer's
    * image-metadata tree (ImageDescriptor imageLeft/TopPosition) — the
    * delta-optimized layout real GIF optimizers emit: later frames store
    * only the changed rectangle. */
  private def deltaGif(
      frames: Seq[(BufferedImage, (Int, Int))]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, (ox, oy)) =>
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
      val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[org.w3c.dom.Element]
      desc.setAttribute("imageLeftPosition", ox.toString)
      desc.setAttribute("imageTopPosition", oy.toString)
      meta.setFromTree(fmt, tree)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  private def meanLuma(img: BufferedImage): Int = {
    var sum = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      sum += (77 * ((p >> 16) & 255) + 150 * ((p >> 8) & 255) +
        29 * (p & 255)) >> 8
    }
    (sum / (img.getWidth.toLong * img.getHeight)).toInt
  }

  test("composed GIF frames: a delta frame recovers the full-canvas phash") {
    import spark.implicits._
    // base scene 32×24 (two solid grays — palette-exact through the GIF
    // writer, like the lumas-test); delta frame = 12×8 patch at (10, 8)
    val base = renderImg(32, 24)((x, _) =>
      if (x < 16) (60, 60, 60) else (180, 180, 180))
    val patch = renderImg(12, 8)((_, _) => (220, 220, 220))
    val gif = deltaGif(Seq((base, (0, 0)), (patch, (10, 8))))
    // what a viewer shows at frame 1: the base with the patch applied
    val expect = renderImg(32, 24) { (x, y) =>
      if (x >= 10 && x < 22 && y >= 8 && y < 16) (220, 220, 220)
      else if (x < 16) (60, 60, 60) else (180, 180, 180)
    }
    val docs = Seq((1L, gif)).toDF("doc_id", "payload")
    // as-stored decode reports the PATCH rectangle for frame 1…
    val stored = ImageCodec.extractFrames(docs).orderBy("frame_no").collect()
    assert(stored.length == 2 && stored(1).getInt(2) == 12 * 8,
      s"as-stored frame 1 should be the patch: ${stored.toSeq}")
    // …the composed decode reports the full viewer canvas
    val composed = ImageCodec.extractFramesComposed(docs)
      .orderBy("frame_no").collect()
    assert(composed.length == 2)
    assert(composed.forall(_.getInt(2) == 32 * 24),
      s"composed n_bytes must be the canvas: ${composed.toSeq}")
    assert(math.abs(composed(1).getInt(3) - meanLuma(expect)) <= 2,
      s"composed frame-1 luma ${composed(1).getInt(3)} vs ${meanLuma(expect)}")
    // and the composed canvas phashes as the full scene — the dedup
    // signal a patch-rectangle hash can never produce
    val canvases = ImageCodec.composedCanvases(gif).get
    val hComposed = ImageCodec.dctHashOf(canvases(1)._2.get)
    assert(hComposed == ImageCodec.dctHashOf(expect),
      "composed frame must hash as the viewer's full scene")
    assert(hComposed != ImageCodec.dctHashOf(patch),
      "composed frame must not hash as the bare patch")
  }

  test("real-codec scene cuts: composed GIF shots segment at the planted boundary") {
    import spark.implicits._
    // two shots of a 16×12 animation: three dark frames (lumas 40/42/44
    // — within-shot drift ≤ θ), then two bright frames (200/202). Solid
    // grays are palette-exact through the GIF writer, so the decoded
    // mean lumas are exactly the planted values and the only cut the
    // rule can fire is the 44→200 jump.
    val gif = animatedGif(Seq(40, 42, 44, 200, 202).map(v =>
      renderImg(16, 12)((_, _) => (v, v, v))))
    val docs = Seq((3L, gif)).toDF("doc_id", "payload")
    val scenes = ImageCodec.sceneCuts(docs, theta = 16L)
      .orderBy("scene").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(scenes.toSeq == Seq(
      (0, 0, 3L, 3L * 16 * 12), (1, 3, 2L, 2L * 16 * 12)),
      s"expected the two planted shots, got: ${scenes.toSeq}")
    // an undecodable payload is one sentinel scene, not an exception
    val bad = Seq((9L, "not a gif".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(ImageCodec.sceneCuts(bad, theta = 16L).count() == 1)
    // keyframe election on the same animation: shot 1's mean is exactly
    // the middle frame's luma (dev 0 → frame 1); shot 2's two frames
    // deviate equally (|38400·384 − 77184·192| = 73728 both) → tie
    // elects the earlier frame 3
    val kf = ImageCodec.sceneKeyframes(docs, theta = 16L)
      .orderBy("scene").collect()
      .map(r => (r.getAs[Int]("scene"), r.getAs[Long]("n_frames"),
        r.getAs[Int]("keyframe"), r.getAs[Long]("key_dev")))
    assert(kf.toSeq == Seq((0, 3L, 1, 0L), (1, 2L, 3, 73728L)),
      s"got: ${kf.toSeq}")
    // and a corrupt payload elects its sentinel frame, not an exception
    val bk = ImageCodec.sceneKeyframes(bad, theta = 16L).collect()
    assert(bk.length == 1 && bk(0).getAs[Int]("keyframe") == -1)
    // duplicate-scene detection across REAL media: a second animation
    // re-posts the bright shot (lumas 200/202 — palette-exact, so the
    // decoded signature matches verbatim) in front of its own dark shot
    // → exactly one shared scene between the two uploads
    val repost = animatedGif(Seq(200, 202, 90, 92, 94).map(v =>
      renderImg(16, 12)((_, _) => (v, v, v))))
    val dup = ImageCodec.duplicateScenes(
      docs.unionAll(Seq((7L, repost)).toDF("doc_id", "payload")),
      theta = 16L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared_scenes"), r.getAs[Long]("containment_ppm")))
    assert(dup.toSeq == Seq((3L, 7L, 1L, 500000L)), s"got: ${dup.toSeq}")
  }

  /** 16-bit mono little-endian WAV from raw sample values. */
  private def wav(samples: Seq[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioCodec: PCM WAV windows with exact integer levels; corrupt reported") {
    import spark.implicits._
    import graft.operators.AudioCodec
    // 1000 samples at constant +8192, then 1000 at −16384, then a 500
    // tail at +256: windows must report n=1000/1000/500 and mean-|s|>>8
    // levels exactly 32/64/1
    val samples = Seq.fill(1000)(8192.toShort) ++
      Seq.fill(1000)((-16384).toShort) ++ Seq.fill(500)(256.toShort)
    val docs = Seq((1L, wav(samples)), (2L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = AudioCodec.extractWindows(docs, windowSamples = 1000)
      .orderBy("doc_id", "frame_no").collect()
    val w1 = out.filter(_.getLong(0) == 1L)
    assert(w1.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 1000, 32), (1, 1000, 64), (2, 500, 1)),
      s"windows: ${w1.toSeq}")
    // undecodable → the single sentinel frame, job continues
    val bad = out.filter(_.getLong(0) == 2L)
    assert(bad.length == 1 && bad(0).getInt(1) == -1 && bad(0).getInt(3) == -1)
  }

  test("audio fingerprint: volume-scaled clone identical, distinct clip distinct, pair recovered") {
    import spark.implicits._
    import graft.operators.{AudioCodec, Dedup}
    // a distinctive loudness CONTOUR: per-window amplitude follows a
    // zig-zag, so the energy-delta bits carry real structure
    val contour = (0 until 61).map(w =>
      (500 + 400 * (w % 7) + 30 * (w % 3)).toShort)
    def clip(amps: Seq[Short], scale: Int): Seq[Short] =
      amps.flatMap(a => Seq.fill(100)((a / scale).toShort))
    val original = wav(clip(contour, 1))
    val halfVolume = wav(clip(contour, 2)) // exact /2 — no comparison flips
    val different = wav(clip(contour.reverse, 1))
    val docs = Seq((1L, original), (2L, halfVolume), (3L, different),
      (9L, "static noise?".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val sigs = AudioCodec.fingerprintAudio(docs)
    val rows = sigs.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact scale invariance: the fingerprint is IDENTICAL, not just near
    assert(rows(1L) != 0L && rows(1L) == rows(2L),
      s"half-volume clone must fingerprint identically: $rows")
    assert(rows(3L) != rows(1L), "reversed contour must differ")
    assert(rows(9L) == 0L, "non-audio must sentinel to 0L")
    // and the near-dup machinery recovers exactly the planted pair
    val pairs = Dedup.hammingPairsOf(
      sigs.where(col("phash") =!= 0L), maxHamming = 4, sigCol = "phash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"planted audio pair: $pairs")
  }
}
