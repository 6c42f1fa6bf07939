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
}
