package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** The composed-graph pin rule — "any frame a graph consumes more than
  * once must be pinned" — enforced mechanically by [[PinAudit]] instead
  * of by prose (r13 verdict #1: the sf10 rehearsal's one real plan bug
  * was exactly this shape, and nothing stopped the next example from
  * reintroducing it).
  *
  * Positive control: a deliberately-unpinned twin of the fixed `losers`
  * pattern MUST trip the audit. Negative control: the identical graph
  * with the pin MUST pass. The ten examples' own graphs are audited
  * where they already run (ExamplesSpec / NightlyIngestSpec /
  * StreamingExampleSpec / CdcToKafkaExampleSpec wrap their example
  * invocations in `PinAudit.auditedOrThrow`); [[TrainingMixExample]],
  * which had no spec, is audited here.
  */
class PinDisciplineSpec extends SparkSpec {

  test("audit FIRES on the unpinned losers twin (two gates re-run MinHash-LSH)") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val (_, vs) = PinAudit.audited(spark) {
      // the exact pre-fix PretrainPipelineExample shape: the near-dup
      // loser set feeds BOTH the survivor anti-join and the independent
      // reject semi-join, with NO pin — each gate action pays the whole
      // banded MinHash-LSH candidate pipeline again
      val losers = Dedup.minhashNearDupsOf(docs, 0.5)
        .select(col("idb").as("doc_id")).distinct()
      val kept = docs.join(losers, Seq("doc_id"), "left_anti").count()
      val dropped = docs.join(losers, Seq("doc_id"), "left_semi").count()
      (kept, dropped)
    }
    assert(vs.nonEmpty,
      "the unpinned twice-consumed MinHash pipeline must be flagged")
    // the flagged subtree is the shared candidate pipeline: it must
    // span exactly the two gate actions and contain real plan depth
    assert(vs.head.actionIds.size == 2, vs.head.toString)
    assert(vs.head.nodes >= 3, vs.head.toString)
  }

  test("audit passes the identical graph once the shared frame is pinned") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val ((kept, dropped), vs) = PinAudit.audited(spark) {
      val losers = Materialize.pin(Dedup.minhashNearDupsOf(docs, 0.5)
        .select(col("idb").as("doc_id")).distinct())
      val k = docs.join(losers, Seq("doc_id"), "left_anti").count()
      val d = docs.join(losers, Seq("doc_id"), "left_semi").count()
      Materialize.unpin(losers)
      (k, d)
    }
    assert(vs.isEmpty, vs.mkString("\n"))
    assert(kept + dropped == docs.count())
  }

  test("audit passes a persist-pinned frame too (the cache boundary is a leaf)") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val (_, vs) = PinAudit.audited(spark) {
      val losers = Dedup.minhashNearDupsOf(docs, 0.5)
        .select(col("idb").as("doc_id")).distinct().persist()
      try {
        losers.count() // materialize the cache before the consumers
        docs.join(losers, Seq("doc_id"), "left_anti").count()
        docs.join(losers, Seq("doc_id"), "left_semi").count()
      } finally { losers.unpersist(); () }
    }
    assert(vs.isEmpty, vs.mkString("\n"))
  }

  test("audit sees INSIDE foreachBatch: an unpinned double-consume in the batch body fires") {
    import spark.implicits._
    val src = tmpDir("pinfb_src")
    val ckpt = tmpDir("pinfb_ckpt")
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "b1.json"),
      (0 until 50).map(i => s"""{"doc_id":$i,"text":"w$i w${i % 7}"}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val (_, vs) = PinAudit.audited(spark) {
      val q = spark.readStream.schema(schema).json(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // the losers shape at micro-batch cadence: an unpinned
          // aggregate consumed by two separate gate actions (anti +
          // semi prune identically, so the shared subplan is canonical
          // across both — the exact pre-fix pattern)
          val agg = batch.groupBy("text").agg(min("doc_id").as("doc_id"))
          batch.join(agg.select("doc_id"), Seq("doc_id"), "left_anti").count()
          batch.join(agg.select("doc_id"), Seq("doc_id"), "left_semi").count()
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(vs.nonEmpty,
      "the audit must observe batch actions inside foreachBatch — " +
        "streaming curation's pin discipline depends on this visibility")
  }

  test("TrainingMixExample's composed graph honors the pin rule end to end") {
    import graft.examples.TrainingMixExample
    val mix = PinAudit.auditedOrThrow(spark) {
      val m = TrainingMixExample.trainingMix(spark, sf)
      m.persist()
      val n = m.count()
      assert(n == Tables.t(spark, sf, "documents").count(),
        "every document gets a mix assignment")
      m
    }
    try {
      // sanity on the assignment shape while we have it materialized
      assert(mix.where(col("split") === "train")
        .where(col("phase").isNull).isEmpty,
        "train docs must carry a phase")
      assert(mix.where(col("split") =!= "train")
        .where(col("phase").isNotNull).isEmpty,
        "val docs must not be ordered")
    } finally { mix.unpersist(); () }
  }
}
