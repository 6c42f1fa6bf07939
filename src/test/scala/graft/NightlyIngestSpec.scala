package graft

import org.apache.spark.sql.functions._
import graft.examples.NightlyIngestExample
import graft.sources.Tables.t

/** The nightly-batch on-ramp: two nights over overlapping batches must
  * admit each document exactly once, grow the curated store append-only,
  * and keep the ANN index in step — without reprocessing history. */
class NightlyIngestSpec extends SparkSpec {

  test("two nights: standing fingerprints reject re-sent docs; store and index grow in step") {
    val docs = t(spark, sf, "documents")
    val vecs = t(spark, sf, "embeddings").select("vec_id", "embedding")
    val curated = tmpDir("nightly") + "/curated"
    val index = tmpDir("nightly") + "/index"

    // night 1: docs 0–249 (the fixture contains intra-batch duplicates —
    // first-in-batch wins, the rest reject)
    val n1 = docs.where(col("doc_id") < 250)
    val r1 = NightlyIngestExample.ingestNight(spark, n1,
      vecs.where(col("vec_id") < 250), curated, index)
    assert(r1.admitted + r1.rejected == 250)
    assert(r1.admitted > 0 && !r1.indexRetrained)
    val store1 = spark.read.parquet(curated)
    assert(store1.count() == r1.admitted - r1.belowQuality)

    // night 2: docs 0–299 re-sent — everything night 1 admitted (or that
    // shares its fingerprint) must reject against the STANDING store;
    // only genuinely new content (ids 250–299, minus cross-night dups)
    // can be admitted
    val n2 = docs.where(col("doc_id") < 300)
    val r2 = NightlyIngestExample.ingestNight(spark, n2,
      vecs.where(col("vec_id") < 300), curated, index)
    assert(r2.admitted + r2.rejected == 300)
    assert(r2.admitted <= 50, s"re-sent docs were re-admitted: $r2")
    val store2 = spark.read.parquet(curated)
    // append-only growth by exactly night 2's survivors
    assert(store2.count() == store1.count() + r2.admitted - r2.belowQuality)
    // one admission per document ever: ids unique, quality gate holds
    assert(store2.select("doc_id").distinct().count() == store2.count())
    assert(store2.where(col("quality") < 0.3).isEmpty)
    // every night-2 addition is genuinely new content
    val added = store2.join(store1.select("doc_id"), Seq("doc_id"),
      "left_anti")
    assert(added.where(col("doc_id") < 250).isEmpty)

    // the index holds exactly the store's documents' vectors
    assert(spark.read.parquet(index).count() == store2.count())
    // and a night-2 survivor's own embedding retrieves it at cosine 1.0
    val probe = added.orderBy("doc_id").limit(1).select("doc_id").head()
      .getLong(0)
    val qv = vecs.where(col("vec_id") === probe).select("embedding")
      .head().getSeq[Float](0).toArray
    val hit = Similarityprobe(qv, index)
    assert(hit.getLong(0) == probe && hit.getDouble(1) == 1.0)
  }

  private def Similarityprobe(qv: Array[Float],
      index: String): org.apache.spark.sql.Row =
    graft.operators.Similarity.probeIvfIndex(spark, index, qv,
      nprobe = 10, k = 1).head()
}
