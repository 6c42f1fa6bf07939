package graft

import org.apache.spark.sql.functions._
import graft.examples.CurationExample

/** Smoke test for the README "use as a library" example: the composed
  * pipeline must run end to end on the smallest fixture and actually
  * exercise each stage's contract (scrub columns present, quality gate
  * applied, write path produces partitioned output). */
class ExamplesSpec extends SparkSpec {

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
    val n = RagIndexExample.buildRagIndex(spark, docs, root)
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
    val same = CorpusReportExample.nightlyReport(docs, docs, emb, emb)
    same.scalarDrift.collect().foreach(r =>
      assert(r.getAs[String]("verdict") == "stable", r.toString))
    same.embeddingDrift.collect().foreach(r =>
      assert(r.getAs[String]("verdict") == "stable", r.toString))
    val n0 = same.novelty.collect()(0)
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
