package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.examples.StreamingCurationExample

/** Smoke test for the streaming library on-ramp: the composed
  * dedup → quota → foreachBatch pipeline runs end to end, honors each
  * stage's contract, and RESTARTS from its checkpoint with state intact. */
class StreamingExampleSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType), StructField("ts", TimestampType)))

  // 25 tokens with stopwords → clears the 0.3 quality gate; short junk
  // ("junk") scores below it
  private val goodText =
    "the cat sat on a mat and it is a fine day in the park with the dog " +
      "and the bird in a tree"

  test("streaming curation example: dedup, quota, quality gate, profile, restart") {
    val srcDir = tmpDir("scur_src")
    val ckpt = tmpDir("scur_ckpt")
    val curated = tmpDir("scur_out") + "/curated"
    val profile = tmpDir("scur_out") + "/profile"
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def row(id: Long, source: String, text: String, ts: String) =
      s"""{"doc_id":$id,"source":"$source","text":"$text","ts":"$ts"}"""
    def run() = StreamingCurationExample.start(spark,
      spark.readStream.schema(schema).json(srcDir),
      ckpt, curated, profile, quota = 2, minQuality = 0.3)

    // batch 1: s1 has three distinct docs against quota 2 (one quota
    // rejection); doc 31 is junk below the quality gate. (The dedup
    // victim arrives in batch 2 — WITHIN a batch, which twin of an
    // identical pair survives is partition-order-dependent; across
    // batches the state makes it deterministic.)
    writeFile("b1.json", Seq(
      row(10, "s1", goodText, "2026-01-01T10:00:00Z"),
      row(12, "s1", goodText + " one", "2026-01-01T10:01:00Z"),
      row(13, "s1", goodText + " two", "2026-01-01T10:02:00Z"),
      row(31, "s2", "junk", "2026-01-01T10:03:00Z")))
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()

    val out1 = spark.read.parquet(curated)
    // doc 13 over s1's quota, doc 31 below the quality gate (dedup is
    // exercised cross-batch: doc 15 in batch 2 repeats doc 10's text)
    assert(out1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 12L))
    // data columns + the idempotent sink's batch-provenance partition
    assert(out1.columns.toSeq ==
      Seq("doc_id", "source", "text", "ts", "quality", "batch"))

    // restart on the same checkpoint: recovered dedup state still knows
    // goodText's fingerprint; recovered quota state knows s1 is FULL —
    // lost state would admit both 14 and 15
    writeFile("b2.json", Seq(
      row(14, "s1", goodText + " three", "2026-01-01T10:10:00Z"),
      row(15, "s3", goodText, "2026-01-01T10:10:30Z"),
      row(16, "s3", goodText + " four", "2026-01-01T10:11:00Z")))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()

    val out2 = spark.read.parquet(curated)
    // 14 rejected by recovered quota; 15 rejected by recovered dedup
    // (goodText already seen in phase 1); 16 admitted fresh
    assert(out2.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 12L, 16L))

    // the additive profile store sums to the curated totals
    val prof = StreamingCurationExample.profile(spark, profile)
    assert(prof.agg(sum("n_docs")).head().getLong(0) == 3L)
    assert(prof.where(col("mean_quality") < 0.3).isEmpty)
    // every curated row clears the gate
    assert(out2.where(col("quality") < 0.3).isEmpty)
  }

  test("streaming curation with a near-dup ledger: live near-dups quarantine, fresh docs pass") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val srcDir = tmpDir("scur2_src")
    val ckpt = tmpDir("scur2_ckpt")
    val curated = tmpDir("scur2_out") + "/curated"
    val profile = tmpDir("scur2_out") + "/profile"
    val quarantine = tmpDir("scur2_out") + "/quarantine"
    val ledger = "scur2_ndl"
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete(); ()
    }
    Seq(s"${ledger}_bands", s"${ledger}_sets").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      rmRf(new java.io.File(s"spark-warehouse/$t"))
    }
    // the standing ledger knows one curated doc; the stream carries a
    // NEAR-duplicate of it (different exact fingerprint, J ≈ 0.9) and a
    // genuinely fresh doc
    graft.operators.Dedup.writeNearDupLedger(
      Seq((100L, goodText + " five")).toDF("doc_id", "text"), ledger,
      buckets = 4)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "b1.json"),
        Seq(
          s"""{"doc_id":201,"source":"s1","text":"$goodText six","ts":"2026-01-01T10:00:00Z"}""",
          s"""{"doc_id":202,"source":"s1","text":"fresh words entirely and the day is a good one for a long walk in the new town by the sea","ts":"2026-01-01T10:01:00Z"}""")
          .mkString("\n").getBytes("UTF-8"))
      val q = StreamingCurationExample.start(spark,
        spark.readStream.schema(schema).json(srcDir),
        ckpt, curated, profile, quota = 10, minQuality = 0.3,
        nearDupLedger = Some(ledger), quarantineDir = Some(quarantine))
      try q.processAllAvailable() finally q.stop()
      val kept = spark.read.parquet(curated)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val quarantined = spark.read.parquet(quarantine)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(quarantined == Set(201L),
        s"the live near-dup of a ledger doc must quarantine: $quarantined")
      assert(kept == Set(202L), s"fresh doc must pass: $kept")
      // profile rows count only the CLEAN admissions
      assert(StreamingCurationExample.profile(spark, profile)
        .agg(org.apache.spark.sql.functions.sum("n_docs"))
        .head().getLong(0) == 1L)
    } finally {
      Seq(s"${ledger}_bands", s"${ledger}_sets").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
      }
    }
  }
}
