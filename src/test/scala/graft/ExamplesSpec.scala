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
}
