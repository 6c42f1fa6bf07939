package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sink, Tables}

/** Curated-output write path: directory partitioning, bounded file sizes,
  * lossless round trip. */
class SinkSpec extends SparkSpec {

  test("writeCurated partitions by column, bounds file size, round-trips") {
    val dir = tmpDir("curated_out")
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars")
    Sink.writeCurated(docs, dir, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"), maxRecordsPerFile = 50)
    // directory layout: one subdir per language (reader-prunable)
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langDirs == langs.map(l => s"lang=$l"))
    // file sizes bounded: every parquet file holds <= 50 rows
    for (d <- new java.io.File(dir).listFiles() if d.isDirectory;
        f <- d.listFiles() if f.getName.endsWith(".parquet")) {
      assert(spark.read.parquet(f.getPath).count() <= 50)
    }
    // lossless round trip (lang comes back from the directory key)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "lang", "n_chars").except(docs).isEmpty)
    // rows inside a file are clustered by the sort key
    val firstFile = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ids = spark.read.parquet(firstFile.getPath)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }
}
