package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet test-table access. The driver testdata (TESTDATA.md) stands in
  * for the reference's JDBC tables (ref /root/reference/src/jdbc/melt.clj:141-151
  * `query-source`): one parquet file per table under the scale-factor dir.
  *
  * At cluster scale these reads are plain distributed parquet scans —
  * Catalyst pushes filters and prunes columns down to the footer level, so
  * every query in the engine should consume tables through here and let the
  * optimizer do the pruning (never pre-collect).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark 4 rejects
    // (PARQUET_TYPE_ILLEGAL). Read nanos as epoch-nano longs: ordering —
    // the only semantic the engine needs from ts (last-write-wins, windows)
    // — is preserved; cast ts_micros(ts DIV 1000) where a real timestamp is
    // needed. The conf is set HERE (not only in GraftSession) because the
    // driver contract calls queries with a session this library did not
    // build; it is runtime-settable and idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (for the SQL facade / bench). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
