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
    // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (earlier
    // driver generators; vanilla Spark 4 rejects it, PARQUET_TYPE_ILLEGAL,
    // hence nanosAsLong) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    // (current generator → TIMESTAMP_NTZ). The engine's internal contract
    // is ts = epoch-NANO long (`ts DIV 1000` = µs at every call site), so
    // normalize whatever the file stores to that here — the one choke
    // point every query reads through. The NTZ branch uses timestampdiff
    // over NTZ operands: pure wall-clock arithmetic, no session-timezone
    // dependence, and identical to the DuckDB oracle's epoch_us() reading
    // of the same naive values. The conf is set HERE (not only in
    // GraftSession) because the driver contract calls queries with a
    // session this library did not build; it is runtime-settable and
    // idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case _: org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "unix_micros(ts) * 1000"))
      case other => sys.error(s"events.ts: unexpected type $other")
    }
  }

  /** Register every table as a temp view (for the SQL facade / bench). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
