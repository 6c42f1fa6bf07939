package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSONL corpus ingestion — the format raw LLM training corpora actually
  * arrive in (one JSON document per line, usually gzip-shards). Two
  * 100 TB realities drive the shape:
  *
  *  - NEVER infer schema: `spark.read.json` without a schema runs a
  *    FULL EXTRA PASS over the corpus just to discover field names, and
  *    two shards disagreeing on a type silently widens columns. The
  *    caller declares the schema; drift becomes data, not surprise.
  *  - NEVER drop bad lines silently: crawl shards contain truncated
  *    lines, encoding garbage, and concatenation seams. PERMISSIVE mode
  *    keeps them, routed into a corrupt-record column the caller counts
  *    and quarantines — the honest alternative to DROPMALFORMED (which
  *    makes corruption invisible) and FAILFAST (which makes one bad line
  *    in shard 90,000 abort a day of work).
  *
  * gzip is splittable-hostile: one .gz shard = one task, so shard SIZE is
  * the parallelism knob at write time (maxRecordsPerFile below, same
  * stance as [[Sink.writeCurated]]). Readers of many small-ish shards
  * parallelize fine; a single 1 TB .gz does not.
  */
object TextCorpus {

  /** The corrupt-line column added by [[readJsonl]]. */
  val CorruptCol = "_corrupt_line"

  /** Read JSONL (plain or .gz/.zst per file extension) under `path` with
    * a DECLARED schema. Malformed lines surface as rows whose
    * [[CorruptCol]] is non-null and whose declared columns are null —
    * count them, quarantine them, never lose them. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — readJsonl adds it")
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** The clean rows of [[readJsonl]] plus the corrupt-line count — the
    * one-call ingest for pipelines that just want "documents + how many
    * lines were garbage". The count is a separate bounded aggregate, not
    * a collect of the bad lines. */
  def readJsonlClean(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
    val raw = readJsonl(spark, path, schema)
    // Spark refuses JSON queries whose scan-referenced columns are ONLY
    // the corrupt-record column; a filter+count prunes down to exactly
    // that. One aggregate that also COUNTS a declared column keeps the
    // scan legal — no caching of the corpus, one bounded pass
    val bad = raw.agg(
        coalesce(sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("bad"),
        count(col(schema.fieldNames.head)))
      .head().getLong(0)
    (raw.where(col(CorruptCol).isNull).drop(CorruptCol), bad)
  }

  /** Write a frame as gzip JSONL shards. `maxRecordsPerFile` bounds shard
    * size — the read-side parallelism knob, since gzip shards are
    * one-task-each (see object doc). */
  def writeJsonl(df: DataFrame, path: String,
      maxRecordsPerFile: Long = 1000000L,
      compression: String = "gzip"): Unit =
    df.write
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .json(path)
}
