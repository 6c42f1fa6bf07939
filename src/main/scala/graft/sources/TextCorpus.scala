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

  /** CSV ingest with the same two commitments as [[readJsonl]]: a
    * DECLARED schema (CSV inference is a full extra pass AND type-guesses
    * per shard) and PERMISSIVE corrupt-line routing (a short row, a
    * stray quote, a type mismatch becomes a [[CorruptCol]] row to count
    * and quarantine, never a silent drop or a job abort). `multiLine`
    * stays OFF: multi-line CSV forces one-task-per-file parsing — the
    * scale posture is "embedded newlines were escaped at export time". */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — readCsv adds it")
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header)
      .option("delimiter", delimiter)
      .csv(path)
  }

  /** Clean rows + corrupt-line count for CSV — [[readJsonlClean]]'s
    * contract over [[readCsv]]. */
  def readCsvClean(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
    val raw = readCsv(spark, path, schema, header, delimiter)
    val bad = raw.agg(
        coalesce(sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("bad"),
        count(col(schema.fieldNames.head)))
      .head().getLong(0)
    (raw.where(col(CorruptCol).isNull).drop(CorruptCol), bad)
  }

  /** Write CSV shards (header + explicit delimiter; gzip by default —
    * same one-task-per-gz-shard reality as JSONL, same
    * `maxRecordsPerFile` knob). Quoting is the writer's job: embedded
    * delimiters/newlines are escaped so [[readCsv]]'s single-line parse
    * round-trips. */
  def writeCsv(df: DataFrame, path: String,
      maxRecordsPerFile: Long = 1000000L,
      compression: String = "gzip"): Unit =
    df.write
      .option("header", true)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .csv(path)

  /** ORC round-trip — the OTHER columnar format corpora arrive in when
    * the upstream is a Hive/Trino warehouse. Spark's native ORC reader
    * gives the same scale properties as parquet: splittable stripes,
    * column pruning, and predicate pushdown to stripe/row-group level
    * (asserted against the plan's PushedFilters in SinkSpec) — so an ORC
    * corpus needs NO conversion step before the pipeline operators run
    * on it. zstd compression: best ratio at comparable scan speed on
    * modern Spark. */
  def writeOrc(df: DataFrame, path: String,
      compression: String = "zstd"): Unit =
    df.write
      .option("compression", compression)
      .mode("overwrite")
      .orc(path)

  /** Read ORC. Schema comes from ORC file metadata (self-describing —
    * no inference pass, unlike text formats; declaring nothing here is
    * safe). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
