package graft.cdc

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SourceDef
import graft.cdc.ChangeTracking.ChangeFeed

/** Generic JDBC CDC over a MONOTONE column — the portable fallback for
  * databases without CHANGETABLE (ref sql_server.clj is SQL Server-only;
  * a real user's second database rarely is). Any table carrying a
  * sequence / monotone version / `updated_at` column becomes a
  * [[ChangeTracking.ChangeFeed]]:
  *
  *  - `currentVersion()` = `max(watermarkCol)` (driver-side scalar);
  *  - `changesSince(v)` = rows with `watermarkCol > v`, pushed down whole
  *    to the DB through `spark.read.jdbc` (predicate AND projection run
  *    in the source database), with `sys_change_version` /
  *    `sys_change_operation` synthesized in the pushdown query so every
  *    downstream stage — [[ChangeTracking.sendChanges]], the compacted
  *    projection, [[ChangeTracking.bootstrapThenChanges]]'s no-gap
  *    capture-before-snapshot contract, the DSv2
  *    [[graft.cdc.stream.CdcSource]] offset machinery — works unchanged.
  *
  * Honest semantic limits vs real change tracking (callers must know):
  *  - DELETES ARE INVISIBLE: a vanished row never surfaces as a
  *    tombstone. Pair with a periodic [[graft.ops.Ops.deleted]] anti-join
  *    sweep when deletes matter.
  *  - The column must be monotone AT COMMIT TIME. A sequence/identity
  *    column is; wall-clock `updated_at` is NOT under concurrent writers
  *    (a transaction can commit an older timestamp after a newer one was
  *    already read past). For timestamp columns set `safetyLag` to the
  *    maximum commit skew: reads then stop at `currentVersion − lag`, so
  *    a straggler always lands ahead of the advancing cursor. Overlap
  *    re-delivery is harmless either way — messages are idempotent
  *    keyed upserts (same contract as ref sql_server.clj:155-162).
  *
  * `watermarkCol` must cast to BIGINT in the source database (sequence,
  * version counter, epoch millis). Identifiers are ANSI-quoted
  * (`"ident"`, embedded quotes doubled) — portable across Derby,
  * Postgres, and SQL Server's default QUOTED_IDENTIFIER ON. */
final class WatermarkFeed(spark: SparkSession, url: String, props: Properties,
    source: SourceDef, watermarkCol: String, entityCols: Seq[String],
    safetyLag: Long = 0L) extends ChangeFeed {
  require(safetyLag >= 0, s"safetyLag: $safetyLag")

  private def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
  private def tbl = s"${q(source.schemaName)}.${q(source.name)}"
  private def wm = s"CAST(${q(watermarkCol)} AS BIGINT)"

  private def scalarLong(sql: String): Long = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      if (!rs.next()) throw new IllegalStateException(s"no row from: $sql")
      rs.getLong(1) // empty table → COALESCE gives 0: "no changes yet"
    } finally conn.close()
  }

  /** The high-water mark the cursor may safely advance to right now. */
  override def currentVersion(): Long =
    scalarLong(s"Select COALESCE(MAX($wm), 0) From $tbl") - safetyLag

  /** No retention window: any stored watermark stays valid forever (the
    * table itself IS the history — there is nothing to clean up). */
  override def minValidVersion(): Long = Long.MinValue

  /** Rows with watermark in `(ver, currentVersion]` — the upper bound is
    * what makes a `safetyLag` airtight: a straggler committing below the
    * bound is picked up by the round that first sees the bound above it,
    * and the cursor ([[ChangeTracking.sendChanges]] advances to
    * max(sys_change_version) DELIVERED) never passes an undelivered row. */
  override def changesSince(ver: Long): DataFrame = {
    val upper = currentVersion()
    val cols = entityCols.map(q).mkString(", ")
    val sql = s"Select $cols, $wm As sys_change_version, " +
      s"'U' As sys_change_operation From $tbl " +
      s"Where $wm > $ver And $wm <= $upper"
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
    props.stringPropertyNames.forEach(k => reader.option(k, props.getProperty(k)))
    reader.load()
  }
}

/** The same watermark-table CDC as a [[graft.cdc.stream.CdcFeedRegistry.VersionedFeed]]
  * — plugs the monotone column STRAIGHT into the DSv2 micro-batch source
  * (`spark.readStream.format("graft-cdc")`): the streaming offset is the
  * watermark value, each trigger reads `(start, end]` with the range bound
  * inside the database, and checkpoint/restart recovery rides the engine.
  * Plain JDBC (not spark.read) because `rows` executes on whichever JVM
  * plans the partition — pair with a `FeedProvider` for the cluster path,
  * exactly like SqlServerFeed's contract.
  *
  * Schema is discovered once from the database (`Where 1 = 0` probe) and
  * covers the JDBC types the testdata uses (integral/decimal/float/char/
  * timestamp/date/boolean/binary); anything else fails loudly rather than
  * corrupting silently. */
final class WatermarkVersionedFeed(url: String, props: Properties,
    schemaName: String, table: String, watermarkCol: String,
    entityCols: Seq[String], safetyLag: Long = 0L)
    extends graft.cdc.stream.CdcFeedRegistry.VersionedFeed {
  import org.apache.spark.sql.types._
  require(safetyLag >= 0, s"safetyLag: $safetyLag")

  private def q(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""
  private def tbl = s"${q(schemaName)}.${q(table)}"
  private def wm = s"CAST(${q(watermarkCol)} AS BIGINT)"
  private def cols = entityCols.map(q).mkString(", ")
  private def selectSql =
    s"Select $cols, $wm As sys_change_version, " +
      s"'U' As sys_change_operation From $tbl"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def sparkType(jdbcType: Int): DataType = jdbcType match {
    case java.sql.Types.BIGINT => LongType
    case java.sql.Types.INTEGER => IntegerType
    case java.sql.Types.SMALLINT => ShortType
    case java.sql.Types.TINYINT => ByteType
    case java.sql.Types.DOUBLE | java.sql.Types.FLOAT => DoubleType
    case java.sql.Types.REAL => FloatType
    case java.sql.Types.DECIMAL | java.sql.Types.NUMERIC =>
      DecimalType.SYSTEM_DEFAULT
    case java.sql.Types.CHAR | java.sql.Types.VARCHAR |
        java.sql.Types.LONGVARCHAR | java.sql.Types.CLOB => StringType
    case java.sql.Types.TIMESTAMP => TimestampType
    case java.sql.Types.DATE => DateType
    case java.sql.Types.BOOLEAN | java.sql.Types.BIT => BooleanType
    case java.sql.Types.BINARY | java.sql.Types.VARBINARY |
        java.sql.Types.LONGVARBINARY | java.sql.Types.BLOB => BinaryType
    case t => throw new IllegalArgumentException(
      s"unmapped JDBC type $t on $tbl — extend WatermarkVersionedFeed.sparkType")
  }

  override lazy val schema: StructType = withConn { conn =>
    val st = conn.createStatement()
    try {
      val md = st.executeQuery(s"$selectSql Where 1 = 0").getMetaData
      StructType((1 to md.getColumnCount).map { i =>
        StructField(md.getColumnLabel(i).toLowerCase,
          sparkType(md.getColumnType(i)), md.isNullable(i) != 0)
      })
    } finally st.close()
  }

  override def currentVersion(): Long = withConn { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"Select COALESCE(MAX($wm), 0) From $tbl")
      rs.next()
      rs.getLong(1) - safetyLag
    } finally st.close()
  }

  override def rows(fromExclusive: Long,
      toInclusive: Long): Iterator[org.apache.spark.sql.Row] = withConn { conn =>
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"$selectSql Where $wm > $fromExclusive And $wm <= $toInclusive")
      val fields = schema.fields
      val out = Vector.newBuilder[org.apache.spark.sql.Row]
      while (rs.next()) {
        val vals = fields.indices.map { i =>
          val v = fields(i).dataType match {
            case LongType => rs.getLong(i + 1)
            case IntegerType => rs.getInt(i + 1)
            case ShortType => rs.getShort(i + 1)
            case ByteType => rs.getByte(i + 1)
            case DoubleType => rs.getDouble(i + 1)
            case FloatType => rs.getFloat(i + 1)
            case _: DecimalType => rs.getBigDecimal(i + 1)
            case StringType => rs.getString(i + 1)
            case TimestampType => rs.getTimestamp(i + 1)
            case DateType => rs.getDate(i + 1)
            case BooleanType => rs.getBoolean(i + 1)
            case BinaryType => rs.getBytes(i + 1)
            case t => throw new IllegalStateException(s"unreachable: $t")
          }
          if (rs.wasNull()) null else v
        }
        out += org.apache.spark.sql.Row(vals: _*)
      }
      // materialized before the connection closes — per-trigger change
      // volume is bounded by the trigger interval, same sizing argument
      // as the single-partition CDC batch plan (CdcSource scaladoc)
      out.result().iterator
    } finally st.close()
  }
}
