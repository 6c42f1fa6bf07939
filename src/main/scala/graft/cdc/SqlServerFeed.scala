package graft.cdc

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SourceDef
import graft.cdc.ChangeTracking.ChangeFeed

/** Production SQL Server change feed (ref
  * /root/reference/src/jdbc/melt/sql_server.clj:63-109): version scalars run
  * on a driver-side JDBC connection; the change scan runs through
  * `spark.read.jdbc` with the CHANGETABLE entity query pushed down whole —
  * the table-valued function, PK left-outer join, and ORDER BY all execute
  * inside SQL Server (pushdown by construction, SURVEY §4).
  *
  * NOT exercised by the offline test environment (no SQL Server) — the CDC
  * logic it feeds is covered via in-memory feeds (CdcSpec/CdcStreamSpec);
  * this class is the thin binding layer.
  */
final class SqlServerFeed(spark: SparkSession, url: String, props: Properties,
    source: SourceDef, nonKeyCols: Seq[String]) extends ChangeFeed {

  private def scalarLong(sql: String): Long = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      if (!rs.next()) throw new IllegalStateException(s"no row from: $sql")
      val v = rs.getLong(1)
      // CHANGE_TRACKING_* return NULL when tracking is not enabled — 0 here
      // would look like a valid watermark and silently deliver no changes
      if (rs.wasNull()) throw new IllegalStateException(
        s"change tracking not enabled (NULL from: $sql)")
      v
    } finally conn.close()
  }

  override def currentVersion(): Long =
    scalarLong(ChangeTracking.CurrentVersionSql)

  override def minValidVersion(): Long =
    scalarLong(ChangeTracking.minValidVersionSql(source.schemaName, source.name))

  /** Changes strictly after `ver`. The version literal is inlined by the
    * builder (Spark's JDBC `query` option cannot bind parameters); it is a
    * Long, so no injection surface exists. No ORDER BY: Spark wraps the
    * query as a subquery (SQL Server rejects ORDER BY there), and this
    * engine's watermark is agg(max), not last-row order
    * (ChangeTracking.sendChanges). */
  override def changesSince(ver: Long): DataFrame = {
    val sql = ChangeTracking.changeEntitySqlAt(
      source.schemaName, source.name, source.keys, nonKeyCols, ver)
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
    props.stringPropertyNames.forEach(k => reader.option(k, props.getProperty(k)))
    reader.load()
  }
}
