package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.ChangeTracking
import graft.cdc.ChangeTracking.{ChangeFeed, SendResult}
import graft.store.LocalStore

/** O25–O30 change-tracking CDC with an in-memory feed, replaying the
  * reference's three-round UPDATE/INSERT/DELETE arc
  * (ref integration/jdbc/melt/integration_test.clj:197-230). */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  val source = SourceDef("graft", "dbo", "orders", Seq("o_orderkey"))

  final class FakeFeed(all: DataFrame, current: Long, minValid: Long = 0)
      extends ChangeFeed {
    override def currentVersion(): Long = current
    override def minValidVersion(): Long = minValid
    override def changesSince(ver: Long): DataFrame =
      all.where(col("sys_change_version") > ver)
  }

  private def changesDf(rows: Seq[(Long, String, Long, java.lang.Double)]): DataFrame =
    rows.toDF("sys_change_version", "sys_change_operation", "o_orderkey",
      "o_totalprice")

  test("O26 SQL builders match the reference's CHANGETABLE shape") {
    val sql = ChangeTracking.changeEntitySql("SalesLT", "Address",
      Seq("AddressID"), Seq("City", "PostalCode"))
    assert(sql.contains("CHANGETABLE(CHANGES [SalesLT].[Address], ?)"))
    assert(sql.contains("Left Outer Join [SalesLT].[Address] As t"))
    assert(sql.contains("ct.[AddressID] = t.[AddressID]"))
    assert(sql.contains("Order By ct.sys_change_version"))
    assert(sql.contains("ct.[sys_change_version]") && sql.contains("t.[City]"))
    assert(ChangeTracking.changeSql("s", "t")
      == "Select ct.* From CHANGETABLE(CHANGES [s].[t], ?) As ct Order By ct.sys_change_version")
  }

  test("O28 change projection: tracking fields relocated, D ⇒ tombstone") {
    val ch = changesDf(Seq((5L, "U", 1L, 10.5), (6L, "D", 2L, null)))
    val msgs = ChangeTracking.changeMessages(ch, source)
    assert(msgs.columns.toSeq == Seq("topic", "key", "value")) // xform contract
    val rows = msgs.orderBy("key").collect()
    assert(rows(0).getAs[String]("key") == """{"o_orderkey":1}""")
    val v = rows(0).getAs[String]("value")
    // value carries entity columns only — no sys_change_* inside
    assert(v.contains(""""o_totalprice":10.5""") && !v.contains("sys_change"))
    // delete → null value tombstone (ref sql_server.clj:121-124)
    assert(rows(1).getAs[String]("key") == """{"o_orderkey":2}""")
    assert(rows(1).isNullAt(rows(1).fieldIndex("value")))
  }

  test("O29 sendChanges advances the version watermark; empty batch is a no-op") {
    val store = new LocalStore(spark, tmpDir("cdc"))
    val feed = new FakeFeed(
      changesDf(Seq((5L, "I", 1L, 1.0), (6L, "U", 1L, 2.0), (7L, "I", 2L, 3.0))),
      current = 7)
    val r1 = ChangeTracking.sendChanges(feed, source, store, ver = 5)
    assert(r1 == SendResult(version = 7, sentCount = 2))
    // compacted state reflects the upserts
    val st = store.topicState(Seq(source.topic))
    assert(st.count() == 2)
    // nothing newer → version unchanged, nothing sent (ref sql_server.clj:137-144)
    val r2 = ChangeTracking.sendChanges(feed, source, store, ver = r1.version)
    assert(r2 == SendResult(version = 7, sentCount = 0))
  }

  test("O29/O11 delete round-trip: tombstone removes the key from state") {
    val store = new LocalStore(spark, tmpDir("cdc2"))
    val feed = new FakeFeed(
      changesDf(Seq((1L, "I", 1L, 1.0), (2L, "D", 1L, null))), current = 2)
    ChangeTracking.sendChanges(feed, source, store, ver = 0)
    assert(store.topicState(Seq(source.topic)).isEmpty)
  }

  test("O30 bootstrap captures version BEFORE full sync (no gap)") {
    val store = new LocalStore(spark, tmpDir("cdc3"))
    var capturedBeforeSync = -1L
    val feed = new FakeFeed(changesDf(Seq((11L, "I", 9L, 9.0))), current = 10)
    val r = ChangeTracking.bootstrapThenChanges(feed, source, store, () => {
      capturedBeforeSync = feed.currentVersion(); 0L
    })
    // change version 11 landed "during" the sync → still picked up
    assert(capturedBeforeSync == 10 && r.sentCount == 1 && r.version == 11)
  }

  test("O27 stored version validity vs retention (ref sql_server.clj:100-104)") {
    val feed = new FakeFeed(changesDf(Seq.empty), current = 100, minValid = 50)
    assert(ChangeTracking.versionValid(feed, 50))
    assert(!ChangeTracking.versionValid(feed, 49))
  }

  test("O29 poll loop chains versions across rounds (ref integration_test.clj:203-226)") {
    val store = new LocalStore(spark, tmpDir("cdc4"))
    val feed = new FakeFeed(
      changesDf(Seq((1L, "I", 1L, 1.0), (2L, "U", 1L, 2.0), (3L, "D", 1L, null))),
      current = 3)
    val r = ChangeTracking.poll(feed, source, store, fromVer = 0, rounds = 2)
    // round 1 compacts the 3 versions of key 1 to its newest (the v3
    // tombstone) — batch-internal sink order is undefined, so only the
    // newest version per key is sent; round 2 finds nothing newer
    assert(r.version == 3 && r.sentCount == 1)
    assert(store.topicState(Seq(source.topic)).isEmpty) // final state: deleted
  }

  test("O25 trackable-untracked set difference (ref sql_server.clj:48-51)") {
    val a = SourceDef("c", "s", "a", Seq("id"))
    val b = SourceDef("c", "s", "b", Seq("id"))
    val keyless = SourceDef("c", "s", "k", Seq.empty)
    val out = ChangeTracking.trackableUntracked(Seq(a, b, keyless),
      tracked = Set(("s", "a")))
    assert(out == Seq(b)) // keyless is untrackable; a already tracked
  }

  test("O25 trackAll applies DDL to every trackable-untracked table, in order") {
    val a = SourceDef("c", "s", "a", Seq("id"))
    val b = SourceDef("c", "s", "b", Seq("id"))
    val c = SourceDef("c", "s", "c", Seq("id"))
    val keyless = SourceDef("c", "s", "k", Seq.empty)
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = ChangeTracking.trackAll(ran += _, Seq(a, b, c, keyless),
      trackedNames = Set(("s", "b")))
    // one statement per untracked trackable, none for b (tracked) or k (keyless)
    assert(out == Seq("ALTER TABLE [s].[a] ENABLE CHANGE_TRACKING",
      "ALTER TABLE [s].[c] ENABLE CHANGE_TRACKING"))
    assert(ran.toSeq == out)
  }

  test("O25 untrackAll disables exactly the tracked tables (ref sql_server.clj:60-61)") {
    val a = SourceDef("c", "s", "a", Seq("id"))
    val b = SourceDef("c", "s", "b", Seq("id"))
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = ChangeTracking.untrackAll(ran += _, Seq(a, b),
      trackedNames = Set(("s", "b")))
    assert(out == Seq("ALTER TABLE [s].[b] DISABLE CHANGE_TRACKING"))
    assert(ran.toSeq == out)
  }

  test("O25 trackAllScript emits a GO-separated reviewable batch") {
    val a = SourceDef("c", "s", "a", Seq("id"))
    val b = SourceDef("c", "s", "b", Seq("id"))
    val script = ChangeTracking.trackAllScript(Seq(a, b), trackedNames = Set.empty)
    assert(script ==
      "ALTER TABLE [s].[a] ENABLE CHANGE_TRACKING\nGO\n" +
        "ALTER TABLE [s].[b] ENABLE CHANGE_TRACKING\nGO")
  }

  test("O25 listTracked reads (schema, table) pairs over live JDBC") {
    // Derby has no sys.change_tracking_tables; exercise the JDBC plumbing
    // (statement lifecycle, 2-column row shape) against an equivalent query
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:derby:memory:trackdb;create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE tracked_probe(schema_name VARCHAR(10), table_name VARCHAR(10))")
      st.execute("INSERT INTO tracked_probe VALUES ('s', 'a'), ('s', 'b')")
      st.close()
      val rs = conn.createStatement().executeQuery("SELECT schema_name, table_name FROM tracked_probe")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getString(1), r.getString(2))).toSet
      assert(got == Set(("s", "a"), ("s", "b")))
      // and the production catalog SQL is the reference's, verbatim shape
      assert(ChangeTracking.ListTrackedSql.contains("sys.change_tracking_tables"))
      assert(ChangeTracking.ListTrackedSql.contains("object_schema_name(object_id)"))
    } finally conn.close()
  }
}
