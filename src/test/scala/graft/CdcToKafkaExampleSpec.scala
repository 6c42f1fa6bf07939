package graft

import java.util.Properties
import org.apache.spark.sql.functions._
import graft.cdc.WatermarkVersionedFeed
import graft.cdc.stream.CdcFeedRegistry
import graft.examples.CdcToKafkaExample
import graft.store.KafkaStore
import graft.store.kafkaemu.{EmuBroker, EmuKafkaAdmin}

/** The full melt-replacement composition live (VERDICT r7 §next-round #6):
  * watermark-versioned Derby table → no-gap bootstrap → `graft-cdc` DSv2
  * micro-batch stream → canonical messages → KafkaStore producer writes
  * onto the emulated broker, with a checkpointed stop/restart proving no
  * gap and no duplicate. */
class CdcToKafkaExampleSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:cdckafkadb;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  private def exec(sqls: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(url, props)
    try sqls.foreach { s =>
      val st = c.createStatement(); try st.execute(s) finally st.close()
    } finally c.close()
  }

  test("bootstrap → stream → stop → mutate → restart: no gap, no duplicate") {
    exec("CREATE TABLE MITEMS (ID BIGINT PRIMARY KEY, NAME VARCHAR(32), SEQ BIGINT)",
      "INSERT INTO MITEMS VALUES (1, 'ada', 1), (2, 'bob', 2), (3, 'eve', 3)")
    val bootstrapServers = "emu://mirror:9092"
    EmuBroker.reset(bootstrapServers)
    val store = new KafkaStore(spark, bootstrapServers,
      adminOverride = Some(new EmuKafkaAdmin(bootstrapServers)),
      format = "kafka-emu")
    val source = SourceDef("graft", "APP", "MITEMS", Seq("id"))
    CdcFeedRegistry.register("mirror_items", new WatermarkVersionedFeed(
      url, props, "APP", "MITEMS", "SEQ", Seq("ID", "NAME", "SEQ")))
    val feed = CdcFeedRegistry.get("mirror_items")
    val ckpt = tmpDir("cdc2kafka_ckpt")

    // 1. no-gap bootstrap: version captured pre-snapshot; empty topic →
    //    the diff-driven sync snapshots every row through the kafka write
    val b = PinAudit.auditedOrThrow(spark) {
      CdcToKafkaExample.bootstrap(spark, url, props, source, feed, store)
    }
    assert(b == CdcToKafkaExample.Bootstrap(fromVersion = 3, snapshotCount = 3))

    // 2. stream from the captured version: nothing to deliver yet
    val q1 = CdcToKafkaExample.start(spark, "mirror_items", source, store,
      ckpt, b.fromVersion)
    try {
      q1.processAllAvailable()
      assert(store.read(Seq(source.topic)).count() == 3)

      // 3. a live change flows through the running stream
      exec("UPDATE MITEMS SET NAME = 'ada2', SEQ = 4 WHERE ID = 1")
      q1.processAllAvailable()
      assert(store.read(Seq(source.topic)).count() == 4)
    } finally q1.stop()

    // 4. changes land while the stream is DOWN
    exec("UPDATE MITEMS SET NAME = 'bob2', SEQ = 5 WHERE ID = 2",
      "INSERT INTO MITEMS VALUES (4, 'dan', 6)")

    // 5. restart from the same checkpoint: the two offline changes arrive
    //    (no gap), versions 1-4 are not re-planned (no duplicate)
    val q2 = CdcToKafkaExample.start(spark, "mirror_items", source, store,
      ckpt, b.fromVersion)
    try {
      PinAudit.auditedOrThrow(spark) { q2.processAllAvailable() }
      val raw = store.read(Seq(source.topic))
      assert(raw.count() == 6, "3 snapshot + 1 live + 2 offline, nothing replayed")

      val state = CdcToKafkaExample.mirroredState(store, source).collect()
        .map(r => r.getString(1) -> r.getString(2)).toMap
      assert(state.keySet ==
        Set(1, 2, 3, 4).map(k => s"""{"id":$k}"""))
      assert(state("""{"id":1}""").contains("ada2"))
      assert(state("""{"id":2}""").contains("bob2"))
      assert(state("""{"id":4}""").contains("dan"))
    } finally q2.stop()
    store.close()
  }

  test("direct kafka-emu streaming sink: epochs append, checkpointed resume does not replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bootstrapServers = "emu://sink:9092"
    EmuBroker.reset(bootstrapServers)
    val ckpt = tmpDir("emusink_ckpt")
    val in = MemoryStream[(String, String)]

    def start() = in.toDF().toDF("key", "value")
      .selectExpr("'events' AS topic", "CAST(key AS BINARY) AS key",
        "CAST(value AS BINARY) AS value")
      .writeStream.format("kafka-emu")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", ckpt)
      .start()

    def topicCount(): Long = spark.read.format("kafka-emu")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", "events").load().count()

    in.addData(("k1", "v1"), ("k2", "v2"))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(topicCount() == 2)

    in.addData(("k3", "v3"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(topicCount() == 3, "committed epochs must not be re-written on restart")
  }
}
