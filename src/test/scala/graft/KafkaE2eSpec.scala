package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.functions._
import graft.ops.Mirror
import graft.sources.Jdbc
import graft.store.KafkaStore
import graft.store.kafkaemu.{EmuBroker, EmuKafkaAdmin}

/** The reference's broker-backed integration arc (ref
  * integration/jdbc/melt/integration_test.clj:60-122: load → golden
  * read-back → empty diff → mutate → sync sends exactly 1 upsert + 1
  * tombstone → verify converges), executed through the REAL
  * [[graft.store.KafkaStore]] — its `.format(...)` read AND write branches,
  * offset-JSON incremental path, and admin-backed metadata — against the
  * in-JVM `kafka-emu` broker stand-in (no Kafka bytes exist in this
  * environment; see EmuBroker's scaladoc). Live Derby is the source DB,
  * exactly like MirrorSpec's LocalStore twin. */
class KafkaE2eSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:kafkae2edb;create=true"
  private val props = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }
  private val bootstrap = "emu://e2e:9092"

  private lazy val conn = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE accounts (id INT NOT NULL, name VARCHAR(64), " +
      "bal DOUBLE, PRIMARY KEY (id))")
    st.execute("INSERT INTO accounts VALUES (1, 'ada', 10.0), " +
      "(2, 'bob', 20.0), (3, 'eve', 30.0)")
    st.close()
    c
  }

  test("load → read-back → diff → sync → verify through KafkaStore on the emulated broker") {
    EmuBroker.reset(bootstrap)
    val store = new KafkaStore(spark, bootstrap,
      adminOverride = Some(new EmuKafkaAdmin(bootstrap)), format = "kafka-emu")

    // 1. plan + initial load via the real kafkaWrite branch
    val plan = Mirror.plan(spark, conn, url, props, tmpDir("ke2e-samples"),
      s"${tmpDir("ke2e")}/schema.txt")
    val acct = plan.tables.find(_.source.name.equalsIgnoreCase("accounts")).get
    val counts = Mirror.loadAll(spark, url, props, Seq(acct), store)
    assert(counts(acct.source.topic) == 3)
    val topic = acct.source.topic

    // 2. golden read-back through the kafka-emu batch scan: compacted state
    //    has one message per row, canonical values carry the row fields
    val state0 = store.topicState(Seq(topic))
    assert(state0.count() == 3)
    assert(state0.where(col("value").contains("ada")).count() == 1)

    // 3. admin-backed metadata: topic listed; zero-record end offsets
    //    account for every record sent
    assert(store.listTopics().contains(topic))
    val cursor0 = store.endOffsets(Seq(topic))
    assert(cursor0.values.map(_ + 1).sum == 3) // dense offsets from 0
    assert(cursor0.keys.forall(_._1 == topic))

    // 4. empty diff: verify matches without repairing
    def rows = Jdbc.readSource(spark, url, props, acct.source)
    val v0 = Mirror.verifySync(rows, acct.source, store)
    assert(v0.matches && !v0.synced)

    // 5. mutate + delete → sync repairs with exactly 1 upsert + 1 tombstone
    val st = conn.createStatement()
    st.execute("UPDATE accounts SET bal = 99.0 WHERE id = 1")
    st.execute("DELETE FROM accounts WHERE id = 3")
    st.close()
    val v1 = Mirror.verifySync(rows, acct.source, store)
    assert(v1.matches && v1.synced && v1.syncCount == 2)

    // 6. incremental read past the pre-sync cursor takes the
    //    specific-offsets JSON fast path (admin declares every partition)
    //    and sees exactly the 2 repair records
    val delta = store.readFrom(Seq(topic), cursor0)
    assert(delta.count() == 2)
    assert(delta.where(col("value").isNull).count() == 1) // the tombstone

    // 7. compacted state reflects the repair; key → partition pinning held
    //    (per-key max-offset compaction is only sound if a key never moves)
    val state1 = store.topicState(Seq(topic))
    assert(state1.count() == 2)
    assert(state1.where(col("value").contains("99.0")).count() == 1)
    val keyParts = store.read(Seq(topic))
      .groupBy("key").agg(countDistinct("partition").as("nparts"))
    assert(keyParts.where(col("nparts") > 1).count() == 0)

    // 8. live read with a catch-up pass composes over the same store
    val live = store.topicStateLive(Seq(topic), catchUpPasses = 1)
    assert(live.count() == 2)
    store.close()
  }

  test("kafka-emu honors the connector's offsets-JSON contract") {
    val bs = "emu://contract:9092"
    EmuBroker.reset(bs)
    EmuBroker.cluster(bs).create("t", 2)
    // keys chosen to land on both partitions under murmur2
    val msgs = (0 until 8).map(i => ("t", s"k$i", s"v$i"))
    import spark.implicits._
    msgs.toDF("topic", "key", "value")
      .selectExpr("topic", "CAST(key AS BINARY) AS key",
        "CAST(value AS BINARY) AS value")
      .write.format("kafka-emu").mode("append")
      .option("kafka.bootstrap.servers", bs).save()

    def read(start: String) = spark.read.format("kafka-emu")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", "t")
      .option("startingOffsets", start)
      .option("endingOffsets", "latest").load()

    assert(read("earliest").count() == 8)
    assert(read("latest").count() == 0)
    // read schema matches the kafka source column-for-column
    assert(read("earliest").schema.fieldNames.toSeq == Seq("key", "value",
      "topic", "partition", "offset", "timestamp", "timestampType"))

    // per-partition JSON with sentinels: -2 earliest on p0, skip 1 on p1
    val ends = new EmuKafkaAdmin(bs).endOffsets(Seq("t"))
    val n1 = ends(("t", 1))
    val skipped = read("""{"t":{"0":-2,"1":1}}""").count()
    assert(skipped == 8 - math.min(1, n1))

    // omitting a partition must throw, exactly like the real source —
    // KafkaStore.readFrom's fast-path gating depends on this strictness
    val e = intercept[IllegalArgumentException](read("""{"t":{"0":0}}""").count())
    assert(e.getMessage.contains("omits partition"))

    // reading a topic that does not exist auto-creates it empty
    assert(spark.read.format("kafka-emu")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", "fresh").load().count() == 0)
  }

  test("kafka.* options pass through KafkaStore to the format verbatim") {
    // The divergence ledger's residual risk cap (KafkaEmuProvider
    // scaladoc): the emu can't exercise auth/tuning options, so pin the
    // only thing the engine is responsible for — that whatever the caller
    // hands KafkaStore reaches the chosen format UNTOUCHED, reads and
    // writes both. A swallowed kafka.ssl.* option in this layer would
    // surface as an unreproducible production auth failure.
    import org.apache.spark.sql.functions.lit
    val bs = "emu://passthrough:9092"
    EmuBroker.reset(bs)
    val extra = Map(
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.sasl.mechanism" -> "SCRAM-SHA-512",
      "kafka.max.request.size" -> "5242880")
    val store = new KafkaStore(spark, bs, extraOpts = extra,
      adminOverride = Some(new EmuKafkaAdmin(bs)), format = "kafka-emu")
    import spark.implicits._
    store.send(Seq(("ptop", "k1", "v1")).toDF("topic", "key", "value"))
    store.read(Seq("ptop")).count()
    val c = EmuBroker.cluster(bs)
    for ((k, v) <- extra) {
      assert(c.lastWriteOptions.get(k.toLowerCase).contains(v),
        s"write dropped/rewrote $k: ${c.lastWriteOptions}")
      assert(c.lastReadOptions.get(k.toLowerCase).contains(v),
        s"read dropped/rewrote $k: ${c.lastReadOptions}")
    }
    // the store's own contract options ride along, not instead
    assert(c.lastWriteOptions.get("kafka.acks").contains("all"))
    assert(c.lastReadOptions.get("startingoffsets").contains("earliest"))
    assert(c.lastReadOptions.get("kafka.bootstrap.servers").contains(bs))
  }

  test("murmur2 matches published reference vectors (key pinning is real-Kafka compatible)") {
    // MurmurHash2 test vectors computed from the public algorithm: the
    // same values Kafka's partitioner produces for these keys. Pinning a
    // key to murmur2(bytes) % n means an emu-written topic re-read by a
    // real consumer preserves per-key partition locality.
    def m2(s: String): Int = EmuBroker.murmur2(s.getBytes("UTF-8"))
    // raw hash values (exercise empty/1..3-byte tails and the 4-byte loop)
    assert(m2("") == 275646681)
    assert(m2("a") == -1563381124)
    assert(m2("ab") == 316155434)
    assert(m2("abc") == 479470107)
    assert(m2("123456789") == -1822237082)
    assert(m2("21") == -973932308)
    // the partitioner form (murmur2 & 0x7fffffff) % 1000, as a consumer
    // of a 1000-partition topic would observe it
    def part(s: String): Int = (m2(s) & 0x7fffffff) % 1000
    assert(part("") == 681 && part("a") == 524 && part("ab") == 434 &&
      part("abc") == 107 && part("123456789") == 566)
  }
}
