package graft

import scala.collection.mutable
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.cdc.stream.CdcFeedRegistry

object CdcStreamSpec {
  /** Versions seen by the foreachBatch sink (static: executors/driver share
    * the JVM in local mode). */
  val delivered: scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty
}

/** The DSv2 micro-batch CDC source end-to-end: version offsets advance per
  * trigger, each change is delivered exactly once, restarts resume from the
  * checkpointed version. */
class CdcStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("sys_change_version", LongType),
    StructField("sys_change_operation", StringType),
    StructField("o_orderkey", LongType),
    StructField("o_totalprice", DoubleType)))

  /** Mutable in-memory feed standing in for CHANGETABLE. */
  final class MemFeed extends CdcFeedRegistry.VersionedFeed {
    val log = mutable.ArrayBuffer.empty[Row]
    @volatile var version = 0L
    def add(op: String, key: Long, price: java.lang.Double): Unit =
      synchronized {
        version += 1
        log += Row(version, op, key, price)
      }
    override def schema: StructType = CdcStreamSpec.this.schema
    override def currentVersion(): Long = version
    override def rows(from: Long, to: Long): Iterator[Row] =
      log.iterator.filter { r =>
        val v = r.getLong(0); v > from && v <= to
      }
  }

  test("graft-cdc stream delivers each change exactly once, in version order") {
    val feed = new MemFeed
    feed.add("I", 1L, 10.0)
    feed.add("I", 2L, 20.0)
    CdcFeedRegistry.register("t1", feed)
    val q = spark.readStream.format("graft-cdc").option("feed", "t1").load()
      .writeStream.format("memory").queryName("cdc_out").start()
    try {
      q.processAllAvailable()
      feed.add("U", 1L, 11.0)
      feed.add("D", 2L, null)
      q.processAllAvailable()
      val rows = spark.table("cdc_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1)
      assert(rows.toSeq == Seq((1L, "I", 1L), (2L, "I", 2L),
        (3L, "U", 1L), (4L, "D", 2L)))
    } finally q.stop()
  }

  test("restart resumes from the checkpointed version (no replay, no gap)") {
    val feed = new MemFeed
    feed.add("I", 1L, 1.0)
    CdcFeedRegistry.register("t2", feed)
    val ckpt = tmpDir("cdc_ckpt")
    val delivered = CdcStreamSpec.delivered
    delivered.clear()
    def start() = spark.readStream.format("graft-cdc").option("feed", "t2")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = batch.collect().map(_.getLong(0))
        CdcStreamSpec.delivered.synchronized {
          CdcStreamSpec.delivered ++= vs
        }
        ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(delivered.synchronized(delivered.toSeq) == Seq(1L))
    // changes land while the stream is down
    feed.add("U", 1L, 2.0)
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly-once across restart: version 1 not replayed, version 2 not lost
      assert(delivered.synchronized(delivered.toSeq.sorted) == Seq(1L, 2L))
    } finally q2.stop()
  }

  test("streaming CDC → canonical messages → compacted store state") {
    val feed = new MemFeed
    feed.add("I", 1L, 10.0)
    feed.add("I", 2L, 20.0)
    CdcFeedRegistry.register("t4", feed)
    val source = SourceDef("graft", "dbo", "orders", Seq("o_orderkey"))
    val store = new graft.store.LocalStore(spark, tmpDir("cdcmsg"))
    val q = graft.cdc.ChangeTracking.changeStream(spark, "t4", source)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the documented safe recipe: newest version per key, then append
        import org.apache.spark.sql.functions.{col, max_by}
        store.send(batch.groupBy("topic", "key")
          .agg(max_by(col("value"), col("sys_change_version")).as("value")))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      feed.add("U", 1L, 11.0)
      feed.add("D", 2L, null)
      q.processAllAvailable()
      val state = store.topicState(Seq(source.topic)).collect()
        .map(r => r.getString(1) -> r.getString(2)).toMap
      // key 2 tombstoned away; key 1 carries the updated value
      assert(state.keySet == Set("""{"o_orderkey":1}"""))
      assert(state.values.head.contains("11.0"))
    } finally q.stop()
  }

  test("fromVersion option starts past already-synced history") {
    val feed = new MemFeed
    feed.add("I", 1L, 1.0)
    feed.add("I", 2L, 2.0)
    feed.add("I", 3L, 3.0)
    CdcFeedRegistry.register("t3", feed)
    val q = spark.readStream.format("graft-cdc")
      .option("feed", "t3").option("fromVersion", "2").load()
      .writeStream.format("memory").queryName("cdc_from").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdc_from").collect().map(_.getLong(0)).toSeq == Seq(3L))
    } finally q.stop()
  }
}
