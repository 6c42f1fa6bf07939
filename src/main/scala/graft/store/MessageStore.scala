package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Msg

/** Topic-store abstraction (SURVEY.md §7.1 module io.kafka).
  *
  * The production impl is Kafka via Spark's built-in source/sink
  * (`read/write.format("kafka")` — see KafkaStore below); tests and the
  * offline environment use LocalStore, which emulates Kafka's log semantics
  * on parquet (mirrors how the reference's tests inject fake send-fns
  * instead of a producer, ref /root/reference/test/jdbc/melt_test.clj:20-30).
  */
trait MessageStore {
  /** Append a message frame `(topic, key, value)`; returns records sent
    * (ref melt.clj:445-465 per-source load counts). */
  def send(messages: DataFrame): Long
  /** Full log for the topics: `(topic, key, value, partition, offset)`,
    * earliest→latest captured at read time (ref melt.clj:256-299 bounded
    * consumption to pre-captured end offsets — Spark's batch Kafka source
    * has the same planning-time snapshot semantics). */
  def read(topics: Seq[String]): DataFrame
  /** Incremental read: records strictly after the given per-(topic,partition)
    * offsets (ref melt.clj:278-279,518-523 incremental refresh). */
  def readFrom(topics: Seq[String], after: Map[(String, Int), Long]): DataFrame
  def listTopics(): Seq[String]

  /** Latest record per (topic, key), tombstones dropped — the compacted
    * topic state (ref melt.clj:307-323 merge-seq-entry / reduce-consumer-seq).
    *
    * Correct because a key is pinned to one partition (keyed producer), so
    * per-key order = offset order within that partition (SURVEY §7.4 #2).
    * One shuffle on (topic,key); map-side partial max_by keeps the shuffle
    * small at 100 TB — only one candidate row per key per input partition
    * crosses the wire.
    */
  def topicState(topics: Seq[String]): DataFrame =
    MessageStore.compact(read(topics))
      .where(col(Msg.Value).isNotNull)
      .select(Msg.Topic, Msg.Key, Msg.Value)

  /** O12 read-then-catch-up (ref melt.clj:342-357 read-topics-loop, whose
    * `retries` arg is `catchUpPasses` here): a long read means its planned
    * end offsets are stale on a live topic — each extra incremental pass
    * catches what landed during the previous one. Every pass is MATERIALIZED
    * (eager, via [[graft.Materialize.pin]]) before the next is planned;
    * otherwise all reads resolve their end offsets at the same action and
    * later passes can never see anything new. Each pass's cursor is captured
    * BEFORE its read, so the passes tile the log with (harmless) overlap —
    * the union compacts as one frame, duplicate offsets collapse in max_by.
    * Checkpoint rather than persist(): blocks are released by the
    * ContextCleaner once the frame is unreachable, so repeated polling
    * doesn't accumulate pinned caches. `catchUpPasses = 0` degrades to a
    * plain materialized read. */
  def topicStateLive(topics: Seq[String], catchUpPasses: Int = 1): DataFrame = {
    require(catchUpPasses >= 0, s"catchUpPasses must be >= 0: $catchUpPasses")
    var cursor: Map[(String, Int), Long] = Map.empty
    var log: DataFrame = null
    var pass = 0
    while (pass <= catchUpPasses) {
      // the last pass's successor cursor would be unused — skip the call
      // (it is a full scan on stores without an offsets API)
      val nextCursor =
        if (pass < catchUpPasses) endOffsets(topics) else cursor
      val batch =
        (if (pass == 0) read(topics) else readFrom(topics, cursor))
          .transform(graft.Materialize.pin)
      log = if (log == null) batch else log.unionAll(batch)
      cursor = nextCursor
      pass += 1
    }
    MessageStore.compact(log)
      .where(col(Msg.Value).isNotNull)
      .select(Msg.Topic, Msg.Key, Msg.Value)
  }

  /** Current end offset per (topic, partition) — the incremental-read cursor. */
  def endOffsets(topics: Seq[String]): Map[(String, Int), Long]
}

object MessageStore {
  /** Latest record per (topic, key) INCLUDING tombstones (value null) — the
    * mergeable compacted form: unioning two compacted frames (or a compacted
    * frame with a raw increment) and re-compacting is associative because
    * the max offset per key is retained. */
  def compact(log: DataFrame): DataFrame =
    log.groupBy(Msg.Topic, Msg.Key)
      .agg(max_by(col(Msg.Value), col(Msg.Offset)).as(Msg.Value),
        max(col(Msg.Offset)).as(Msg.Offset))

  /** Spark-Kafka `startingOffsets` JSON for "strictly after the cursor":
    * next offset for cursor partitions, earliest (-2) for partitions the
    * cursor hasn't observed. Spark REQUIRES every partition of every
    * subscribed topic to appear — hence the full partition map. */
  def startingOffsetsJson(topics: Seq[String],
      after: Map[(String, Int), Long],
      partitionsOf: Map[String, Seq[Int]]): String = {
    val byTopic = topics.map { t =>
      // declared partitions ∪ cursor partitions: a partition added to the
      // topic after partitionsOf was captured must not be dropped (the
      // cursor knows it), and a stale cursor must not shrink the map
      val parts = (partitionsOf.getOrElse(t, Seq.empty) ++
        after.keys.collect { case (`t`, p) => p }).distinct.sorted
      val entries = parts.map { p =>
        s""""$p":${after.get((t, p)).map(_ + 1).getOrElse(-2L)}"""
      }
      s""""$t":{${entries.mkString(",")}}"""
    }
    s"{${byTopic.mkString(",")}}"
  }

  /** Records strictly after the per-(topic,partition) cursor, by filtering
    * a full log frame — the store-agnostic incremental-read fallback. */
  def filterAfter(log: DataFrame,
      after: Map[(String, Int), Long]): DataFrame =
    if (after.isEmpty) log
    else {
      val cutoff = after.foldLeft(lit(-1L)) { case (acc, ((t, p), o)) =>
        when(col(Msg.Topic) === t && col(Msg.Partition) === p, lit(o))
          .otherwise(acc)
      }
      log.where(col(Msg.Offset) > cutoff)
    }
}

/** Kafka-log-on-parquet: append-only files carrying explicit (partition,
  * offset) assigned exactly like a keyed Kafka producer would — partition =
  * hash(key) % numPartitions (null keys hash the value), offset dense and
  * monotone per partition. Gives tests real compaction/tombstone/incremental
  * semantics with zero external systems. */
final class LocalStore(spark: SparkSession, dir: String,
    numPartitions: Int = 8) extends MessageStore {

  private val path = s"$dir/log.parquet"

  private def exists: Boolean =
    new java.io.File(path).exists && new java.io.File(path).list() != null &&
      new java.io.File(path).list().exists(_.endsWith(".parquet"))

  private def fullLog(): DataFrame =
    spark.read.parquet(path)

  override def send(messages: DataFrame): Long = {
    val hashSrc = coalesce(col(Msg.Key), col(Msg.Value), lit(""))
    val withPart = messages.withColumn(
      Msg.Partition, pmod(xxhash64(hashSrc), lit(numPartitions)).cast("int"))
    val bases: Map[Int, Long] =
      if (exists)
        fullLog().groupBy(Msg.Partition).agg(max(Msg.Offset).as("m"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      else Map.empty
    val baseCol = bases.foldLeft(lit(-1L)) { case (acc, (p, m)) =>
      when(col(Msg.Partition) === p, lit(m)).otherwise(acc)
    }
    val w = Window.partitionBy(Msg.Partition)
      .orderBy(monotonically_increasing_id())
    // pin the batch before counting AND writing: monotonically_increasing_id
    // is non-deterministic across recomputation, and counting the batch
    // directly avoids re-scanning the whole log after the append
    val withOff = withPart
      .withColumn(Msg.Offset, row_number().over(w).cast("long") + baseCol)
      .select(Msg.Topic, Msg.Key, Msg.Value, Msg.Partition, Msg.Offset)
      .persist()
    try {
      val n = withOff.count()
      withOff.write.mode("append").parquet(path)
      n
    } finally { withOff.unpersist(); () }
  }

  /** Empty store = empty topic (matches Kafka semantics — a first
    * sync/verify against a fresh store must see an empty log, not throw). */
  override def read(topics: Seq[String]): DataFrame =
    if (!exists) emptyLog()
    else fullLog().where(col(Msg.Topic).isin(topics: _*))

  private def emptyLog(): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(Msg.Topic, StringType), StructField(Msg.Key, StringType),
        StructField(Msg.Value, StringType), StructField(Msg.Partition, IntegerType),
        StructField(Msg.Offset, LongType))))
  }

  override def readFrom(topics: Seq[String],
      after: Map[(String, Int), Long]): DataFrame =
    MessageStore.filterAfter(read(topics), after)

  override def listTopics(): Seq[String] =
    if (!exists) Seq.empty
    else fullLog().select(Msg.Topic).distinct().collect()
      .map(_.getString(0)).toSeq.sorted

  override def endOffsets(topics: Seq[String]): Map[(String, Int), Long] =
    if (!exists) Map.empty
    else read(topics).groupBy(Msg.Topic, Msg.Partition)
      .agg(max(Msg.Offset).as("m")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
}

/** Production Kafka store — the Spark-native sink/source contract the message
  * frame is shaped for (`df.write.format("kafka")` takes topic/key/value
  * columns directly; serdes O24 of the reference drop out entirely).
  * Unused in the offline test environment (no brokers), kept thin by design:
  * everything interesting (canonicalization, compaction, diff) happens on
  * DataFrames before/after this boundary. */
final class KafkaStore(spark: SparkSession, bootstrap: String,
    extraOpts: Map[String, String] = Map.empty,
    /** Full topic → partition-id map, if known. Overrides AdminClient
      * discovery; enables exact per-offset incremental reads in readFrom. */
    partitionsOf: Option[Map[String, Seq[Int]]] = None,
    /** Injected metadata provider (tests / custom clients). None → try the
      * reflective AdminClient, then fall back to offset-by-scan. */
    adminOverride: Option[KafkaAdmin] = None,
    /** Spark data-source format carrying the Kafka option contract.
      * Production default is Spark's own connector; tests substitute
      * `kafka-emu` (graft.store.kafkaemu) so THIS class's read/write
      * branches execute end-to-end in the broker-less environment. */
    format: String = "kafka") extends MessageStore {

  /** AdminClient-backed metadata when kafka-clients is on the classpath or a
    * provider is injected; None in the offline build → scan fallbacks. */
  @volatile private var adminCreated: Option[KafkaAdmin] = None
  private lazy val admin: Option[KafkaAdmin] = {
    val a = adminOverride.orElse(ReflectiveKafkaAdmin.load(bootstrap, extraOpts))
    adminCreated = a
    a
  }

  /** Release the AdminClient's network thread/sockets. Injected providers
    * are closed unconditionally — the store took ownership at
    * construction; a reflective client is closed only if metadata was
    * actually touched (closing would otherwise have to CREATE one). */
  def close(): Unit = adminOverride.orElse(adminCreated).foreach(_.close())

  private def partitionMap(topics: Seq[String]): Option[Map[String, Seq[Int]]] =
    partitionsOf.orElse(admin.map(_.partitionsOf(topics)))

  override def send(messages: DataFrame): Long = {
    val n = messages.persist().count()
    messages
      .selectExpr(s"${Msg.Topic}", s"CAST(${Msg.Key} AS BINARY) AS key",
        s"CAST(${Msg.Value} AS BINARY) AS value")
      .write.format(format)
      // a topic append is semantically Append; also required by the DSv2
      // write path (save()'s ErrorIfExists default is rejected there)
      .mode("append")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("kafka.acks", "all") // ref integration_test.clj:25 acks=all
      .options(extraOpts)
      .save()
    messages.unpersist()
    n
  }

  private def kafkaRead(topics: Seq[String], startingOffsets: String): DataFrame =
    spark.read.format(format)
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets) // ref melt.clj:249-254
      .option("endingOffsets", "latest")          // ref melt.clj:264-276
      .options(extraOpts)
      .load()
      .select(col("topic").as(Msg.Topic),
        col("key").cast("string").as(Msg.Key),
        col("value").cast("string").as(Msg.Value),
        col("partition").as(Msg.Partition),
        col("offset").as(Msg.Offset))

  override def read(topics: Seq[String]): DataFrame =
    kafkaRead(topics, "earliest")

  /** Incremental read past the cursor (ref melt.clj:278-279).
    *
    * Spark's Kafka source rejects a specific-offsets JSON that omits ANY
    * partition of a subscribed topic, and the cursor (derived from observed
    * records) cannot know about still-empty partitions — so the per-offset
    * fast path is only taken when `partitionsOf` declares the full partition
    * map (unknown partitions start at earliest = -2). Otherwise the read
    * starts at earliest and filters — correct on every partition at the
    * cost of a full scan. */
  override def readFrom(topics: Seq[String],
      after: Map[(String, Int), Long]): DataFrame =
    partitionMap(topics) match {
      // fast path requires EVERY subscribed topic declared — Spark rejects
      // a specific-offsets JSON with an empty/missing partition set
      case Some(parts) if after.nonEmpty && topics.forall(parts.contains) =>
        kafkaRead(topics,
          MessageStore.startingOffsetsJson(topics, after, parts))
      case _ =>
        MessageStore.filterAfter(read(topics), after)
    }

  override def listTopics(): Seq[String] =
    admin.map(_.listTopics()).getOrElse(throw new UnsupportedOperationException(
      "topic listing requires kafka-clients (AdminClient) on the classpath " +
        "or an injected KafkaAdmin; otherwise inject topics explicitly"))

  /** Record cursor per (topic, partition): last written offset, empty
    * partitions absent. With an AdminClient present this is one driver-side
    * metadata call reading ZERO records (Kafka reports next-offset-to-write;
    * converted here — an entry of 0 means an empty partition and is dropped,
    * not mapped to cursor −1, which Spark's offset JSON would read as
    * "latest"). Without it, the fallback derives offsets by scanning
    * records — a full topic read per call, correct but O(topic). */
  override def endOffsets(topics: Seq[String]): Map[(String, Int), Long] =
    admin match {
      case Some(a) =>
        a.endOffsets(topics).collect { case (tp, next) if next > 0 => tp -> (next - 1) }
      case None =>
        read(topics).groupBy(Msg.Topic, Msg.Partition)
          .agg(max(Msg.Offset).as("m")).collect()
          .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    }
}
