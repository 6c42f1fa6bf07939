package graft.store.kafkaemu

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** In-JVM Kafka-broker stand-in backing the `kafka-emu` DataSource V2
  * format (see [[KafkaEmuProvider]]).
  *
  * WHY THIS EXISTS: this build environment carries zero Kafka bytes — no
  * broker, no kafka-clients, no spark-sql-kafka connector jar — so the
  * reference's broker-backed integration arc (ref
  * /root/reference/integration/jdbc/melt/integration_test.clj:60-122)
  * cannot execute against a real cluster here. This object reproduces the
  * broker-side semantics [[graft.store.KafkaStore]] depends on, so the
  * REAL KafkaStore code path (its `.format(...)` read/write branches,
  * offset-JSON construction, AdminClient metadata calls) executes
  * end-to-end in tests. On a real cluster none of this is loaded:
  * KafkaStore's default format is Spark's own `kafka` connector.
  *
  * Semantics mirrored from the public Kafka protocol contract:
  *  - topics are arrays of append-only partition logs; offsets are dense,
  *    monotone, assigned at append under the partition's lock;
  *  - producers route keyed records with murmur2(keyBytes) % numPartitions
  *    (Kafka's DefaultPartitioner), so a key is pinned to one partition —
  *    the invariant MessageStore.compact's per-key max-offset merge rests
  *    on; null keys round-robin (sticky-partitioner analogue, made
  *    deterministic);
  *  - reading a nonexistent topic auto-creates it empty
  *    (`auto.create.topics.enable` broker default);
  *  - end offset = next-offset-to-write (0 for an empty partition), the
  *    convention [[EmuKafkaAdmin.endOffsets]] exposes and KafkaStore
  *    converts at its boundary.
  *
  * Single-JVM by construction (a ConcurrentHashMap keyed by the fake
  * bootstrap string): valid exactly where Spark's driver and executors
  * share the JVM — `local[*]`, i.e. this test environment. The provider's
  * scaladoc states the boundary.
  */
object EmuBroker {

  /** One record as the broker stores it (producer-assigned timestamp). */
  final case class Rec(key: Array[Byte], value: Array[Byte], tsMs: Long)

  /** Append-only partition log; offset = index. */
  final class PartitionLog {
    private val recs = new java.util.ArrayList[Rec]
    def append(r: Rec): Long = synchronized { recs.add(r); recs.size - 1L }
    /** Records with offset in [from, until). */
    def slice(from: Long, until: Long): IndexedSeq[(Long, Rec)] =
      synchronized {
        val lo = math.max(from, 0L)
        val hi = math.min(until, recs.size.toLong)
        (lo until hi).map(o => o -> recs.get(o.toInt))
      }
    /** Next offset to be written (Kafka endOffsets convention). */
    def end: Long = synchronized { recs.size.toLong }
  }

  final class Cluster(val defaultPartitions: Int) {
    private[kafkaemu] val topics =
      new ConcurrentHashMap[String, Array[PartitionLog]]
    private val roundRobin = new AtomicInteger(0)

    /** Verbatim option maps seen by the most recent read plan and write
      * build against this cluster (keys lowercased by the DSv2 option
      * map). Contract-test hook: KafkaE2eSpec pins that every `kafka.*`
      * option handed to [[graft.store.KafkaStore]] reaches the chosen
      * format untouched — the passthrough a real deployment depends on
      * for auth/tuning options this sandbox can never exercise. */
    @volatile var lastReadOptions: Map[String, String] = Map.empty
    @volatile var lastWriteOptions: Map[String, String] = Map.empty

    /** Get-or-auto-create (broker default `auto.create.topics.enable`). */
    def topic(name: String): Array[PartitionLog] =
      topics.computeIfAbsent(name,
        _ => Array.fill(defaultPartitions)(new PartitionLog))

    /** Explicit admin-style creation with a partition count; no-op if the
      * topic exists (Kafka CreateTopics on an existing topic errors, but
      * test setup wants idempotence). */
    def create(name: String, partitions: Int): Unit = {
      topics.computeIfAbsent(name, _ => Array.fill(partitions)(new PartitionLog))
      ()
    }

    def exists(name: String): Boolean = topics.containsKey(name)

    def topicNames: Seq[String] = {
      import scala.jdk.CollectionConverters._
      topics.keySet().asScala.toSeq.sorted
    }

    /** Producer-side partition routing. */
    def partitionFor(key: Array[Byte], numPartitions: Int): Int =
      if (key == null) math.floorMod(roundRobin.getAndIncrement(), numPartitions)
      else (murmur2(key) & 0x7fffffff) % numPartitions

    def produce(topicName: String, key: Array[Byte], value: Array[Byte],
        tsMs: Long): (Int, Long) = {
      val parts = topic(topicName)
      val p = partitionFor(key, parts.length)
      p -> parts(p).append(Rec(key, value, tsMs))
    }
  }

  private val clusters = new ConcurrentHashMap[String, Cluster]

  /** The cluster behind a bootstrap string, auto-started on first touch. */
  def cluster(bootstrap: String, defaultPartitions: Int = 8): Cluster =
    clusters.computeIfAbsent(bootstrap, _ => new Cluster(defaultPartitions))

  /** Drop a cluster (test isolation between suites). */
  def reset(bootstrap: String): Unit = { clusters.remove(bootstrap); () }

  /** MurmurHash2 (Austin Appleby's public-domain 32-bit algorithm, the
    * function Kafka's DefaultPartitioner applies to key bytes). Implemented
    * from the published algorithm so emu partition routing matches a real
    * producer's byte-for-byte. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    val length = data.length
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val tail = length & ~3
    if ((length % 4) >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if ((length % 4) >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if ((length % 4) >= 1) { h ^= data(tail) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }
}

/** [[graft.store.KafkaAdmin]] over the emulated broker — the injected
  * metadata provider for [[graft.store.KafkaStore]] in tests. Mirrors the
  * AdminClient surface the reflective impl wraps: zero-record metadata
  * reads, missing topics omitted (not errors), endOffsets in Kafka's
  * next-offset-to-write convention. */
final class EmuKafkaAdmin(bootstrap: String) extends graft.store.KafkaAdmin {
  private def c = EmuBroker.cluster(bootstrap)

  override def listTopics(): Seq[String] = c.topicNames

  override def partitionsOf(topics: Seq[String]): Map[String, Seq[Int]] =
    topics.distinct.collect {
      case t if c.exists(t) => t -> c.topic(t).indices.toSeq
    }.toMap

  override def endOffsets(topics: Seq[String]): Map[(String, Int), Long] =
    topics.distinct.flatMap { t =>
      if (!c.exists(t)) Seq.empty
      else c.topic(t).zipWithIndex.map { case (log, p) => (t, p) -> log.end }
    }.toMap
}
