package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Msg, SourceDef}
import graft.canonical.Canonical
import graft.store.MessageStore

/** Snapshot load (ref /root/reference/src/jdbc/melt.clj:445-476
  * load-with-producer / do-load): scan → message → xform → sink.
  * The reference's channel+futures backpressure machinery (melt.clj:33-47)
  * drops out — executor parallelism and the sink's batching replace it. */
object Load {
  /** Load one source; returns records sent. */
  def load(rows: DataFrame, source: SourceDef, store: MessageStore): Long =
    store.send(Canonical.messages(rows, source))

  /** Load many sources (ref melt.clj:456-465 one job per source). */
  def loadAll(sources: Seq[(SourceDef, DataFrame)],
      store: MessageStore): Map[String, Long] =
    sources.map { case (s, df) => s.topic -> load(df, s, store) }.toMap
}

/** Diff between a source snapshot and compacted topic state (ref
  * melt.clj:418-429). Both sides are canonical-JSON message frames, so value
  * comparison is plain string equality — the fuzz/unfuzz JSON-round-trip
  * machinery of the reference (melt.clj:359-390) is unnecessary by
  * construction (SURVEY §2 O15).
  *
  * Scale shape: both inputs are keyed (unique (topic,key)), the join
  * shuffles each side once on the key; with AQE a small drifted side
  * broadcasts. The diff frame is lazily computed — sync and verify reuse it
  * without re-scanning when cached.
  */
object Diff {
  val Side = "side"

  /** Full-outer classify. Output: (topic, key, table_value, topic_value,
    * side ∈ match | differs | table-only | topic-only). */
  def diff(source: DataFrame, topicState: DataFrame): DataFrame = {
    val s = source.select(col(Msg.Topic), col(Msg.Key),
      col(Msg.Value).as("table_value"))
    val t = topicState.select(col(Msg.Topic), col(Msg.Key),
      col(Msg.Value).as("topic_value"))
    s.join(t, Seq(Msg.Topic, Msg.Key), "full_outer")
      .withColumn(Side,
        when(col("topic_value").isNull && col("table_value").isNotNull, "table-only")
          .when(col("table_value").isNull && col("topic_value").isNotNull, "topic-only")
          .when(col("table_value") === col("topic_value"), "match")
          .otherwise("differs"))
  }

  /** Entries the table has but the topic lacks-or-differs — what sync must
    * (re)send (ref melt.clj:423-426 :table-only). */
  def tableOnly(d: DataFrame): DataFrame =
    d.where(col(Side) === "table-only" || col(Side) === "differs")
      .select(col(Msg.Topic), col(Msg.Key), col("table_value").as(Msg.Value))

  /** Keys present on the topic but absent from the table — to tombstone
    * (ref melt.clj:484-487 `deleted`: topic-only minus table-only keys;
    * equivalently an anti-join of topic state vs table keys). */
  def deleted(d: DataFrame): DataFrame =
    d.where(col(Side) === "topic-only")
      .select(col(Msg.Topic), col(Msg.Key),
        lit(null).cast("string").as(Msg.Value))

  def isEmpty(d: DataFrame): Boolean =
    d.where(col(Side) =!= "match").isEmpty
}

/** Delta sync (ref melt.clj:478-509 sync-with-sender / send-tombstones /
  * sync-kafka): upserts for drifted keys + null-value tombstones for
  * deleted keys, in one sink write. */
object Sync {
  /** Returns records sent (upserts + tombstones). */
  def syncFromDiff(d: DataFrame, store: MessageStore): Long =
    store.send(Diff.tableOnly(d).unionAll(Diff.deleted(d)))

  def sync(rows: DataFrame, source: SourceDef, store: MessageStore): Long = {
    val src = Canonical.messages(rows, source)
    syncFromDiff(Diff.diff(src, store.topicState(Seq(source.topic))), store)
  }
}

/** Verify / monitor loops (ref melt.clj:518-571). Driver-side control flow
  * around Spark actions — the queries re-execute, Spark re-reads only what
  * changed (and the incremental topic read narrows to new offsets). */
object VerifyOps {
  final case class Result(matches: Boolean, attempts: Int,
      synced: Boolean, syncCount: Long)

  /** Incrementally-refreshed compacted topic state for retry loops (ref
    * melt.clj:518-523; SURVEY §7.4 #6): the first refresh reads the whole
    * log once and caches the compacted frame; each later refresh reads only
    * records past the cursor and merges them in — at scale a retry costs
    * |keys| + |delta|, not another full topic scan. */
  final class IncrementalTopicState(store: MessageStore, topics: Seq[String]) {
    private var cursor: Map[(String, Int), Long] = Map.empty
    private var state: Option[DataFrame] = None

    /** Re-read what's new and return the current compacted state
      * (tombstones included — filter for consumers who need live keys). */
    def refresh(): DataFrame = {
      val nextCursor = store.endOffsets(topics)
      val merged = state match {
        case None => MessageStore.compact(store.read(topics))
        case Some(prev) =>
          MessageStore.compact(prev.unionAll(store.readFrom(topics, cursor)
            .select(Msg.Topic, Msg.Key, Msg.Value, Msg.Offset)))
      }
      // materialize the merge BEFORE dropping the previous cache — merged
      // reads prev; unpersisting first would silently recompute the full
      // topic scan (and re-grow the lineage) on every refresh
      val cached = merged.persist()
      cached.count()
      state.foreach(_.unpersist())
      state = Some(cached)
      cursor = nextCursor
      cached
    }

    def current(): DataFrame = state.getOrElse(refresh())

    def close(): Unit = { state.foreach(_.unpersist()); state = None }

    /** Live (non-tombstoned) view in the (topic, key, value) contract. */
    def live(): DataFrame = current()
      .where(col(Msg.Value).isNotNull)
      .select(Msg.Topic, Msg.Key, Msg.Value)
  }

  /** Retry loop tolerating in-flight latency (ref melt.clj:518-546;
    * monitoring = verify with latency allowance, DESIGN.md:26-27). Topic
    * state refreshes incrementally across retries instead of re-scanning. */
  def verify(rows: => DataFrame, source: SourceDef, store: MessageStore,
      retries: Int = 0, delayMs: Long = 1000): (Boolean, Int) = {
    val topic = new IncrementalTopicState(store, Seq(source.topic))
    try {
      var attempts = 0
      var ok = false
      while (!ok && attempts <= retries) {
        if (attempts > 0) { Thread.sleep(delayMs); topic.refresh() }
        attempts += 1
        val src = Canonical.messages(rows, source)
        ok = Diff.isEmpty(Diff.diff(src, topic.live()))
      }
      (ok, attempts)
    } finally topic.close()
  }

  /** Verify; on failure sync once and verify once more (ref
    * melt.clj:548-571 verify-sync). */
  def verifySync(rows: => DataFrame, source: SourceDef, store: MessageStore,
      retries: Int = 0, delayMs: Long = 1000): Result = {
    val (ok, attempts) = verify(rows, source, store, retries, delayMs)
    if (ok) Result(matches = true, attempts, synced = false, 0)
    else {
      val n = Sync.sync(rows, source, store)
      val (ok2, _) = verify(rows, source, store, 0, 0)
      Result(ok2, attempts + 1, synced = true, n)
    }
  }
}
