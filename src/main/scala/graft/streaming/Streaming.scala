package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Msg

/** Structured Streaming surface (SURVEY.md §7.1 module stream).
  *
  * O21 `background-consume` (ref /root/reference/src/jdbc/melt.clj:325-340):
  * the reference folds consumed records into an atom-held compacted map on a
  * daemon thread. Spark-first, that state is a streaming aggregation — the
  * state store is distributed, checkpointed, and sized by (topic,key)
  * cardinality, not driver memory (removes the reference's in-memory cap,
  * README.md:30-33).
  *
  * Scale notes: compaction state partitions by (topic, key) hash — the same
  * layout as the batch compaction shuffle, so at 1000 executors each holds
  * 1/1000th of the keys. Watermarking bounds the window-agg state; the
  * compacted-state query is deliberately unbounded (it IS the materialized
  * topic), which is the correct trade — its size is the key cardinality,
  * the thing the system exists to hold.
  */
object Streaming {

  /** Compacted topic state as a continuously-maintained streaming
    * aggregation: last-write-wins per (topic, key) ordered by (partition,
    * offset) — identical semantics to MessageStore.topicState, but
    * incremental. Emit in Update mode; tombstoned keys surface with a null
    * value so a downstream sink can delete them. */
  def compactedState(log: DataFrame): DataFrame =
    log.groupBy(Msg.Topic, Msg.Key)
      .agg(max_by(col(Msg.Value), col(Msg.Offset)).as(Msg.Value))

  /** Typed last-write-wins via mapGroupsWithState — the explicit-state
    * variant (ref melt.clj:307-323 merge-seq-entry fold, incl. tombstone
    * removal). Used where per-key custom logic (TTL, counters, conflation)
    * outgrows a declarative aggregate. */
  final case class KeyedRecord(topic: String, key: String,
      value: Option[String], offset: Long)
  final case class KeyState(value: Option[String], offset: Long)

  def compactedStateTyped(spark: SparkSession, log: DataFrame): DataFrame = {
    import spark.implicits._
    log.select(col(Msg.Topic), col(Msg.Key), col(Msg.Value), col(Msg.Offset))
      .as[(String, String, Option[String], Long)]
      .map(r => KeyedRecord(r._1, r._2, r._3, r._4))
      .groupByKey(r => (r.topic, r.key))
      .mapGroupsWithState[KeyState, (String, String, Option[String])](
        GroupStateTimeout.NoTimeout) {
        case ((topic, key), records, state: GroupState[KeyState]) =>
          val prev = state.getOption.getOrElse(KeyState(None, Long.MinValue))
          // newest offset wins; a null value is a tombstone but must still
          // advance the offset (ref melt.clj:316-321)
          val newest = records.foldLeft(prev) { (acc, r) =>
            if (r.offset > acc.offset) KeyState(r.value, r.offset) else acc
          }
          state.update(newest)
          (topic, key, newest.value)
      }
      .toDF(Msg.Topic, Msg.Key, Msg.Value)
  }

  /** Streaming exact dedup — dd01's fingerprint filter as a continuous
    * operator over a document stream: normalize → fingerprint → keep the
    * FIRST arrival per fingerprint, with dedup state EVICTED once the
    * watermark passes it (`dropDuplicatesWithinWatermark`: state is keyed
    * by fingerprint but TTL'd by event time, the standard trade that keeps
    * state bounded by the window's key cardinality instead of growing
    * forever on endless ingest). Use batch dd01 for the backfill; this
    * guards the live tail of the same pipeline with the same fingerprint
    * definition, so batch and streaming dedup agree on what "duplicate"
    * means. */
  def streamingDedup(docs: DataFrame, tsCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Event-time tumbling-window counts with late-data watermark — the
    * standard streaming-analytics shape the north star adds on top of the
    * reference (which orders by change version only, SURVEY §2.2). */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** One closed session: [start, end] with event count and value sum. */
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  /** Open-session accumulator (public: state-store codegen instantiates it). */
  final case class SessionState(start: Long, last: Long, cnt: Long,
      acc: Double)

  /** Streaming sessionization — the continuous form of the batch q21
    * gaps-and-islands query: per-user sessions close when `gap` passes
    * with no activity. State is one SessionState per OPEN session per
    * user (bounded by active-user cardinality, partitioned by user hash);
    * closed sessions are emitted in Append mode, either immediately when
    * a later event reveals an in-stream gap, or via EventTimeTimeout when
    * the watermark passes `last + gap` (so an idle user's final session
    * still closes without another event arriving). This is the
    * flatMapGroupsWithState shape: a session is not expressible as a
    * declarative aggregate because the emit condition depends on the
    * distance between CONSECUTIVE events, not a fixed window. */
  def streamingSessionize(spark: SparkSession, events: DataFrame,
      tsCol: String, gap: String, watermark: String)
      : org.apache.spark.sql.Dataset[Session] = {
    import spark.implicits._
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapMs.months == 0 && gapMs.days == 0,
      s"gap must be a sub-day duration: $gap")
    val gapMillis = gapMs.microseconds / 1000L
    events
      .select(col("user_id").cast("long"), col(tsCol).as("ts"),
        col("value").cast("double"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[SessionState]) =>
          def close(s: SessionState) = Session(uid,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.cnt, s.acc)
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: final close
            val s = state.get
            state.remove()
            Iterator.single(close(s))
          } else {
            // fold this batch's events (sorted by event time) into the open
            // session; any in-stream gap > `gap` closes the current session
            // immediately and starts the next
            val sorted = rows.map(r => (r._2.getTime, r._3)).toSeq.sortBy(_._1)
            var closed = List.empty[Session]
            var cur = state.getOption
            for ((t, v) <- sorted) cur match {
              case Some(s) if t - s.last <= gapMillis =>
                cur = Some(SessionState(s.start, math.max(s.last, t),
                  s.cnt + 1, s.acc + v))
              case Some(s) =>
                closed ::= close(s)
                cur = Some(SessionState(t, t, 1, v))
              case None =>
                cur = Some(SessionState(t, t, 1, v))
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  /** Start a continuous compaction query over a message stream into an
    * in-memory queryable table (the O21 "background consume with a handle
    * you can close": stop via the returned query).
    *
    * LOCAL/DEV SURFACE ONLY: Complete mode + the memory sink materialize the
    * whole compacted state in the driver — the faithful analogue of the
    * reference's atom-held map (melt.clj:325-340) including its capacity
    * cap. At scale, consume the Update-mode stream instead:
    * `compactedState(log)` (or `compactedStateTyped`) with `foreachBatch`
    * upserting into a keyed sink — state then lives in the distributed
    * state store, sized by key cardinality per executor. */
  def backgroundConsume(spark: SparkSession, log: DataFrame,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    compactedState(log).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .start()

  /** The AT-SCALE O21 recipe backgroundConsume's doc promises: Update-mode
    * compaction with a `foreachBatch` upsert into a caller-provided keyed
    * sink, checkpointed and restartable. Each micro-batch delivers only the
    * keys whose compacted value CHANGED (tombstones as null values — delete
    * them downstream); the last-write-wins state lives in Spark's
    * distributed, checkpointed state store, sized by key cardinality per
    * executor — not in driver memory. Delivery contract on restart with the
    * same checkpointDir: the STATE is exactly-once (recovered aggregation
    * state keeps old offsets authoritative, so a late replay of an older
    * offset cannot regress a key — proved by the restart test in
    * StreamingSpec), but `foreachBatch` delivery to the sink is
    * AT-LEAST-ONCE — a crash between `upsert(batch)` and the checkpoint
    * commit re-delivers that batch's keys. The caller's upsert must be
    * idempotent per key (a keyed upsert naturally is; a non-idempotent sink
    * should dedup on the foreachBatch batchId). */
  def compactedConsume(log: DataFrame, checkpointDir: String,
      queryName: String)(
      upsert: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    compactedState(log).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) => upsert(batch) }
      .start()
}
