package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Standing enforcement of the composed-graph pin rule: **any frame a
  * graph consumes more than once must be pinned** ([[Materialize.pin]] /
  * `persist`) before its first consumer runs.
  *
  * The rule existed as prose after the sf10 dress rehearsal found the
  * `losers` bug — a MinHash-LSH candidate pipeline consumed by BOTH a
  * gate's survivor join and its independent reject join, silently paying
  * the whole banded-LSH cost twice (123.5 s → 41.5 s once pinned,
  * SCALING.md). Prose doesn't stop the next example from reintroducing
  * it; this audit does, mechanically:
  *
  * [[audited]] wraps a driver-side block, records the OPTIMIZED logical
  * plan of every batch action the block executes (a session-scoped
  * [[QueryExecutionListener]]), and then reports every canonicalized
  * HEAVY subplan that executed in two or more distinct actions. A pinned
  * frame can never be reported: its consumers see a [[
  * org.apache.spark.sql.execution.LogicalRDD]] leaf; a `persist`ed frame
  * can never be reported below the cache boundary: the optimizer swaps
  * the cached segment for an `InMemoryRelation` leaf before this audit
  * sees the plan. What remains duplicated across actions is, by
  * construction, real recomputation.
  *
  * "Heavy" = the subtree contains a shuffle or a codec pass — Join,
  * Aggregate, Window, Sort, repartition, Generate (row-exploding
  * flatmaps: shingles, frame demux), MapPartitions (the codec seams) —
  * over at least one non-literal leaf. Narrow maps (Project/Filter over
  * a pinned leaf) are deliberately NOT flagged: re-running a codegen'd
  * projection is the cheap, idiomatic alternative to pinning, and the
  * examples lean on it (the `fp` fingerprint frame). Literal-only
  * subtrees (LocalRelation/Range) are skipped — recomputing a broadcast
  * panel built from a driver literal costs nothing at any scale.
  *
  * Streaming micro-batch executions are skipped (`plan.isStreaming`):
  * a streaming query re-executes one canonical plan per batch BY DESIGN;
  * the rule applies to the batch actions INSIDE `foreachBatch`, which
  * this audit does see (they run as ordinary batch QEs over per-batch
  * LogicalRDD leaves, so cross-batch matches cannot occur).
  *
  * Delivery is asynchronous (the listener bus), so the block is fenced
  * with FIFO sentinels: a recognizable `range(...)` action before and
  * after. Everything delivered between the two sentinels — and nothing
  * else — belongs to the block. Poll-to-deadline, never a quiet window
  * (the de-flaked unpin-audit lesson).
  */
object PinAudit {

  /** One twice-executed unpinned heavy subplan: the distinct action ids
    * that each re-ran it, the subtree (truncated treeString), and the
    * root plan of each involved action (to locate the callers). */
  final case class Violation(actionIds: Seq[Long], nodes: Int,
      plan: String, roots: Seq[String] = Nil)

  def audited[T](spark: SparkSession)(body: => T): (T, Seq[Violation]) = {
    val events =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, LogicalPlan)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        // analyzedPlan access is safe here; skip streaming micro-batches
        if (!qe.analyzed.isStreaming)
          events.add((qe.id, qe.optimizedPlan))
        ()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      fence(spark, events) // FIFO barrier: pre-block stragglers drain
      events.clear()
      val result = body
      val end = fence(spark, events) // everything before this is the block's
      val mine = events.asScala.toSeq.takeWhile(_._1 != end)
      (result, violations(mine))
    } finally spark.listenerManager.unregister(listener)
  }

  /** Assert-style wrapper: runs `body`, throws on any violation. */
  def auditedOrThrow[T](spark: SparkSession)(body: => T): T = {
    val (r, vs) = audited(spark)(body)
    if (vs.nonEmpty) throw new IllegalStateException(
      s"pin-discipline audit: ${vs.size} unpinned multi-consumer " +
        s"subplan(s) re-executed across actions:\n" +
        vs.map(v => s"- actions ${v.actionIds.mkString(",")} " +
          s"(${v.nodes} nodes):\n${v.plan}\n  consumers:\n" +
          v.roots.mkString("\n  ---\n")).mkString("\n"))
    r
  }

  /** Sentinel counter: each fence uses a unique Range length so its plan
    * is recognizable in the event stream. */
  private val fenceSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run a marker action and poll (to a deadline, not a quiet window)
    * until the bus delivered it; FIFO delivery then guarantees every
    * earlier action's event has arrived. Returns the marker's QE id. */
  private def fence(spark: SparkSession,
      events: java.util.Queue[(Long, LogicalPlan)]): Long = {
    val n = 1000000000L + fenceSeq.incrementAndGet()
    // collect, not count: the marker must SURVIVE optimization as a
    // Range leaf for the recognizer below
    spark.range(n, n + 1).collect()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline) {
      val hit = events.asScala.collectFirst {
        case (id, p) if p.collectFirst {
          case r: Range if r.start == n => r }.nonEmpty => id
      }
      if (hit.nonEmpty) return hit.get
      Thread.sleep(20)
    }
    throw new IllegalStateException(
      "pin-audit fence not delivered within 60s — listener bus stalled?")
  }

  private def isHeavy(p: LogicalPlan): Boolean = p match {
    case _: Join | _: Aggregate | _: Window | _: Sort | _: Generate |
        _: MapPartitions | _: Deduplicate | _: RepartitionOperation => true
    case _ => false
  }

  /** Literal-only subtrees cost nothing to recompute at any scale. */
  private def literalOnly(p: LogicalPlan): Boolean =
    p.collectLeaves().forall {
      case _: LocalRelation | _: OneRowRelation | _: Range => true
      case _ => false
    }

  private def violations(
      actions: Seq[(Long, LogicalPlan)]): Seq[Violation] = {
    // canonical heavy subtree -> (distinct action ids, an ORIGINAL
    // representative — real column names, so the report is actionable)
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[LogicalPlan, (scala.collection.mutable.LinkedHashSet[Long],
        LogicalPlan)]
    for ((id, plan) <- actions) {
      // within ONE action a subtree may appear twice (self-joins) —
      // Spark's ReuseExchange dedupes those at the physical layer, so
      // only CROSS-action repetition is recomputation: dedupe per action
      val perAction = scala.collection.mutable.LinkedHashMap
        .empty[LogicalPlan, LogicalPlan]
      plan.foreach { s =>
        if (isHeavy(s) && !literalOnly(s)) {
          perAction.getOrElseUpdate(s.canonicalized, s); ()
        }
      }
      perAction.foreach { case (c, orig) =>
        val e = seen.getOrElseUpdate(c,
          (scala.collection.mutable.LinkedHashSet.empty[Long], orig))
        e._1 += id
        ()
      }
    }
    val flagged = seen.toSeq.collect {
      case (canon, (ids, orig)) if ids.size >= 2 => (ids, canon, orig)
    }.sortBy { case (_, _, p) => -p.collect { case _ => 1 }.sum }
    // report only MAXIMAL duplicated subtrees: a flagged subtree nested
    // inside an already-reported one (same action set) is the same bug
    val kept = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.LinkedHashSet[Long], LogicalPlan)]
    for ((ids, canon, orig) <- flagged) {
      val nested = kept.exists { case (kIds, kp) =>
        ids.subsetOf(kIds) &&
          kp.collectFirst { case d if d.canonicalized == canon => d }.nonEmpty
      }
      if (!nested) { kept += ((ids, orig)); () }
    }
    val rootOf = actions.toMap
    kept.toSeq.map { case (ids, p) =>
      Violation(ids.toSeq.sorted, p.collect { case _ => 1 }.sum,
        p.treeString.linesIterator.take(25).mkString("\n"),
        ids.toSeq.sorted.flatMap(id => rootOf.get(id).map(r =>
          r.treeString.linesIterator.take(12).mkString("\n"))))
    }
  }
}
