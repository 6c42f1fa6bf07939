package graft

import org.apache.spark.sql.DataFrame

/** Central policy for pinning shared subplans (the LSH signature frames,
  * salted join inputs, per-round label frames, live-read snapshots):
  * materialize NOW and cut lineage so multiple consumers reuse computed
  * blocks instead of replicating the upstream pipeline (left pure-lazy, the
  * shingle/minhash pipeline replicates 4–8× across a plan — measured in
  * round 1).
  *
  * Default = eager `localCheckpoint`: blocks live on executors, are freed by
  * the ContextCleaner once the frame is unreachable (safe for repeated
  * polling), and are NOT recomputable after executor loss — the right trade
  * for bounded derived frames on stable nodes.
  *
  * `spark.graft.reliableCheckpoint=true` switches every pin site to
  * reliable checkpointing (written to the checkpoint dir on the cluster FS,
  * survives executor loss) — the spot-instance/preemptible deployment mode.
  * The checkpoint dir comes from `spark.graft.checkpointDir` unless
  * `SparkContext.setCheckpointDir` was already called. Cost per pin: one
  * write+read round trip to the FS instead of executor-memory blocks.
  */
object Materialize {
  /** Test observability: while ENABLED, every pin records (caller thread,
    * persisted RDD id). Pin runs synchronously on the operator's calling
    * thread, so a concurrently-running suite can audit ITS OWN pins'
    * release precisely — no cross-suite delta counting with allowance
    * guesses (PipelinesSpec's unpin-discipline test). OFF by default: a
    * long-lived production job (a streaming query pinning every
    * micro-batch, a nightly loop in one JVM) must not accumulate one log
    * tuple per pin forever — the audit log must not itself reintroduce
    * the linear growth the pin discipline exists to prevent. */
  private[graft] val pinLogEnabled =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private[graft] val pinLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val pinned =
      if (spark.conf.getOption("spark.graft.reliableCheckpoint").contains("true")) {
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.conf.getOption("spark.graft.checkpointDir") match {
            case Some(dir) => spark.sparkContext.setCheckpointDir(dir)
            case None => throw new IllegalStateException(
              "spark.graft.reliableCheckpoint=true needs a checkpoint dir: " +
                "set spark.graft.checkpointDir or SparkContext.setCheckpointDir")
          }
        df.checkpoint()
      } else df.localCheckpoint()
    // Drop the ancestor-derived statistics Dataset.checkpoint copies onto
    // the leaf: join estimates are PRODUCTS of child sizes, so in an
    // iterative loop (pin-per-round) the inherited sizeInBytes BigInt
    // doubles its bit-length every round and stats estimation itself
    // becomes a driver CPU sink (observed: minutes inside BigInteger
    // multiply past ~25 chained pins). A fresh leaf reports "unknown";
    // AQE re-plans joins from true runtime sizes, which for a pinned
    // bounded frame are also the more accurate ones.
    val out = org.apache.spark.sql.graft.Bridge.freshLeaf(pinned)
    if (pinLogEnabled.get())
      out.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          pinLog.add((Thread.currentThread().getId, lr.rdd.id))
        case _ => ()
      }
    out
  }

  /** Free the checkpoint blocks behind a pinned frame (and any pinned
    * leaves a lazy plan over pins references). Iterative operators pin one
    * frame per round; without explicit release, executor storage grows
    * LINEARLY with round count — superseded round state stays resident
    * until the context cleaner happens to GC the driver-side handle, which
    * at 100 TB means hours of peak storage pressure for state that died a
    * round ago. Caller contract: a pinned leaf CANNOT be recomputed (its
    * lineage was truncated at the pin), so unpin ONLY frames no live plan
    * will read again — i.e. after the pin that supersedes them has
    * materialized. No-op on plans with no pinned leaves. */
  def unpin(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        // reliable-checkpoint mode persists to FILES, not blocks — and
        // spark.cleaner.referenceTracking.cleanCheckpoints defaults to
        // false, so without this delete a spot-fleet run accumulates one
        // checkpoint directory per superseded round for the job's
        // lifetime (the exact linear growth unpin exists to prevent).
        // Best-effort: cleanup must never fail the job it serves — but only
        // for ordinary failures (NonFatal): a bare `catch Exception` would
        // also swallow InterruptedException and lose a cancellation.
        lr.rdd.getCheckpointFile.foreach { dir =>
          try {
            val p = new org.apache.hadoop.fs.Path(dir)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          } catch {
            case e: InterruptedException =>
              Thread.currentThread().interrupt(); ()
            case scala.util.control.NonFatal(_) => ()
          }
        }
      case _ => ()
    }
}
