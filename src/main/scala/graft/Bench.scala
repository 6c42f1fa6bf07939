package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Drop every persisted RDD — the localCheckpoint blocks left behind by
    * `Materialize.pin` inside the iterative operators. Each bench query is
    * self-contained (constructed, counted, discarded), so after its count
    * returns nothing references those blocks again — but the block manager
    * holds them until the ContextCleaner happens to GC them, and across a
    * 60+-query run (plus the full warmup pass) that accumulation becomes
    * storage-eviction/GC pressure that lands on whichever query runs LATER
    * — the measured-noise mode where a cheap query intermittently reads
    * 10× its fresh-JVM time. Freeing deterministically between queries
    * keeps each measurement independent of position in the run order. */
  private[graft] def dropPins(spark: SparkSession): Unit =
    // blocking=true: async eviction would overlap the NEXT timed query,
    // re-introducing exactly the cross-query interference this exists to
    // remove. The wait lands outside every timing window (between queries).
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one full pass over every query, so JVM JIT and
    // whole-stage-codegen compilation (Spark's generated-class cache is
    // keyed by source text) don't land on whichever query happens to run
    // first. NO results carry over — nothing is persisted across
    // invocations and each call rebuilds its plan and checkpoints — so the
    // timed pass re-executes all real work at steady state.
    graft.sources.Tables.all.foreach { t =>
      try graft.sources.Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (q, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $q failed: ${e.getMessage}") }
      dropPins(spark)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      // a failed query reports -1, not a plausible-looking wall time
      val r = name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      dropPins(spark)
      r
    }
    // Round-5 driver lesson: the driver captures only the LAST ~2000 bytes
    // of stdout; at 71 queries the full-precision metric line was 2161 bytes
    // and the head was truncated mid-JSON → `parsed: null`. The stdout line
    // therefore rounds per-query seconds to 3 decimals (ms precision; ~450
    // bytes saved → 1.7 KB at 71 queries, ~14 queries of headroom) while
    // target/bench.json keeps full precision for repo-local analysis.
    val failed = results.count(_._2 < 0)
    // a failed query reports -1; the headline total must not look BETTER
    // for having failed (summing -1s understates, dropping them silently
    // shrinks the workload) — any failure poisons the total to -1 and the
    // failure count is explicit, with per-query entries showing which
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    // Locale.ROOT: a de_DE/fr_FR default locale renders "12,345" and the
    // metric line stops being JSON — the exact blindness this formatter
    // exists to prevent. Trailing zeros are stripped ("0.50" → "0.5"):
    // at 88 queries that's ~80 bytes of window back for free.
    def fmt(v: Double, dec: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dec}f",
        java.lang.Double.valueOf(v))
      if (!s.contains('.')) s
      else {
        val t = s.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      }
    }
    // `keep` bounds how many per-query entries ride the stdout line; the
    // CHEAPEST queries are summarized first (their per-round deltas are
    // noise-band anyway — the expensive movers are what the bench gate
    // compares), failures are always listed, and the full-precision map
    // always lands in target/bench.json.
    def line(dec: Int, keep: Int): String = {
      val (bad, good) = results.partition(_._2 < 0)
      val byCost = good.sortBy { case (_, v) => -v }
      val kept = (bad ++ byCost.take(keep)).sortBy(_._1)
      val omitted = byCost.drop(keep)
      val qs = kept.map { case (k, v) => "\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
      val omit = if (omitted.isEmpty) "" else
        s""","omitted":${omitted.size},"omitted_total":${fmt(omitted.map(_._2).sum, dec)}"""
      s"""{"metric":"total","value":${fmt(total, dec)},"unit":"sec","failed":$failed$omit,"queries":$qs,"sf":"$sfDir"}"""
    }
    // The driver keeps the LAST ~2000 bytes of stdout and parses the
    // metric line out of that tail (measured: a 2161-byte line truncated
    // → parsed:null in round 5; a 1826-byte line parsed in round 6). Fit
    // under 1940 by degrading precision 3 → 2 decimals, then by
    // summarizing the cheapest queries — never by emitting a line that
    // can truncate mid-JSON.
    val n = results.size
    val attempts = Seq((3, n), (2, n)) ++
      Iterator.iterate(n - 8)(_ - 8).takeWhile(_ > 0).map(k => (2, k)).toSeq
    val metric = attempts.map { case (d, k) => line(d, k) }
      .find(_.length <= 1940).getOrElse(line(2, 8))
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val metricFull =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qsFull,"sf":"$sfDir"}"""
    // Round-1 driver lesson: the metric line arrived as `[info] {...}` via
    // sbt's logger and parsed to null. Persist to a file AND print last
    // (build.sbt routes forked run output straight to stdout, unprefixed).
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), metricFull)
    spark.stop()
    System.out.println(metric)
    System.out.flush()
  }
}
