package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-query execution-shape profiler (optimization-round measurement
  * harness, guide §1): times each named query like [[Perf]] but also
  * accumulates, from a SparkListener, the counters that explain WHERE the
  * wall clock goes — jobs launched, stages run, tasks run, summed task
  * time, shuffle bytes written, and records read — so "7 s on 500 KB of
  * parquet" can be attributed to per-round job/stage overhead vs real
  * compute instead of guessed at.
  *
  * Usage: tools/run_direct.sh 8g graft.tools.StageProf <sfDir> [reps=N] <query>...
  * Output: one line per query:
  *   name  median_s  jobs  stages  tasks  task_time_s  shuffle_MB  rows_read
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val reps = rest.collectFirst { case s if s.startsWith("reps=") =>
      s.stripPrefix("reps=").toInt }.getOrElse(1)
    val names = rest.filterNot(_.startsWith("reps="))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // listener counters — reset per query; tasks/stages of a query never
    // overlap the next because each timed run is driven synchronously
    object L extends SparkListener {
      var jobs, stages, tasks = 0L
      var taskTimeMs, shuffleWrite, recordsRead = 0L
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0
        taskTimeMs = 0; shuffleWrite = 0; recordsRead = 0 }
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          recordsRead += m.inputMetrics.recordsRead
        }
      }
    }
    spark.sparkContext.addSparkListener(L)

    val todo = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted
               else names.toSeq
    println(f"${"query"}%-26s ${"med_s"}%7s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"ttime_s"}%8s ${"shufMB"}%7s ${"rows"}%10s")
    todo.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warmup (codegen, listing)
      graft.Bench.dropPins(spark)
      val times = (1 to reps).map { _ =>
        L.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // snapshot counters BEFORE dropPins (its unpersist is not query work)
        val snap = (L.jobs, L.stages, L.tasks, L.taskTimeMs, L.shuffleWrite,
          L.recordsRead)
        graft.Bench.dropPins(spark)
        (dt, snap)
      }
      val med = times.map(_._1).sorted.apply(times.size / 2)
      // report the counters of the MEDIAN-closest rep (any rep: identical
      // plan, identical counts except for speculative noise)
      val (_, (j, st, tk, tt, sw, rr)) =
        times.minBy { case (dt, _) => math.abs(dt - med) }
      println(f"$name%-26s $med%7.2f $j%5d $st%6d $tk%6d ${tt / 1e3}%8.1f " +
        f"${sw / 1e6}%7.1f $rr%10d")
    }
    spark.stop()
  }
}
