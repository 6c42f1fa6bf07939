package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-query timing + plan inspection:
  * `runMain graft.tools.Perf <sfDir> [explain] [reps=N] <query>...` —
  * times each named query (all if none given). With `reps=N` (N ≥ 2) each
  * query gets one untimed warmup then N timed runs reported as
  * min/med/max — the reliable way to compare plan variants on this
  * machine, since separate bench JVMs swing ±15–20% under background
  * load while same-JVM repeats after warmup are stable. */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val explain = rest.contains("explain")
    val reps = rest.collectFirst { case s if s.startsWith("reps=") =>
      s.stripPrefix("reps=").toInt }.getOrElse(1)
    require(reps >= 1, s"reps must be >= 1: $reps")
    val names = rest.filterNot(s => s == "explain" || s.startsWith("reps="))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val todo = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    todo.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) { println(s"==== $name"); df.explain("formatted") }
      if (reps == 1) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
        graft.Bench.dropPins(spark)
      } else {
        df.count() // untimed warmup (codegen, file listing)
        graft.Bench.dropPins(spark)
        // SPARK_GRAFT_PERF_DIAG=1: after each rep, print retained heap and
        // the on-disk footprint of the executor scratch dirs — the two
        // candidate carriers of same-JVM rep-over-rep degradation (old-gen
        // debt vs shuffle-file cleaner backlog). Measurement-free when
        // unset.
        val diag = sys.env.get("SPARK_GRAFT_PERF_DIAG").contains("1")
        def scratchBytes: Long = {
          val tmp = new java.io.File(
            sys.props.getOrElse("java.io.tmpdir", "/tmp"))
          Option(tmp.listFiles()).getOrElse(Array.empty)
            .filter(f => f.getName.startsWith("blockmgr-") ||
              f.getName.startsWith("spark-"))
            .map { root =>
              var s = 0L
              def walk(f: java.io.File): Unit =
                if (f.isDirectory)
                  Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
                else s += f.length()
              walk(root); s
            }.sum
        }
        val times = (1 to reps).map { i =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          // free the rep's checkpoint blocks so rep N doesn't pay rep
          // N-1's storage pressure (see Bench.dropPins)
          graft.Bench.dropPins(spark)
          if (diag) {
            val rt = Runtime.getRuntime
            println(f"  [diag] rep$i t=$dt%.2f heapUsed=" +
              f"${(rt.totalMemory - rt.freeMemory) / 1e9}%.1fg " +
              f"scratch=${scratchBytes / 1e9}%.1fg")
          }
          dt
        }
        // true median: average the two middle elements for even rep
        // counts (sorted(reps/2) alone reports the MAX at reps=2)
        val sorted = times.sorted
        val med = if (reps % 2 == 1) sorted(reps / 2)
          else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
        // raw vector IN EXECUTION ORDER: same-JVM rep GROWTH (rep1 ≪ repN)
        // is a different diagnosis (state surviving dropPins) than random
        // spread (load), and min/med/max can't distinguish them
        println(f"$name%-22s min=${times.min}%.2f " +
          f"med=$med%.2f max=${times.max}%.2f " +
          times.map(t => f"$t%.2f").mkString("raw=[", ",", "]"))
      }
    }
    spark.stop()
  }
}
