package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-JVM repeated query timing — the reliable way to compare plan
  * variants on this machine (separate Bench JVMs swing ±15–20% under
  * background load; repeated in-process runs after a warmup are stable).
  * Usage: runMain graft.tools.Prof <sfDir> <reps> <query> [<query> ...] */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Prof <sfDir> <reps> <query>...")
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .appName("graft-prof").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      require(qs.contains(n), s"unknown query $n")
      qs(n)(spark, dir).count() // untimed warmup (codegen, file listing)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        qs(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $n%-28s min=${times.min}%.2f " +
        f"med=${times.sorted.apply(reps / 2)}%.2f max=${times.max}%.2f")
    }
    spark.stop()
  }
}
