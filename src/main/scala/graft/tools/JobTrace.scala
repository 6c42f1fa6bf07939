package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** One-line-per-job trace of a single query run (optimization-round
  * measurement harness): prints each job's wall time, stage/task counts
  * and call site, so loop-shaped operators can be attributed round by
  * round. Usage: tools/run_direct.sh 8g graft.tools.JobTrace <sfDir> <query> */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t00 = System.nanoTime()
    object L extends SparkListener {
      val starts = scala.collection.concurrent.TrieMap[Int, (Long, String, Int)]()
      @volatile var enabled = false
      override def onJobStart(j: SparkListenerJobStart): Unit = if (enabled) {
        val site = Option(j.properties)
          .map(_.getProperty("callSite.short", "?")).getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site, j.stageInfos.size)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (enabled) {
        starts.remove(j.jobId).foreach { case (t0, site, nst) =>
          println(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms " +
            f"${(System.nanoTime() - t00) / 1e9}%7.2f s  stages=$nst%2d  $site")
        }
      }
    }
    spark.sparkContext.addSparkListener(L)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warmup
    graft.Bench.dropPins(spark)
    Thread.sleep(500)
    println(s"==== timed run: $name")
    L.enabled = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
