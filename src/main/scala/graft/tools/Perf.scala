package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Per-query timing + plan inspection: `runMain graft.tools.Perf <sfDir>
  * [explain] <query>...` — times each named query (all if none given). */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rest = args.drop(1)
    val explain = rest.contains("explain")
    val names = rest.filterNot(_ == "explain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val todo = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    todo.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) { println(s"==== $name"); df.explain("formatted") }
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
