package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SourceDef
import graft.canonical.Canonical
import graft.ops.{Diff, Load, Sync, VerifyOps}
import graft.sources.Tables
import graft.store.LocalStore

/** End-to-end mirror-lifecycle throughput (the reference's whole workflow:
  * load → diff → sync → verify) against the local log store. The reference's
  * published scale is 4,277 rows per full run (BASELINE.md); this drives the
  * same lifecycle over the sf0.1 orders table (~150k rows) and prints
  * per-phase seconds. Not part of the driver bench contract — run manually:
  * `sbt "runMain graft.tools.MirrorBench [sfDir]"`. */
object MirrorBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("mirrorbench").toString
    val source = SourceDef("graft", "main", "orders", Seq("o_orderkey"))
    val store = new LocalStore(spark, dir)
    val orders = Tables.t(spark, sfDir, "orders")
    val n = orders.count()

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    println(s"rows: $n")
    val sent = timed("load (snapshot -> topic)") {
      Load.load(orders, source, store)
    }
    require(sent == n, s"sent $sent != $n")
    timed("diff (clean, full outer)") {
      val d = Diff.diff(Canonical.messages(orders, source),
        store.topicState(Seq(source.topic)))
      require(Diff.isEmpty(d))
    }
    val mutated = orders.withColumn("o_totalprice",
      when(col("o_orderkey") % 1000 === 0, lit(0.0)).otherwise(col("o_totalprice")))
      .where(col("o_orderkey") % 997 =!= 0)
    timed("sync (0.1% drift + deletes)") {
      Sync.sync(mutated, source, store)
    }
    timed("verify (matches)") {
      val r = VerifyOps.verifySync(mutated, source, store)
      require(r.matches && !r.synced, s"unexpected: $r")
    }
    spark.stop()
  }
}
