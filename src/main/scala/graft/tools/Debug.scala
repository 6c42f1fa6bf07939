package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.canonical.Canonical
import graft.ops._
import graft.sources.Tables
import graft.store.LocalStore

/** Pipeline demo / manual verification drive: the reference's full lifecycle
  * (load → diff → sync → tombstone → verify) against the local store. */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("demo").toString
    val source = SourceDef("graft", "main", "orders", Seq("o_orderkey"))
    val store = new LocalStore(spark, dir)
    val orders = Tables.t(spark, sf, "orders")

    println(s"== load: sent=${Load.load(orders, source, store)} of ${orders.count()} rows")
    val st = store.topicState(Seq(source.topic))
    println(s"== topicState keys=${st.count()}")
    println("== sample message: " + st.orderBy("key").head().mkString(" | "))

    val d0 = Diff.diff(Canonical.messages(orders, source), st)
    println(s"== diff after load empty=${Diff.isEmpty(d0)}")

    val mutated = orders.withColumn("o_totalprice",
      when(col("o_orderkey") === 7, lit(1.23)).otherwise(col("o_totalprice")))
    val deleted = mutated.where(col("o_orderkey") =!= 11)
    val d1 = Diff.diff(Canonical.messages(deleted, source),
      store.topicState(Seq(source.topic)))
    d1.groupBy(Diff.Side).count().orderBy(Diff.Side).show()
    println(s"== sync sent=${Sync.syncFromDiff(d1, store)} (expect 2: 1 upsert + 1 tombstone)")
    println(s"== re-sync sent=${Sync.sync(deleted, source, store)} (expect 0: idempotent)")

    // reopen the store fresh (new instance) — persistence across sessions
    val store2 = new LocalStore(spark, dir)
    val r = VerifyOps.verifySync(deleted, source, store2)
    println(s"== verify on reopened store: matches=${r.matches} attempts=${r.attempts} synced=${r.synced}")
    println(s"== tombstoned key present=${!store2.topicState(Seq(source.topic))
      .where(col("key") === """{"o_orderkey":11}""").isEmpty}")
    spark.stop()
  }
}
