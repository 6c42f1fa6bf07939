package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement aid for [[IvfRetrainRehearsal]]: what mean
  * assigned-centroid cosine does each candidate drift transform actually
  * score against a quantizer frozen on the build population? Used to pick
  * a drift model with a WIDE margin below the retrain threshold, so the
  * rehearsal pins policy behavior, not a coin flip. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val root = args.lift(1).getOrElse("/root/repo/target/r14/drift_probe")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("drift-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val emb = graft.sources.Tables.t(spark, sfDir, "embeddings")
        .select("vec_id", "embedding")
      val build = emb.where(col("vec_id") % 2 === 0)
      graft.operators.Similarity.buildIvfIndexOf(build, root, iters = 2,
        cells = 64)
      val odd = emb.where(col("vec_id") % 4 === 3)
      def probe(name: String)(tf: org.apache.spark.sql.Column
          => org.apache.spark.sql.Column): Unit = {
        val assigned = graft.operators.Similarity.assignToIvfIndex(spark,
          root, odd.select(col("vec_id"), tf(col("embedding"))
            .as("embedding")))
        val m = assigned.agg(avg("cos")).head().getDouble(0)
        println(f"[drift-probe] $name%-12s meanCos=$m%7.4f")
      }
      probe("identity")(e => e)
      probe("negate")(e => transform(e, x => -x))
      probe("onehot")(e => transform(e,
        (x, i) => when(i === pmod(crc32(e.cast("string")), lit(64))
          .cast("int"), lit(1000.0f)).otherwise(lit(0.0f))))
      probe("signmod")(e => transform(e,
        (x, i) => when(i % 2 === 0, x).otherwise(-x)))
      probe("shuffle")(e => concat(slice(e, 33, 32), slice(e, 1, 32)))
    } finally spark.stop()
  }
}
