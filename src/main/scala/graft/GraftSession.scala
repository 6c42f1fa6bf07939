package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's required configuration applied —
  * the one entry point a library user needs before touching any operator.
  *
  * Pins: UTC session time (canonical JSON renders instants with a literal
  * 'Z'; see graft.canonical.Canonical), shuffle parallelism sized to the
  * deployment (pass cores for local, target partition count on a cluster),
  * nanosecond-parquet compatibility, and the graft SQL functions
  * (array_dot_long, array_intersect_count_long). AQE is left on (Spark 4
  * default) — skew-join splitting and shuffle coalescing are part of the
  * engine's scale story.
  */
object GraftSession {

  /** Local session (tests, single-node runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(SparkSession.builder().master(s"local[$cores]"), cores)
      .getOrCreate()
    // getOrCreate may return a pre-existing session on which the static
    // spark.sql.extensions conf was ignored — register directly (idempotent)
    // so the SQL functions exist either way
    GraftExtensions.register(spark)
    spark
  }

  /** Apply graft's required configs to any builder (cluster deployments
    * call this with their own master/resource settings). */
  def configure(b: SparkSession.Builder,
      shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
}
