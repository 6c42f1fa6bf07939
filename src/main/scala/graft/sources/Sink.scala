package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Write path for curated corpora — partitioned parquet with the two
  * 100 TB failure modes handled up front:
  *
  *  - SMALL FILES: Spark's default layout has every task write into every
  *    output directory it sees rows for — tasks × partitions files. Rows
  *    are repartitioned ON the partition columns first, so each directory
  *    is written by as few tasks as the data allows (AQE coalesces further
  *    when volumes are small).
  *  - GIANT FILES / skewed partitions: `maxRecordsPerFile` rolls files
  *    without a second pass, so one hot partition value (one dominant
  *    language, one hot date) cannot produce a monolithic file no reader
  *    can split.
  *
  * `sortCols` cluster rows inside each file (scan locality + better
  * column-store encodings downstream); directory partitioning gives
  * readers pruning on the partition columns for free. */
object Sink {

  def writeCurated(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq.empty,
      sortCols: Seq[String] = Seq.empty,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    // REBALANCE, not repartition: plain hash repartition on the partition
    // columns funnels a hot value (one dominant language/date) into a
    // single task — the rebalance hint keeps rows grouped by the columns
    // but lets AQE split oversized partitions across tasks, each still
    // writing into the one directory
    val routed =
      if (partitionCols.isEmpty) df
      else df.hint("rebalance", partitionCols.map(col): _*)
    val clustered =
      if (sortCols.isEmpty) routed
      else routed.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    clustered.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }
}
