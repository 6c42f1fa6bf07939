package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Pipelines, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps operator names (SURVEY §2) to DataFrame plans over a
  * scale-factor dir; `oracleSql` gives the DuckDB-checkable equivalent. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core loop in one plan: scan → last-write-wins
    * compaction → diff-classification (ref melt.clj:307-323,418-429). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q08Diff(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator: SURVEY.md §2 relational parity +
    * the §7.6 training-data pipeline operators (dedup / similarity / text
    * analysis / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Pipelines.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Pipelines.oracle
}
