package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** O22 — planning-time sampling (ref /root/reference/src/jdbc/melt.clj:153-174
  * sample-db / write-sample: per table `Select count(*)` + `TOP 10`, written
  * to target/data-samples/<name>.txt; DESIGN.md:7-13 planning step).
  *
  * `limit(n)` plans as CollectLimit — no full scan materializes, so sampling
  * a 100 TB table reads only the first partitions it needs. */
object Sample {

  /** Render count + first n rows of one table (deterministic when the caller
    * orders the frame). */
  def render(df: DataFrame, n: Int = 10): String = {
    val cols = df.columns.mkString(" | ")
    val rows = df.limit(n).collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString(" | "))
    (s"count: ${df.count()}" +: cols +: rows).mkString("\n")
  }

  /** Write one sample file per table under `dir` (ref melt.clj:166-174). */
  def writeSamples(tables: Seq[(String, DataFrame)], dir: String,
      n: Int = 10): Seq[String] = {
    Files.createDirectories(Paths.get(dir))
    tables.map { case (name, df) =>
      val path = s"$dir/$name.txt"
      Files.write(Paths.get(path), render(df, n).getBytes("UTF-8"))
      path
    }
  }
}
