package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // Codegen compile failures must FAIL tests, not silently fall back to
    // interpreted execution (that's how the ArrayDot/ArrayIntersect
    // redefinition bug hid in round 1). Set as runtime conf so it applies
    // regardless of which suite created the shared session.
    s.conf.set("spark.sql.codegen.fallback", "false")
    s
  }

  val sf = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
