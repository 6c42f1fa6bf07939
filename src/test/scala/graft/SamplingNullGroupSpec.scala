package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** The r12 null-group fix shipped against fixtures whose group column is
  * never null, so the sentinel-keyed join path executed nowhere — these
  * specs feed it actual nulls (r12 verdict #2c). */
class SamplingNullGroupSpec extends SparkSpec {

  private def frame = {
    import spark.implicits._
    // 12 rows in group "a", 6 in "b", 4 in the NULL group
    ((1L to 12L).map(i => (i, Some("a"))) ++
      (13L to 18L).map(i => (i, Some("b"))) ++
      (19L to 22L).map(i => (i, Option.empty[String])))
      .toDF("doc_id", "g")
  }

  test("temperatureMixAtOf: a null group is counted, rated, and returned as null") {
    val rep = Sampling.temperatureMixAtOf(frame, alphaNum = 1, alphaDen = 2,
      groupCol = "g", idCol = "doc_id").collect()
    assert(rep.length == 3, s"expected 3 groups, got ${rep.toSeq}")
    val byG = rep.map(r => Option(r.getString(0)) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // every input row is counted somewhere, including the null group's
    assert(byG(Some("a"))._1 == 12 && byG(Some("b"))._1 == 6)
    assert(byG.contains(None), s"null group missing from the report: ${rep.toSeq}")
    assert(byG(None)._1 == 4)
    // the null group is rated like any other: n < nmax → rate < 10⁶
    val (_, nullRate, nullKept) = byG(None)
    assert(nullRate == math.floor(1e6 * math.sqrt(4.0 / 12.0)).toLong)
    assert(nullKept >= 0 && nullKept <= 4)
    // α = 0 keeps EVERYTHING — n_kept == n_docs for all three groups,
    // which fails if the null group's rows were dropped by the rate join
    val all = Sampling.temperatureMixAtOf(frame, alphaNum = 0, alphaDen = 1,
      groupCol = "g", idCol = "doc_id").collect()
    all.foreach(r => assert(r.getLong(1) == r.getLong(3),
      s"alpha=0 lost rows in group ${r.getString(0)}: $r"))
  }

  test("temperatureKeepAtOf: every row comes back — null groups and a caller __g column intact") {
    // the caller's own __g column must survive (the r12 advisor found the
    // old fixed internal name silently overwrote then dropped it)
    val docs = frame.withColumn("__g", col("doc_id") * 100)
    val out = Sampling.temperatureKeepAtOf(docs, alphaNum = 1, alphaDen = 2,
      groupCol = "g", idCol = "doc_id")
    assert(out.count() == 22, "temperatureKeepAtOf dropped rows")
    assert(out.columns.contains("__g"), "caller's __g column was dropped")
    val rows = out.select("doc_id", "g", "__g", "kept").collect()
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * 100,
        s"caller __g corrupted: $r")
    }
    // null-group rows are present with their group still null
    val nulls = rows.filter(_.isNullAt(1))
    assert(nulls.length == 4, s"null-group rows lost: ${rows.length}")
    // decisions agree with the report: kept count per group == n_kept
    val rep = Sampling.temperatureMixAtOf(frame, alphaNum = 1, alphaDen = 2,
      groupCol = "g", idCol = "doc_id").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(3)).toMap
    val keptNull = nulls.count(_.getBoolean(3))
    assert(keptNull.toLong == rep(None),
      s"keep decisions diverge from the report for the null group")
  }

  test("a real group equal to the internal sentinel fails loudly, never silently merges") {
    import spark.implicits._
    val poisoned = Seq((1L, Sampling.NullGroupSentinel), (2L, "b"))
      .toDF("doc_id", "g")
    val e = intercept[Exception] {
      Sampling.temperatureMixAtOf(poisoned, alphaNum = 1, alphaDen = 2,
        groupCol = "g", idCol = "doc_id").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("sentinel"),
      s"expected the sentinel guard, got: ${e.getMessage}")
  }
}
