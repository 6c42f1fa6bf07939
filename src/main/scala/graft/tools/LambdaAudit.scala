package graft.tools

import org.apache.spark.sql.SparkSession

/** Sweep every registered query's EXECUTED plan for higher-order-function
  * emissions (`lambdafunction`) and report where each sits relative to
  * whole-stage codegen: `runMain graft.tools.LambdaAudit [sfDir]`.
  *
  * Why (r15 verdict #5): HOFs carry no doGenCode, so one lambda in a
  * projection drops the WHOLE projection out of whole-stage codegen and
  * onto the interpreted per-row path — the exact mechanism behind r14's
  * t02-family regression (countIn's `size(filter(...))`, since replaced
  * by the native CountInSet). This audit is the round's measurement pass:
  * every surviving emission is either on an AGGREGATED input (rows
  * already reduced by a group-by, so per-row cost is per-GROUP), a cold
  * path (driver-side bounded work), or a nativization candidate.
  *
  * Output, one line per query with any lambda in the executed plan:
  *   <query>  lambdas=<n>  inWSCG=<m>  [worstFragment]
  * where inWSCG counts lambdas appearing inside a WholeStageCodegen
  * subtree — those are the suspicious ones (a codegen'd stage that FEEDS
  * an interpreted projection is normal; a lambda in the middle of a hot
  * per-row projection is not). Plan-only: nothing executes.
  */
object LambdaAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val total = "lambdafunction".r.findAllMatchIn(plan).size
          if (total == 0) None
          else {
            // count lambdas on lines inside a WholeStageCodegen span:
            // toString marks member operators with a leading "*(n)"
            val inWscg = plan.linesIterator
              .filter(_.trim.startsWith("*("))
              .map(l => "lambdafunction".r.findAllMatchIn(l).size)
              .sum
            Some((name, total, inWscg))
          }
        } catch {
          case e: Throwable =>
            Some((s"$name [PLAN-ERROR ${e.getClass.getSimpleName}]", -1, -1))
        }
    }
    println(f"${"query"}%-34s lambdas inWSCG")
    rows.foreach { case (n, t, w) => println(f"$n%-34s $t%7d $w%6d") }
    println(s"[lambda-audit] ${rows.size} of ${graft.SparkEntry.queries.size} " +
      s"queries carry a lambda in the executed plan")
    spark.stop()
  }
}
