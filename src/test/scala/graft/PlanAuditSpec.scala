package graft

import graft.operators.Relational

/** Cross-cutting physical-plan invariants over EVERY registered query —
  * the ".explain and iterate" discipline as a regression gate, not a
  * one-off audit. */
class PlanAuditSpec extends SparkSpec {

  /** BroadcastNestedLoopJoin is acceptable only where it is bounded by
    * construction: the declared quadratic baselines (dd02/ss02 — their
    * scale paths dd03/ss04 exist and are asserted elsewhere) and the
    * single-row query-vector attach in the ANN queries (a 1-row broadcast
    * at any corpus size). */
  private val bnljAllowed = Set(
    "dd02_ngram_jaccard", "ss02_neardup",
    "ss01_cosine_topk", "ss03_lsh_ann", "ss06_ivf_ann")

  test("no cartesian products anywhere; no unbounded nested-loop joins") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!bnljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the allowed set")
    }
  }

  test("q02: both predicates are pushed to the parquet scan") {
    val plan = Relational.q02PredicateScan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushdown section:\n$plan")
    assert(!plan.contains("PushedFilters: []"), s"empty pushdown:\n$plan")
    assert(plan.contains("EqualTo(l_returnflag,R)") &&
      plan.contains("GreaterThan(l_quantity,"), s"missing pushed filters:\n$plan")
  }

  test("q01: column pruning reaches the scan (untouched columns unread)") {
    val plan = Relational.q01Scan(spark, sf)
      .queryExecution.executedPlan.toString
    // q01 projects 4 of lineitem's 11 columns; the scan must not read the
    // widest untouched ones
    assert(!plan.contains("l_extendedprice") && !plan.contains("l_shipdate"),
      s"scan reads pruned columns:\n$plan")
  }
}
