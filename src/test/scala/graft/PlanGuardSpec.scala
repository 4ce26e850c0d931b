package graft

/** Regression guard for the InferFiltersFromGenerate pushdown pathology
  * (PLANS.md, round 2): exploding a COMPUTED array lets Catalyst synthesize
  * a size()>0 filter and push it — whole interpreted lambda expression
  * inlined — into the parquet scan, where it re-runs the heaviest per-row
  * work single-threaded ahead of any repartition. This spec builds every
  * driver-facing query and asserts no scan-level data filter contains a
  * lambda. (Queries whose builders run eagerly, e.g. dd_cluster's loop,
  * execute here too — acceptable at sf0.001.)
  */
class PlanGuardSpec extends SparkSpec {

  test("no query pushes a lambda expression into a parquet scan filter") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      // examine only scan nodes: their pushed/data filters must be lambda-free
      val scanLines = plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("DataFilters") || l.contains("PushedFilters"))
      if (scanLines.exists(_.contains("lambdafunction"))) Some(name) else None
    }
    assert(offenders.isEmpty, s"lambda filter pushed to scan in: ${offenders.mkString(", ")}")
  }

  test("the interval join plans as an equi-join on the bucket key, not a nested loop") {
    // the whole point of the week-bucket expansion: the naive range join
    // falls back to BroadcastNestedLoopJoin, which does not survive scale
    val plan = graft.analytics.Relational
      .q36IntervalJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "interval join degenerated to a nested-loop join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "expected a hash/merge equi-join on the bucket key")
  }
}
