package graft

import graft.analytics.Relational

/** q34_skew_aqe: AQE's skew-join splitting must actually FIRE on the
  * unsalted low-cardinality join (3 hot l_returnflag partitions), and the
  * result must match the manually salted q28 twin — same rows either way,
  * only the physical plan differs. */
class SkewAqeSpec extends SparkSpec {

  test("OptimizeSkewedJoin splits the hot partitions and the result matches q28") {
    val dir = "/root/testdata/sf0.001"
    val df = Relational.q34SkewAqe(spark, dir)
    val rows = df.collect()

    // post-execution (final) AQE plan: the sort-merge join must be marked
    // as a skew join — that marker only appears when OptimizeSkewedJoin
    // rewrote the join with split partitions
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("skew=true"), plan)

    // identical result to the salted formulation (modulo row order — both
    // sort by f_flag; compare as sets of rendered rows)
    val salted = Relational.q28SaltedJoin(spark, dir).collect()
    assert(rows.map(_.toString).toSet == salted.map(_.toString).toSet,
      s"aqe=${rows.mkString(";")} salted=${salted.mkString(";")}")

    // the cloned-session confs must not have leaked into the shared session
    assert(spark.conf.getOption(
      "spark.sql.adaptive.forceOptimizeSkewedJoin").forall(_ == "false"))
  }
}
