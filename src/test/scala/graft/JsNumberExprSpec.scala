package graft

import org.apache.spark.sql.graft.GraftFunctions
import graft.expr.JsNumber

/** The codegen'd `js_num` Catalyst expression: SQL registration, Column
  * path, and equivalence with the reference formatter. */
class JsNumberExprSpec extends SparkSpec {

  test("js_num is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT js_num(CAST(10.0 AS DOUBLE)) AS a, js_num(CAST(78990.0 AS DOUBLE)) AS b, " +
        "js_num(CAST(10.8103524 AS DOUBLE)) AS c, js_num(CAST(NULL AS DOUBLE)) AS d").first()
    assert(out.getString(0) == "10")
    assert(out.getString(1) == "78990")
    assert(out.getString(2) == "10.8103524")
    assert(out.isNullAt(3))
  }

  test("Column path uses the native expression (no ScalaUDF in the plan)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // spark.range (not a LocalRelation) so the projection survives into the
    // physical plan instead of being constant-folded away
    val df = spark.range(2).select(JsNumber.jsNum((col("id") + 3).cast("double") / 2).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("js_num"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.as[String].collect().toSeq == Seq("1.5", "2"))
  }

  test("expression output equals the reference formatter over a seeded sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vals = Seq.fill(2000)((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(12)))
    val got = vals.toDF("v").select(JsNumber.jsNum($"v")).as[String].collect()
    assert(got.toSeq == vals.map(JsNumber.format))
  }
}
