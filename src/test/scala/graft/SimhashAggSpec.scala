package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, SimhashBridge}

/** SimhashAgg (custom TypedImperativeAggregate): value-equality against the
  * declarative 60-column sum formulation it replaced, partial aggregation
  * in the plan, and the SQL-registered form. */
class SimhashAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tokenHashes = {
    val hex15 = (1 to 15).map(p =>
      s"(CAST(instr('0123456789abcdef', substr(md5(t), $p, 1)) - 1 AS BIGINT) * CAST(${1L << (4 * (15 - p))} AS BIGINT))")
      .mkString("(", " + ", ")")
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("toks", expr(raw"filter(split(lower(trim(text)), '\\s+'), t -> t != '')"))
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("t"))
      .withColumn("h", expr(hex15))
      .select(col("doc_id"), col("h"))
  }

  test("kernel signature equals the declarative 60-sum formulation") {
    val tok = tokenHashes.cache()
    try {
      val kernel = tok.groupBy(col("doc_id"))
        .agg(SimhashBridge.simhashAgg(col("h"), 60).as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val bits = (0 until 60).map(i =>
        sum(expr(s"CASE WHEN (h div ${1L << i}) % 2 = 1 THEN 1 ELSE -1 END")).as(s"b$i"))
      val declarative = tok.groupBy(col("doc_id")).agg(bits.head, bits.tail: _*)
        .select(col("doc_id"),
          (0 until 60).map(i => expr(s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END"))
            .reduce(_ + _).cast("long").as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      assert(kernel.nonEmpty && kernel == declarative,
        s"${kernel.size} kernel vs ${declarative.size} declarative docs")
    } finally tok.unpersist()
  }

  test("the aggregate partial-aggregates (map-side combine) in the plan") {
    val df = tokenHashes.groupBy(col("doc_id"))
      .agg(SimhashBridge.simhashAgg(col("h"), 60).as("simhash"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("simhash_agg"), plan)
    assert(plan.contains("partial_simhash_agg"), plan)
  }

  test("simhash_agg is callable from SQL text") {
    GraftFunctions.register(spark)
    tokenHashes.createOrReplaceTempView("simhash_tok")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash_agg(h, 60) AS simhash FROM simhash_tok GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaColumn = tokenHashes.groupBy(col("doc_id"))
      .agg(SimhashBridge.simhashAgg(col("h"), 60).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaColumn)
  }
}
