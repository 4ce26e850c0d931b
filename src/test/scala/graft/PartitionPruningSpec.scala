package graft

import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning: the other half of the 100 TB
  * scan story (PLANS.md) — a date-partitioned fact table lets a temporal
  * filter skip whole directories instead of reading footers. */
class PartitionPruningSpec extends SparkSpec {

  test("year-partitioned write is pruned by a year filter") {
    val base = java.nio.file.Files.createTempDirectory("part").toString
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.partitionBy("ship_year").parquet(s"$base/lineitem_p")

    val pruned = spark.read.parquet(s"$base/lineitem_p")
      .filter(col("ship_year") === 2023)
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"), plan)

    // pruning must not change semantics vs the unpartitioned filter
    val expected = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(year(col("l_shipdate")) === 2023)
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
    assert(pruned.collect().toSeq == expected.collect().toSeq)
  }

  test("SQL surface: registered views + js_num answer a query end-to-end") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    graft.analytics.Tables.registerViews(spark, "/root/testdata/sf0.001")
    val row = spark.sql(
      """SELECT o_orderpriority, js_num(round(sum(o_totalprice), 2)) AS total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 1""".stripMargin).first()
    assert(row.getString(0).nonEmpty)
    assert(row.getString(1).matches("\\d+(\\.\\d+)?")) // JS rendering, no trailing zeros
  }
}
