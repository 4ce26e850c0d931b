package graft

import org.apache.spark.sql.functions.col

/** Bucketing: pre-partitioned co-located joins — the 100 TB answer to
  * repeated fact-fact joins on the same key. Writing both sides bucketed on
  * the join key lets the planner drop BOTH shuffle exchanges from the
  * sort-merge join. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // dirs persist — clear both before (re)creating
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // the tables are tiny at sf0.001 so the planner would broadcast; turn
    // that off to exercise the sort-merge path bucketing is designed for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1")
    val joined =
      try spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .count()
      finally ()

    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
    assert(plan.contains("SortMergeJoin"), plan)
    // bucketed co-location: no shuffle before the join (the only exchange
    // allowed is the final tiny aggregation)
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"), joinPart)
    assert(joined.collect().map(_.getLong(1)).sum == spark.read.parquet(s"$dir/lineitem.parquet").count())
  }
}
