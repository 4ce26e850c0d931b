package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, TopKBridge}

/** TopKMinAgg (bounded smallest-K TypedImperativeAggregate): multiset
  * equality against sort-take-k across many partitions (exercising the
  * map-side partial path, serialization, and merge), the under-k and
  * duplicate edge cases, partial aggregation in the plan, and the
  * SQL-registered form. */
class TopKAggSpec extends SparkSpec {

  test("smallest-k per group equals sorted take(k), across many partitions") {
    import spark.implicits._
    // deterministic value stream with collisions and negatives; 13
    // partitions force partial buffers through serialize + merge
    val rows = (0 until 5000).map { i =>
      (i % 7, ((i * 2654435761L) % 997) - 498)
    } ++ Seq((0, -997L), (0, -997L)) // tied minimum: both copies must be kept
    val got = rows.toDF("g", "v").repartition(13)
      .groupBy(col("g")).agg(TopKBridge.topkMin(col("v"), 5).as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted.take(5).toList
    }
    assert(got == want)
    // duplicates survive within the k slots (multiset, not distinct, take)
    assert(want.values.exists(l => l.distinct.size < l.size))
  }

  test("groups smaller than k return all values ascending; k=1 is min") {
    import spark.implicits._
    val df = Seq((1, 30L), (1, 10L), (1, 20L), (2, 5L)).toDF("g", "v")
    val k3 = df.groupBy(col("g")).agg(TopKBridge.topkMin(col("v"), 3).as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(k3 == Map(1 -> List(10L, 20L, 30L), 2 -> List(5L)))
    val k1 = df.groupBy(col("g")).agg(TopKBridge.topkMin(col("v"), 1).as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(k1 == Map(1 -> List(10L), 2 -> List(5L)))
  }

  test("the aggregate partial-aggregates (map-side combine) in the plan") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i % 3, i.toLong)).toDF("g", "v")
      .groupBy(col("g")).agg(TopKBridge.topkMin(col("v"), 4).as("kept"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("topk_min"), plan)
    assert(plan.contains("partial_topk_min"), plan)
  }

  test("null inputs are skipped, not counted against k") {
    import spark.implicits._
    val got = Seq((1, Some(5L)), (1, None), (1, Some(3L)), (1, None), (2, None))
      .toDF("g", "v").repartition(3)
      .groupBy(col("g")).agg(TopKBridge.topkMin(col("v"), 2).as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(got == Map(1 -> List(3L, 5L), 2 -> Nil))
  }

  test("topk_min is callable from SQL text") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (0 until 100).map(i => (i % 3, ((i * 37) % 50).toLong)).toDF("g", "v")
      .createOrReplaceTempView("topk_rows")
    val viaSql = spark.sql(
      "SELECT g, topk_min(v, 4) AS kept FROM topk_rows GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    val viaColumn = spark.table("topk_rows")
      .groupBy(col("g")).agg(TopKBridge.topkMin(col("v"), 4).as("kept"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(viaSql == viaColumn && viaSql.nonEmpty)
  }
}
