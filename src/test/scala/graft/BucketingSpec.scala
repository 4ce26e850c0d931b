package graft

import org.apache.spark.sql.functions.col

/** Bucketing: pre-partitioned co-located joins — the 100 TB answer to
  * repeated fact-fact joins on the same key. Writing both sides bucketed on
  * the join key lets the planner drop BOTH shuffle exchanges from the
  * sort-merge join. */
class BucketingSpec extends SparkSpec {

  /** Run `body` with the given session confs set, restoring every key to its
    * prior value (or unsetting it if it was unset) afterwards — the shared
    * session must not leak test-local planner settings into later specs. */
  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def noBroadcast[A](body: => A): A =
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")(body)

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
    noBroadcast {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .count()

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed co-location: no shuffle before the join (the only exchange
      // allowed is the final tiny aggregation)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"), joinPart)
      assert(joined.collect().map(_.getLong(1)).sum ==
        spark.read.parquet(s"$dir/lineitem.parquet").count())
    }
  }

  test("bucketed fingerprint table: incremental-dedup anti-join shuffles only the incoming batch") {
    // The at-scale shape LlmOps.ddIncremental documents: the corpus
    // fingerprint table is written bucketed on fp, so ingestion-time dedup
    // anti-joins against it WITHOUT ever shuffling (or rescanning) the
    // corpus side — only the small incoming batch is exchanged into the
    // bucket layout.
    val dir = "/root/testdata/sf0.001"
    val t = "fingerprints_b"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.filter(col("doc_id") < 250)
      .select(org.apache.spark.sql.functions.md5(col("text")).as("fp"))
      .write.bucketBy(8, "fp").sortBy("fp").saveAsTable(t)

    noBroadcast {
      val incoming = docs.filter(col("doc_id") >= 250)
        .withColumn("fp", org.apache.spark.sql.functions.md5(col("text")))
      val kept = incoming.join(spark.table(t), Seq("fp"), "left_anti")
      val plan = kept.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"), plan)
      // fingerprint side co-located: the only exchange feeds the incoming side
      assert(plan.indexOf("Exchange hashpartitioning(fp") ==
        plan.lastIndexOf("Exchange hashpartitioning(fp"), plan)
      // same kept set as the hash-join formulation over raw parquet
      val expected = graft.analytics.LlmOps.ddIncremental(spark, dir)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept.collect().map(_.getAs[Long]("doc_id")).toSet == expected)
    }
  }

  test("dd_url_incremental_bucketed shuffles only the arriving batch; frontier side co-located") {
    // The URL-stage twin of the fingerprint state below: the crawl
    // frontier persists bucketed on url_norm, the re-crawl batch anti-
    // joins against it, and the only url_norm exchange feeds the batch.
    // Admission set must equal the single-scan window gate's exactly.
    val dir = "/root/testdata/sf0.001"
    val df = graft.analytics.LlmOps.ddUrlIncrementalBucketed(spark, dir)
    val rows = df.collect().map(_.getAs[Long]("doc_id")).toSet
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"), plan)
    assert(plan.indexOf("Exchange hashpartitioning(url_norm") ==
      plan.lastIndexOf("Exchange hashpartitioning(url_norm"), plan)
    assert(plan.indexOf("Exchange hashpartitioning(url_norm") >= 0, plan)
    assert(plan.contains("Bucketed: true"), plan)
    val expected = graft.analytics.LlmOps.ddUrlIncremental(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rows == expected && rows.nonEmpty,
      s"bucketed gate diverged: extra=${rows -- expected} missing=${expected -- rows}")
  }

  test("dd_incremental_bucketed (the DRIVER-path query) shuffles only the batch side") {
    // The shape BucketingSpec proves above, promoted to the oracle-checked
    // query surface: LlmOps.ddIncrementalBucketed materializes the corpus
    // fingerprints bucketed on fp and anti-joins the batch against them.
    // No broadcast-disabling conf needed — the MERGE hint in the query
    // itself pins the sort-merge strategy, as it does under the driver.
    val dir = "/root/testdata/sf0.001"
    val df = graft.analytics.LlmOps.ddIncrementalBucketed(spark, dir)
    val rows = df.collect().map(_.getAs[Long]("doc_id")).toSeq

    // executed (post-AQE) plan: a LeftAnti sort-merge join whose ONLY
    // fp exchange feeds the incoming batch; the corpus side reads the
    // bucketed table co-located. The AQE string repeats the tree under
    // "== Initial Plan ==" — assert on the final section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"), plan)
    assert(plan.indexOf("Exchange hashpartitioning(fp") ==
      plan.lastIndexOf("Exchange hashpartitioning(fp"), plan)
    assert(plan.indexOf("Exchange hashpartitioning(fp") >= 0, plan)
    assert(plan.contains("Bucketed: true"), plan)

    // identical result to the plain anti-join formulation
    val expected = graft.analytics.LlmOps.ddIncremental(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(rows == expected, s"bucketed=${rows.take(10)} plain=${expected.take(10)}")
  }

  test("q35_bucketed_join (the DRIVER-path query): no exchange on either join side") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.analytics.Relational.q35BucketedJoin(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)

    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan)
    // both sides co-located: no shuffle on either join key anywhere; the
    // only exchanges left serve the aggregation and the final sort
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    assert(plan.split("Bucketed: true", -1).length - 1 == 2, plan)

    // identical result to the plain parquet join
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
  }

  test("fingerprint state WRITE-BACK: appended batches keep the bucket layout and the single-exchange plan") {
    // The full ingestion lifecycle: state <- state ∪ batch_fps after each
    // accepted batch, appended IN the bucket layout, so the next batch's
    // anti-join is co-located exactly like the first. (Own table name —
    // the driver-path table must stay exactly the <250 fingerprint state.)
    val dir = "/root/testdata/sf0.001"
    val t = "fp_writeback_b"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = java.nio.file.Paths.get(s"spark-warehouse/$t")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def fps(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(org.apache.spark.sql.functions.md5(col("text")).as("fp"))

    fps(0, 200).repartition(1)
      .write.bucketBy(8, "fp").sortBy("fp").saveAsTable(t)
    // batch 1: docs 200..350 anti-joined, then its fps appended to state
    val kept1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
      .withColumn("fp", org.apache.spark.sql.functions.md5(col("text")))
      .join(spark.table(t).hint("merge"), Seq("fp"), "left_anti")
    val kept1Ids = kept1.collect().map(_.getAs[Long]("doc_id")).toSet
    fps(200, 350).repartition(1)
      .write.mode("append").bucketBy(8, "fp").sortBy("fp").saveAsTable(t)

    // batch 2 sees batch 1's content as already ingested...
    val redelivered = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
      .withColumn("fp", org.apache.spark.sql.functions.md5(col("text")))
      .join(spark.table(t).hint("merge"), Seq("fp"), "left_anti")
    assert(redelivered.count() == 0)
    // ...and the appended (multi-file-per-bucket) table still serves the
    // single-batch-side-exchange sort-merge anti-join
    val plan = redelivered.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"), plan)
    assert(plan.indexOf("Exchange hashpartitioning(fp") ==
      plan.lastIndexOf("Exchange hashpartitioning(fp"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(kept1Ids.nonEmpty) // the lifecycle actually ingested something
  }
}
