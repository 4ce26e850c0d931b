package graft

import org.apache.spark.sql.functions.col
import graft.pipeline.ShardExport

/** Shard export writer: deterministic membership, lossless write, manifest
  * agreement with txt_shards, and partition pruning on the shard column. */
class ShardExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("export is lossless, manifest matches txt_shards, and shard filters prune") {
    val out = java.nio.file.Files.createTempDirectory("shardexp").toString + "/docs"
    val manifest = ShardExport.write(spark, dir, out).collect()

    // lossless: every input doc is in exactly one shard
    val nIn = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == nIn)

    // the written manifest agrees with the analytic manifest query
    // (same md5 shard arithmetic) on doc counts per shard
    val analytic = graft.analytics.LlmOps.txtShards(spark, dir).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    val written = manifest
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(written == analytic, s"written=$written analytic=$analytic")

    // a shard-filtered read prunes to that partition at planning time
    val one = spark.read.parquet(out).filter(col("shard") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
    assert(one.count() == written.getOrElse(3L, 0L))

    // determinism: a second export yields identical membership
    val out2 = java.nio.file.Files.createTempDirectory("shardexp2").toString + "/docs"
    val written2 = ShardExport.write(spark, dir, out2).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(written2 == written)
  }
}
