package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard EXPORT — the writer stage the shard manifest
  * ([[graft.analytics.LlmOps.txtShards]]) describes: every document lands
  * in one of 16 shards by the same deterministic md5(doc_id) assignment
  * (partitioning/cluster-size/row-order independent, so re-running the
  * export anywhere yields byte-identical shard membership), and the corpus
  * is written as `shard=N/` partitioned parquet readable by any engine.
  *
  * Scale shape: one narrow projection plus a `partitionBy` write — each
  * task writes only the shards its rows hash to, no pre-shuffle required
  * (a production export with strict files-per-shard targets would
  * `repartition($"shard")` first, trading one shuffle for exactly one
  * writer task per shard; at 16 shards x thousands of tasks the unshuffled
  * form is usually right because small files merge at read time).
  * The returned manifest is computed from the WRITTEN data — doc and char
  * counts per shard read back from the export, not from the input — so a
  * lost write surfaces as a manifest mismatch, not silence. */
object ShardExport {

  val NumShards = 16

  /** The deterministic shard id expression (identical arithmetic to
    * txt_shards' manifest, md5 first-4-hex-chars mod 16). */
  private def shardExpr: org.apache.spark.sql.Column = {
    val hex4 = (1 to 4).map(p =>
      s"(CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), $p, 1)) - 1 AS BIGINT) * CAST(${math.pow(16, 4 - p).toLong} AS BIGINT))")
      .mkString("(", " + ", ")")
    expr(s"CAST($hex4 % $NumShards AS BIGINT)")
  }

  /** Write `documents` under `outPath` as shard-partitioned parquet and
    * return the read-back manifest (shard, n_docs, n_chars_total). */
  def write(spark: SparkSession, sfDir: String, outPath: String): DataFrame = {
    graft.analytics.Tables.documents(spark, sfDir)
      .withColumn("shard", shardExpr)
      .write.mode("overwrite").partitionBy("shard").parquet(outPath)
    manifest(spark, outPath)
  }

  /** Manifest over an existing export (read-back verification path). */
  def manifest(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .orderBy(col("shard"))
}
