package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{LlmOps, Oracles, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory + the LLM-pipeline
  * extension surface) to DataFrame builders over a testdata sf directory;
  * `oracleSql` carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A 3-way join + aggregation + top-k — exercises scan, filter pushdown,
    * joins (broadcast at this SF), partial aggregation and TakeOrdered. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ LlmOps.duckdb
}
