package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). Column
  * selection happens downstream — Spark's parquet reader prunes to the
  * required schema automatically, so scans only read referenced columns. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Short stable tag of a data directory, safe inside a table identifier —
    * used to key materialized state tables (bucketed facts, fingerprint
    * state) by the dir they were built from, so two dirs in one warehouse
    * never clobber each other's layout. */
  def dirTag(sfDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  /** Register every table as a temp view so the whole surface is reachable
    * from `spark.sql(...)` (plus `js_num` via GraftFunctions/extensions).
    * Idempotent per (session, dir): re-registration would re-read ten
    * parquet schemas on every SQL-surface query. `force = true` re-registers
    * unconditionally — harnesses that rewrite the parquet under an already-
    * registered dir mid-session use it to avoid serving stale views. */
  def registerViews(spark: SparkSession, sfDir: String, force: Boolean = false): Unit = {
    val marker = "graft.views.dir"
    if (force || !spark.conf.getOption(marker).contains(sfDir)) {
      names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
      spark.conf.set(marker, sfDir)
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
