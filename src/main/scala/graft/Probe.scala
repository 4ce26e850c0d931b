package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries by name.
  *
  *   runMain graft.Probe <sfDir> <query> [query...]
  *
  * Each query runs twice (cold, then warm — the second run shows how much
  * of the cold cost is one-off session/codegen/cache-build work). Honors
  * GRAFT_CLUSTER_DEBUG etc. via the forked JVM's environment.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val cnt = q(spark, sfDir).count()
        println(f"PROBE $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      }
      if (sys.env.contains("GRAFT_EXPLAIN")) q(spark, sfDir).explain("formatted")
    }
    graft.analytics.LlmOps.releaseCaches()
    spark.stop()
  }
}
