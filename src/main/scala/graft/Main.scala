package graft

import org.apache.spark.sql.SparkSession
import graft.model.Transaction
import graft.pipeline.MergeSortSink
import graft.sources._

/** CLI mirroring the reference driver (`index.js:48-106`):
  * `graft.Main <freetrade|ii|fidelity|bullionvault> <csv-or-folder> [out]`
  * — parse, merge with the existing sink, sort chronologically, overwrite. */
object Main {
  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val distinct = flags.contains("--distinct")
    if (positional.length < 2 || positional.length > 3 || !flags.forall(_ == "--distinct")) {
      System.err.println("Usage: graft.Main <freetrade|ii|fidelity|bullionvault> <path> [out=data.txt] [--distinct]")
      sys.exit(1)
    }
    val Array(kind, path) = positional.take(2)
    val out = if (positional.length == 3) positional(2) else "data.txt"

    val spark = SparkSession.builder()
      .appName("graft")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val f = new java.io.File(path)
    if (!f.exists()) { System.err.println(s"No such file or folder: $path"); sys.exit(1) }

    val canonical = kind.toLowerCase match {
      case "freetrade" => FreetradeSource.readFile(spark, path)
      case "ii" => IISource.readFile(spark, path)
      case "fidelity" => FidelitySource.readFile(spark, path)
      case "bullionvault" =>
        if (!f.isDirectory) { System.err.println(s"Expected a folder of .eml files: $path"); sys.exit(1) }
        BullionVaultSource.readFolder(spark, path)
      case other => System.err.println(s"Unknown type: $other"); sys.exit(1); null
    }

    val lines = Transaction.toLines(canonical)
    val sorted = MergeSortSink.mergeSortWrite(spark, lines, out, distinct = distinct)
    println(s"Wrote ${sorted.size} transactions to $out")
    sorted.take(5).foreach(println)
    if (sorted.size > 5) println(s"... and ${sorted.size - 5} more")
    spark.stop()
  }
}
