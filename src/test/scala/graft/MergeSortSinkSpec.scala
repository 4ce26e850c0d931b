package graft

import java.nio.file.{Files, Path}
import graft.pipeline.MergeSortSink

/** Merge/sort/sink lifecycle semantics (`index.js:108-122` parity). */
class MergeSortSinkSpec extends SparkSpec {
  private def tmpFile(): Path = {
    val d = Files.createTempDirectory("graft-sink")
    d.resolve("data.txt")
  }

  import scala.jdk.CollectionConverters._

  test("merge + chronological sort + overwrite, duplicates survive (union-all parity)") {
    import spark.implicits._
    val sink = tmpFile()
    val first = spark.createDataset(Seq(
      "BUY 19/09/2025 AAA 1 10 0",
      "SELL 05/01/2024 BBB 2 20 0"))
    MergeSortSink.mergeSortWrite(spark, first, sink.toString)
    // second run with the same lines: duplicates must accumulate
    val out = MergeSortSink.mergeSortWrite(spark, first, sink.toString)
    assert(out == Seq(
      "SELL 05/01/2024 BBB 2 20 0",
      "SELL 05/01/2024 BBB 2 20 0",
      "BUY 19/09/2025 AAA 1 10 0",
      "BUY 19/09/2025 AAA 1 10 0"))
    assert(Files.readAllLines(sink).asScala.toSeq == out)
  }

  test("same-date ties keep insertion order: existing sink lines before fresh lines") {
    import spark.implicits._
    val sink = tmpFile()
    MergeSortSink.mergeSortWrite(spark,
      spark.createDataset(Seq("BUY 01/06/2024 OLD1 1 1 0", "BUY 01/06/2024 OLD2 1 1 0")), sink.toString)
    val out = MergeSortSink.mergeSortWrite(spark,
      spark.createDataset(Seq("BUY 01/06/2024 NEW1 1 1 0", "BUY 31/05/2024 NEW2 1 1 0")), sink.toString)
    assert(out == Seq(
      "BUY 31/05/2024 NEW2 1 1 0",
      "BUY 01/06/2024 OLD1 1 1 0",
      "BUY 01/06/2024 OLD2 1 1 0",
      "BUY 01/06/2024 NEW1 1 1 0"))
  }

  test("distinct mode honors the reference's stated (dead) dedup intent") {
    import spark.implicits._
    val sink = tmpFile()
    val lines = spark.createDataset(Seq("BUY 19/09/2025 AAA 1 10 0", "BUY 19/09/2025 AAA 1 10 0"))
    val out = MergeSortSink.mergeSortWrite(spark, lines, sink.toString, distinct = true)
    assert(out == Seq("BUY 19/09/2025 AAA 1 10 0"))
  }

  test("fail-fast on a line with an unparsable date (index.js:18-28 parity)") {
    import spark.implicits._
    val sink = tmpFile()
    val bad = spark.createDataset(Seq("BUY not-a-date AAA 1 10 0"))
    val e = intercept[Exception](MergeSortSink.mergeSortWrite(spark, bad, sink.toString))
    assert(e.getMessage.contains("Invalid or missing date"))
    assert(!Files.exists(sink)) // sink untouched on abort
  }
}
