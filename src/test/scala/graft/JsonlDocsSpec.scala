package graft

import graft.sources.JsonlDocs

/** Permissive JSONL ingestion: good rows typed, damaged rows quarantined
  * with their raw line, nothing silently dropped (conservation law). */
class JsonlDocsSpec extends SparkSpec {

  private def write(lines: Seq[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("jsonl")
    val f = d.resolve("docs.jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("good lines are typed to the documents schema; torn/empty-field lines quarantine; counts conserve") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "web"}""",
      """{"doc_id": 3, "text": "delta epsilon", "lang":""",   // torn mid-object
      """not json at all""",                                  // garbage
      """{"doc_id": 4, "lang": "en", "source": "web"}""",     // missing text
      "",                                                     // blank (skipped, not damage)
      """{"doc_id": 5, "text": "zeta", "lang": "fr", "source": "feed"}"""))
    val (docs, quarantine) = JsonlDocs.read(spark, path)
    val rows = docs.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 5L))
    assert(rows.head.getAs[String]("text") == "alpha beta")
    assert(rows.head.getAs[Long]("n_chars") == 10L)
    val bad = quarantine.collect().map(_.getAs[String]("raw_line"))
    assert(bad.length == 3, bad.mkString("|"))
    assert(bad.exists(_.startsWith("not json")))
    assert(bad.exists(_.contains("\"doc_id\": 4")), "missing-required-field row must quarantine")
    // conservation: every non-blank input line lands in exactly one table
    assert(rows.length + bad.length == 6)
  }

  test("a fully clean file quarantines nothing and round-trips through the LLM ops") {
    val path = write(Seq(
      """{"doc_id": 0, "text": "the cat and the dog", "lang": "en", "source": "s"}""",
      """{"doc_id": 1, "text": "the cat and the dog", "lang": "en", "source": "s"}"""))
    val (docs, quarantine) = JsonlDocs.read(spark, path)
    assert(quarantine.count() == 0)
    // ingested frame feeds the operator surface: exact dedup sees the pair
    val d = java.nio.file.Files.createTempDirectory("jsonl2").toString
    docs.write.parquet(s"$d/documents.parquet")
    val dup = graft.analytics.LlmOps.ddExact(spark, d).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("n_copies") == 2L)
  }
}
