package graft

import graft.sources.JsonlDocs

/** Permissive JSONL ingestion: good rows typed, damaged rows quarantined
  * with their raw line and a damage reason, nothing silently dropped
  * (conservation law), and the shared parse cache releasable. */
class JsonlDocsSpec extends SparkSpec {

  private def write(lines: Seq[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("jsonl")
    val f = d.resolve("docs.jsonl")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("good lines are typed to the documents schema; torn/empty-field lines quarantine with reasons; counts conserve") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "web"}""",
      """{"doc_id": 3, "text": "delta epsilon", "lang":""",   // torn mid-object
      """not json at all""",                                  // garbage
      """{"doc_id": 4, "lang": "en", "source": "web"}""",     // missing text
      "",                                                     // blank (skipped, not damage)
      """{"text": "eta", "lang": "en", "source": "web"}""",   // missing doc_id
      """{"doc_id": 5, "text": "zeta", "lang": "fr", "source": "feed"}"""))
    val r = JsonlDocs.read(spark, path)
    val rows = r.docs.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 5L))
    assert(rows.head.getAs[String]("text") == "alpha beta")
    assert(rows.head.getAs[Long]("n_chars") == 10L)
    val bad = r.quarantine.collect()
      .map(q => q.getAs[String]("raw_line") -> q.getAs[String]("reason"))
    assert(bad.length == 4, bad.mkString("|"))
    assert(bad.exists { case (l, why) => l.startsWith("not json") && why == "torn_json" })
    assert(bad.exists { case (l, why) => l.contains("\"doc_id\": 3") && why == "torn_json" },
      "a truncated object must classify as torn")
    assert(bad.exists { case (l, why) => l.contains("\"doc_id\": 4") && why == "missing_text" })
    assert(bad.exists { case (l, why) => l.contains("\"eta\"") && why == "missing_doc_id" })
    // conservation: every non-blank input line lands in exactly one table
    assert(rows.length + bad.length == 7)
    r.release()
  }

  test("a fully clean file quarantines nothing and round-trips through the LLM ops") {
    val path = write(Seq(
      """{"doc_id": 0, "text": "the cat and the dog", "lang": "en", "source": "s"}""",
      """{"doc_id": 1, "text": "the cat and the dog", "lang": "en", "source": "s"}"""))
    JsonlDocs.withRead(spark, path) { (docs, quarantine) =>
      assert(quarantine.count() == 0)
      // ingested frame feeds the operator surface: exact dedup sees the pair
      val d = java.nio.file.Files.createTempDirectory("jsonl2").toString
      docs.write.parquet(s"$d/documents.parquet")
      val dup = graft.analytics.LlmOps.ddExact(spark, d).collect()
      assert(dup.length == 1 && dup.head.getAs[Long]("n_copies") == 2L)
    }
  }

  test("release() actually frees the shared parse cache (the handle exists for a reason)") {
    val path = write(Seq(
      """{"doc_id": 0, "text": "one", "lang": "en", "source": "s"}"""))
    def cachedRdds: Int =
      spark.sparkContext.getPersistentRDDs.size
    val before = cachedRdds
    val r = JsonlDocs.read(spark, path)
    r.docs.count(); r.quarantine.count() // materialize the shared cache
    assert(cachedRdds > before, "read() should have populated a cache entry")
    r.release(blocking = true)
    assert(cachedRdds == before,
      "release() must drop the parse cache — unpersisting a derived frame would not")
  }
}
