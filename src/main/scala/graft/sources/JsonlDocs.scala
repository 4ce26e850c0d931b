package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The two frames of a permissive JSONL read plus the handle that drops
  * their shared cache. `docs` and `quarantine` are both derived from ONE
  * cached parse of the text scan; DataFrame.unpersist only acts on the
  * exact cached plan it is called on, so without this handle a caller
  * could never release the cache deterministically (unpersisting either
  * derived output frees nothing) — repeated reads in a long-lived session
  * would accumulate cached text scans until a blanket
  * `spark.catalog.clearCache()`. Call `release()` once both outputs are
  * consumed (or wrap consumption in [[JsonlDocs.withRead]]).
  *
  * Deliberately a PLAIN final class, not a case class: this is a resource
  * handle, and the case-class machinery would leak the private cached
  * plan through the generated `copy()`/`apply`/`unapply` and fold it into
  * equality — a clone could outlive `release()` and re-expose the freed
  * cache. With no generated members the handle cannot be duplicated past
  * its release point. */
final class JsonlRead private[sources] (val docs: DataFrame,
                                        val quarantine: DataFrame,
                                        parsed: DataFrame) {
  def release(blocking: Boolean = false): Unit = { parsed.unpersist(blocking); () }
}

/** Permissive JSONL document ingestion — the documents-side analog of
  * [[CsvSupport]]'s permissive broker CSV reads (the reference tolerates
  * ragged CSV rows, `freetrade.js:88-105`; a web-scale document feed needs
  * the same tolerance for malformed JSON lines): good rows are typed to
  * the `documents` schema, bad rows are QUARANTINED with their raw line
  * and a damage REASON instead of failing the batch or being silently
  * dropped. At 100 TB some lines are always torn (truncated uploads,
  * encoding damage, crawler bugs); failing the job on row 4-billion or
  * dropping rows unaccounted are both operational bugs — the quarantine
  * table is what makes the loss measurable and re-driveable, and the
  * per-reason split (`LlmOps.ingestQuarantine` promotes it to the
  * oracle-checked surface) is what makes it diagnosable.
  *
  * Plan shape: ONE text scan; `from_json` in PERMISSIVE mode yields null
  * on damage, the split is two filters over the same projection — no
  * shuffle anywhere (Spark's json reader with columnNameOfCorruptRecord
  * does the same thing; this form keeps the raw line for the quarantine
  * without a second scan and makes the contract explicit). */
object JsonlDocs {

  /** The documents schema as ingested (n_chars derived, not trusted). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Admission predicate over the parsed struct: valid JSON with the two
    * required fields present. */
  def okCol(j: Column): Column =
    j.isNotNull && j.getField("doc_id").isNotNull && j.getField("text").isNotNull

  /** Damage-reason classifier for rows failing [[okCol]] — precedence:
    * `torn_json` when nothing recognizable parsed (from_json returned
    * null, or every schema field did — an all-null parse of e.g. `{}` is
    * operationally indistinguishable from torn), else `missing_doc_id`,
    * else `missing_text`. ONE site shared by [[read]]'s quarantine column
    * and the oracle-checked `ingest_quarantine` census, so the driver-
    * facing accounting can never drift from what ingestion actually
    * quarantined. */
  def reasonCol(j: Column): Column =
    when(j.isNull ||
        (j.getField("doc_id").isNull && j.getField("text").isNull &&
          j.getField("lang").isNull && j.getField("source").isNull), "torn_json")
      .when(j.getField("doc_id").isNull, "missing_doc_id")
      .otherwise("missing_text")

  /** Parse a JSONL file into typed docs + a reasoned quarantine. A line
    * quarantines when it is not valid JSON OR lacks the required
    * doc_id/text fields (a structurally-valid but semantically-empty row
    * is damage too). The parsed frame is cached so a caller consuming
    * BOTH outputs — the normal shape, since the quarantine exists to be
    * accounted — materializes the text scan + from_json once; call
    * [[JsonlRead.release]] when done. */
  def read(spark: SparkSession, path: String): JsonlRead = {
    val parsed = spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .withColumn("j", from_json(col("value"), schema))
      .cache()
    val docs = parsed.filter(okCol(col("j")))
      .select(col("j.doc_id").as("doc_id"), col("j.text").as("text"),
        col("j.lang").as("lang"), col("j.source").as("source"),
        length(col("j.text")).cast("long").as("n_chars"))
    val quarantine = parsed.filter(!okCol(col("j")))
      .select(col("value").as("raw_line"), reasonCol(col("j")).as("reason"))
    new JsonlRead(docs, quarantine, parsed)
  }

  /** Loan-pattern read: hands the two frames to `body` and releases the
    * shared cache in a finally — the no-leak shape for one-shot batch
    * consumption. */
  def withRead[A](spark: SparkSession, path: String)(
      body: (DataFrame, DataFrame) => A): A = {
    val r = read(spark, path)
    try body(r.docs, r.quarantine) finally r.release()
  }
}
