package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Permissive JSONL document ingestion — the documents-side analog of
  * [[CsvSupport]]'s permissive broker CSV reads (the reference tolerates
  * ragged CSV rows, `freetrade.js:88-105`; a web-scale document feed needs
  * the same tolerance for malformed JSON lines): good rows are typed to
  * the `documents` schema, bad rows are QUARANTINED with their raw line
  * instead of failing the batch or being silently dropped. At 100 TB some
  * lines are always torn (truncated uploads, encoding damage, crawler
  * bugs); failing the job on row 4-billion or dropping rows unaccounted
  * are both operational bugs — the quarantine table is what makes the
  * loss measurable and re-driveable.
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

  /** Parse a JSONL file: `(documents, quarantine)`. A line quarantines
    * when it is not valid JSON OR lacks the required doc_id/text fields
    * (a structurally-valid but semantically-empty row is damage too).
    * The parsed frame is cached so a caller consuming BOTH outputs — the
    * normal shape, since the quarantine exists to be accounted —
    * materializes the text scan + from_json once; unpersist either
    * output's lineage (or clear the session cache) when done. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .withColumn("j", from_json(col("value"), schema))
      .cache()
    val ok = col("j").isNotNull &&
      col("j.doc_id").isNotNull && col("j.text").isNotNull
    val docs = parsed.filter(ok)
      .select(col("j.doc_id").as("doc_id"), col("j.text").as("text"),
        col("j.lang").as("lang"), col("j.source").as("source"),
        length(col("j.text")).cast("long").as("n_chars"))
    val quarantine = parsed.filter(!ok).select(col("value").as("raw_line"))
    (docs, quarantine)
  }
}
