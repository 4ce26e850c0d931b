package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads ride through the
  * engine as opaque `binary` columns with typed metadata, and per-item
  * decode / feature-extraction runs as partition-batched executor-side code
  * (the Scala analog of `mapInPandas`: one iterator per partition, batch
  * amortized setup, Arrow-friendly shapes).
  *
  * The decode step itself is STUBBED with a deterministic fake — this
  * container ships no image/audio codecs — but everything Spark-side is
  * real and tested: the schema, the binary column plumbing, the partition
  * batching, the feature-vector output shape, and the frame-sampling
  * explode. Swapping [[DecodeStub]] for a real codec is a local change.
  *
  * Scale notes: media payloads dominate row size, so the media table is
  * repartitioned by `media_id` before decode to spread byte-weight evenly;
  * feature extraction is a narrow map (no shuffle); frame sampling uses a
  * generator (`explode`) so output rows stream without materializing a
  * per-video frame list on the driver.
  */
object Multimodal {

  case class MediaItem(media_id: Long, kind: String, content: Array[Byte], meta_w: Int, meta_h: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int, digest: String, features: Array[Float])

  /** Deterministic fake decoder standing in for an image/audio codec.
    * Produces an 8-dim "embedding" from byte histogram moments — stable
    * across runs/partitionings, which is what the tests pin. */
  object DecodeStub {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(bytes.length / dim, 1)
      acc.map(_ / n)
    }

    /** Stubbed resize: real impl would decode → scale → re-encode; the fake
      * truncates/pads the payload to the "resized" byte budget. */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, targetBytes)
  }

  /** Build a media table from `documents`: text payload → binary content +
    * typed metadata columns (kind, fake width/height). Demonstrates the
    * schema: (media_id BIGINT, kind STRING, content BINARY, meta_w INT,
    * meta_h INT). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("content"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("meta_w"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("meta_h"))
      .as[MediaItem]
  }

  /** Partition-batched decode + feature extraction (mapInPandas analog):
    * per-partition iterator, one digest + feature vector per item. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("media_id")) // spread byte-weight; decode is narrow after this
      .mapPartitions { items =>
        // per-partition setup happens once (real codecs are expensive to init)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        items.map { m =>
          md.reset()
          val digest = md.digest(m.content).take(8).map("%02x".format(_)).mkString
          MediaFeatures(m.media_id, m.kind, m.content.length, digest, DecodeStub.decode(m.content))
        }
      }
  }

  /** Frame sampling for "video" rows: one output row per sampled frame via a
    * generator — `posexplode` keeps this streaming (no driver-side lists). */
  def sampleFrames(media: Dataset[MediaItem], everyNthByte: Int = 64): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(expr(s"transform(sequence(0, greatest(cast(octet_length(content) / $everyNthByte as int) - 1, 0)), " +
          s"i -> substring(content, i * $everyNthByte + 1, $everyNthByte))")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
}
