package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record flowing through the feature-extraction stage. */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Extracted features for one media payload. */
case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
    mean_byte: Double, byte_entropy: Double)

/** Multimodal columns — SURVEY.md §2b "LLM extensions". Media (image/audio/video) is
  * carried as opaque `binary` payloads plus a typed metadata struct; decode /
  * feature-extraction runs as a partition-wise typed pipeline (`mapPartitions` — the
  * Scala analogue of arrow-batched python UDFs): the executor processes one partition
  * iterator at a time, so memory stays bounded no matter the table size.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this environment):
  * [[decodeStub]] computes deterministic byte-level statistics where a real
  * implementation would call the decoder. The Spark-side plumbing — schema, typed
  * encoders, partition-wise batching, metadata propagation — is real and tested. */
object Multimodal {

  /** Attach a binary payload + typed metadata struct to the documents table (the
    * text bytes stand in for undecodable media bytes). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      struct(
        col("source").as("source"),
        col("n_chars").as("n_chars"),
        sha2(col("text").cast("binary"), 256).as("checksum")).as("meta"))

  /** STUB decode: a real build would invoke an image/audio codec here per record.
    * Deterministic byte statistics keep the pipeline testable end-to-end. */
  private def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.payload
    val n = bytes.length.toLong
    val counts = new Array[Long](256)
    var s = 0.0
    bytes.foreach { b => val u = b & 0xff; counts(u) += 1; s += u }
    val mean = if (n == 0) 0.0 else s / n
    var ent = 0.0
    counts.foreach { c =>
      if (c > 0) { val p = c.toDouble / n; ent -= p * math.log(p) / math.log(2) }
    }
    MediaFeatures(rec.doc_id, rec.media_type, n, mean, ent)
  }

  /** Partition-wise feature extraction over the binary payload column. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
  }
}
