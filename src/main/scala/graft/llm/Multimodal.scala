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

  /** STUB resize: a real build would decode, resample pixels, and re-encode; here
    * the payload is deterministically strided down to at most `targetBytes` bytes.
    * Same partition-wise shape: one record in, one (smaller) record out, bounded
    * memory regardless of table size. */
  def resize(spark: SparkSession, media: DataFrame,
      targetBytes: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map { rec =>
        val n = rec.payload.length
        if (n <= targetBytes) rec
        else {
          // ceil-stride keeps the sample within targetBytes and spread evenly
          val stride = (n + targetBytes - 1) / targetBytes
          val out = Array.ofDim[Byte]((n + stride - 1) / stride)
          var i = 0
          while (i < out.length) { out(i) = rec.payload(i * stride); i += 1 }
          rec.copy(payload = out)
        }
      })
  }

  /** STUB frame-sample: treats the payload as consecutive `frameBytes`-sized frames
    * and keeps every `everyK`-th (the keyframe-sampling analogue for video). One
    * input record fans out to its kept frames via a LAZY iterator inside
    * mapPartitions — a 10 GB video row never materializes all frames at once. */
  def frameSample(spark: SparkSession, media: DataFrame, frameBytes: Int,
      everyK: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && everyK > 0,
      s"frameBytes/everyK must be positive, got $frameBytes/$everyK")
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { rec =>
        val nFrames = (rec.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator
          .filter(_ % everyK == 0)
          .map { f =>
            val from = f * frameBytes
            val until = math.min(from + frameBytes, rec.payload.length)
            val frame = java.util.Arrays.copyOfRange(rec.payload, from, until)
            val md = java.security.MessageDigest.getInstance("MD5")
            MediaFrame(rec.doc_id, f, until - from,
              md.digest(frame).map("%02x".format(_)).mkString)
          }
      })
  }
}

/** One sampled frame: which frame, how many bytes, and a content digest. */
case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: String)
