package graft.llm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partition-wise multimodal plumbing: resize stride math, frame splitting and
  * sampling, short-payload passthrough. The codec itself is a declared stub; these
  * pin the Spark-side record shapes the stub carries. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def media(recs: (Long, Array[Byte])*) = {
    import spark.implicits._
    recs.map { case (id, p) => MediaRecord(id, "application/octet-stream", p) }
      .toDS().toDF()
  }

  test("resize strides payloads down to at most targetBytes; short ones pass through") {
    val big = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val small = Array[Byte](1, 2, 3)
    val out = Multimodal.resize(spark, media(1L -> big, 2L -> small), targetBytes = 100)
      .collect().map(r => r.doc_id -> r.payload).toMap
    assert(out(2L).toSeq == small.toSeq) // already under target: untouched
    assert(out(1L).length <= 100 && out(1L).length >= 50)
    // deterministic stride: element i of the sample is payload(i * stride)
    val stride = (1000 + 99) / 100
    assert(out(1L).zipWithIndex.forall { case (b, i) => b == big(i * stride) })
  }

  test("frameSample splits into fixed frames, keeps every k-th, tail frame is short") {
    val payload = Array.tabulate[Byte](300)(_.toByte) // frames: 64,64,64,64,44
    val got = Multimodal.frameSample(spark, media(7L -> payload),
        frameBytes = 64, everyK = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(got.map(_.n_bytes).toSeq == Seq(64, 64, 44))
    // checksum matches an independently computed digest of the same slice
    val md = java.security.MessageDigest.getInstance("MD5")
    val frame2 = java.util.Arrays.copyOfRange(payload, 128, 192)
    val want = md.digest(frame2).map("%02x".format(_)).mkString
    assert(got.find(_.frame_idx == 2).get.checksum == want)
  }

  test("empty payload yields no frames") {
    assert(Multimodal.frameSample(spark, media(9L -> Array.emptyByteArray),
      frameBytes = 64, everyK = 1).count() == 0)
  }
}
